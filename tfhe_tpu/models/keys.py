"""Client/server keys and key generation.

The reference keeps keys as in-memory structs and regenerates them ad hoc
(src/bootstrapping.rs:18-56, src/utils.rs:238-243).  Here keys are JAX pytrees
with TPU-ready layouts baked at generation time:

  * ``ServerKey.bk_u32``  — canonical GGSW tensor u32[n, R, k+1, N]
    (serializable, golden-comparable);
  * ``ServerKey.bk_conv`` — conv-ready int8 limb kernel [n, (k+1)*4, R, N]
    (the NTT-domain-resident-key analog: contraction-ready, built once);
  * ``ServerKey.ksk_mat`` — KSK as int8 limbs [kN*l_ks, (n+1)*4] for the
    key-switch matmul.

Key generation is split into a deterministic core (explicit mask/noise
arrays, bit-exactly comparable to the golden model) and a sampling wrapper.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tfhe_tpu.models import ggsw as mggsw
from tfhe_tpu.models import glwe as mglwe
from tfhe_tpu.models import keyswitch as mks
from tfhe_tpu.ops import sampling
from tfhe_tpu.ops.poly import bk_to_conv_kernel, level_major_row_perm
from tfhe_tpu.params import TfheParams


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ClientKey:
    """Secret keys (src/lwe.rs:50-60, src/glwe.rs:172-182)."""

    lwe_sk: jax.Array  # u32[n] binary
    glwe_sk: jax.Array  # u32[k, N] binary
    params: TfheParams = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ServerKey:
    """Bootstrapping key + key-switching key (src/bootstrapping.rs:18-21)."""

    bk_u32: jax.Array  # u32[n, R, k+1, N] (canonical GGSW row order)
    bk_conv: jax.Array  # int8[n, (k+1)*4, R, N] (conv backend layout)
    bk_lm: jax.Array  # u32[n, R, k+1, N], rows level-major (pallas backend)
    ksk_u32: jax.Array  # u32[kN*l_ks, n+1]
    ksk_mat: jax.Array  # int8[kN*l_ks, (n+1)*4]
    params: TfheParams = dataclasses.field(metadata=dict(static=True))
    #: optional BMMP key (notes/BMMP Bootstrapping.md:15-25): per secret-bit
    #: pair i, the level-major rows of GGSW(s s'), GGSW(s(1-s')),
    #: GGSW((1-s)s') concatenated -> u32[n/2, 3R, k+1, N].  None unless
    #: keygen(..., bmmp=True).
    bk_bmmp_lm: jax.Array | None = None
    #: optional NTT-domain-resident BK for the block-NTT backend
    #: (ops/ntt.py): int8[n, P, 2, N1, R*N2, C*L*N2].  Derived from
    #: ``bk_u32`` by ``with_ntt_key``; not serialized (rebuilt on demand).
    bk_ntt: jax.Array | None = None
    #: optional lhs-form NTT key for the fused NTT kernel (impl='nttf'):
    #: int8[n, P, bins, 2*CLN2, RN2].  Without it the nttf path re-derives
    #: the transpose INSIDE every jitted gate call — a full-key HBM copy
    #: that doubles resident key memory (fatal at N >= 2048 where the key
    #: is ~8.5 GiB) and costs ~1.5% per call at default_128.
    bk_ntt_lhs: jax.Array | None = None
    #: optional latency-kernel key operands (ops/pallas/latency_kernel.py),
    #: derived by ``with_latency_key``; not serialized (rebuilt on demand).
    #: Caching here keeps the ~80 MB relayout off the per-gate latency path
    #: (ADVICE r4).
    bk_lat: jax.Array | None = None
    bk_bmmp_lat: jax.Array | None = None


def make_server_key(
    params: TfheParams, lwe_sk, glwe_sk, bk_a, bk_e, ksk_a, ksk_e,
    bmmp_a=None, bmmp_e=None,
) -> ServerKey:
    """Deterministic keygen core (src/bootstrapping.rs:23-56).

    bk_a: u32[n, R, k, N]; bk_e: u32[n, R, N];
    ksk_a: u32[kN*l_ks, n]; ksk_e: u32[kN*l_ks].
    """
    sk_t = mglwe.sk_toeplitz(glwe_sk)
    bk_u32 = mggsw.encrypt(sk_t, lwe_sk, params, bk_a, bk_e)  # [n, R, k+1, N]
    bk_conv = bk_to_conv_kernel(bk_u32)
    perm = level_major_row_perm(params.glwe_dimension + 1, params.pbs_decomposer.levels)
    bk_lm = bk_u32[:, perm]
    glwe_flat = jnp.asarray(glwe_sk, jnp.uint32).reshape(-1)  # (src/lwe.rs:62-73)
    ksk_u32 = mks.generate_ksk(glwe_flat, lwe_sk, params.ks_decomposer, ksk_a, ksk_e)
    ksk_mat = mks.ksk_to_matmul(ksk_u32)
    bk_bmmp_lm = None
    if bmmp_a is not None:
        # secret-bit pair products (notes/BMMP Bootstrapping.md:15-25)
        s0 = jnp.asarray(lwe_sk, jnp.uint32)[0::2]
        s1 = jnp.asarray(lwe_sk, jnp.uint32)[1::2]
        trip = jnp.stack([s0 * s1, s0 * (1 - s1), (1 - s0) * s1], axis=1)
        trip = trip.reshape(-1)  # [3n/2] bit messages
        bmmp_u32 = mggsw.encrypt(sk_t, trip, params, bmmp_a, bmmp_e)
        bmmp_lm = bmmp_u32[:, perm]  # level-major rows per GGSW
        half = trip.shape[0] // 3
        r, k1, deg = bmmp_lm.shape[1], bmmp_lm.shape[2], bmmp_lm.shape[3]
        bk_bmmp_lm = bmmp_lm.reshape(half, 3 * r, k1, deg)
    return ServerKey(
        bk_u32=bk_u32, bk_conv=bk_conv, bk_lm=bk_lm, ksk_u32=ksk_u32,
        ksk_mat=ksk_mat, params=params, bk_bmmp_lm=bk_bmmp_lm,
    )


def with_ntt_key(sk: ServerKey) -> ServerKey:
    """Attach the NTT-domain key operand for ``blind_rotate(impl='ntt')``.

    Built from ``bk_u32`` in per-step chunks (the full intermediate tensor
    at default_128 would transiently need ~4 GB; chunking keeps peak HBM at
    ~1/12th of that while the output itself is ~1.9 GB int8).
    """
    from tfhe_tpu.ops.ntt import make_ep_ntt_key, plan_for_params

    plan = plan_for_params(sk.params)
    p = sk.params
    rows = (p.glwe_dimension + 1) * p.pbs_decomposer.levels
    per_step = (4 * plan.n1 * (rows * plan.n2)
                * ((p.glwe_dimension + 1) * plan.key_limbs * plan.n2))
    total = per_step * p.lwe_dimension
    if total > 12 << 30:
        raise ValueError(
            f"resident NTT key would be {total/2**30:.1f} GiB (> 12 GiB HBM "
            "budget on a 16 GB chip); use the streaming backend impl='ntts' "
            "or a larger-N1 plan (ops.ntt.set_plan_n1) instead")
    bk_ntt = jax.lax.map(
        lambda bk_i: make_ep_ntt_key(bk_i, plan), sk.bk_u32, batch_size=64
    )
    return dataclasses.replace(sk, bk_ntt=bk_ntt)


def with_ntt_lhs_key(sk: ServerKey, drop_rhs: bool = False) -> ServerKey:
    """Attach the fused-NTT-kernel lhs key form, built once at key load.

    When ``bk_ntt`` is absent (or being dropped) the lhs form is built
    DIRECTLY from the canonical key per step, never materializing the
    rhs-form tensor — at N >= 2048 one form is ~8.5 GiB and two cannot
    coexist in HBM.  ``drop_rhs=True`` serves only ``impl='nttf'`` (the
    scan 'ntt' backend and the bin-sharded parallel mode need the rhs
    form)."""
    from tfhe_tpu.ops.ntt import (
        make_ep_ntt_key, ntt_key_lhs_form, plan_for_params,
    )

    plan = plan_for_params(sk.params)
    p = sk.params
    rows = (p.glwe_dimension + 1) * p.pbs_decomposer.levels
    per_step = (4 * plan.n1 * (rows * plan.n2)
                * ((p.glwe_dimension + 1) * plan.key_limbs * plan.n2))
    form_bytes = per_step * p.lwe_dimension
    forms = 1 if (drop_rhs or sk.bk_ntt is None) else 2
    if forms * form_bytes > 12 << 30:
        raise ValueError(
            f"{forms} resident NTT key form(s) would be "
            f"{forms*form_bytes/2**30:.1f} GiB (> 12 GiB HBM budget); use "
            "drop_rhs=True, impl='ntts', or a larger-N1 plan")
    if sk.bk_ntt is not None:
        # a pure relayout of the existing rhs form (the caller's reference
        # keeps it alive either way, so this is also the lower peak)
        lhs = jax.lax.map(ntt_key_lhs_form, sk.bk_ntt, batch_size=64)
    else:
        lhs = jax.lax.map(
            lambda bk_i: ntt_key_lhs_form(make_ep_ntt_key(bk_i, plan)),
            sk.bk_u32, batch_size=64,
        )
    return dataclasses.replace(
        sk, bk_ntt_lhs=lhs, bk_ntt=None if drop_rhs else sk.bk_ntt
    )


def with_latency_key(sk: ServerKey) -> ServerKey:
    """Attach the latency-kernel key operands for ``impl='fusedl'`` (and
    ``impl='bmmpl'`` when the BMMP triples exist): the canonical BK bytes
    relaid to the kernel's (col, limb) x (group, t, lane) order, built once
    at key load instead of on every ``blind_rotate`` call (ADVICE r4)."""
    from tfhe_tpu.ops.pallas.latency_kernel import (
        bk_latency_operand, bk_latency_operand_bmmp,
    )

    bk_bmmp_lat = (
        None if sk.bk_bmmp_lm is None
        else bk_latency_operand_bmmp(sk.bk_bmmp_lm, sk.params)
    )
    return dataclasses.replace(
        sk, bk_lat=bk_latency_operand(sk.bk_u32), bk_bmmp_lat=bk_bmmp_lat
    )


def keygen(params: TfheParams, key, bmmp: bool = False) -> tuple[ClientKey, ServerKey]:
    """Sample secret keys and derive the server key (src/utils.rs:238-243 +
    src/bootstrapping.rs:23-56).  ``bmmp=True`` additionally generates the
    1.5x-size BMMP key triples enabling the halved-depth rotation."""
    if isinstance(key, int):
        key = jax.random.key(key)
    k, n, N = params.glwe_dimension, params.lwe_dimension, params.degree
    dp, ks = params.pbs_decomposer, params.ks_decomposer
    rows = (k + 1) * dp.levels
    k_lwe, k_glwe, k_bka, k_bke, k_kska, k_kske, k_ba, k_be = jax.random.split(key, 8)
    lwe_sk = sampling.binary(k_lwe, (n,))
    glwe_sk = sampling.binary(k_glwe, (k, N))
    bk_a = sampling.uniform_u32(k_bka, (n, rows, k, N))
    bk_e = sampling.gaussian_torus(k_bke, params.glwe_std_dev, (n, rows, N))
    kn = k * N
    ksk_a = sampling.uniform_u32(k_kska, (kn * ks.levels, n))
    ksk_e = sampling.gaussian_torus(k_kske, params.lwe_std_dev, (kn * ks.levels,))
    bmmp_a = bmmp_e = None
    if bmmp:
        assert n % 2 == 0, "BMMP pairs secret bits; n must be even"
        bmmp_a = sampling.uniform_u32(k_ba, (3 * n // 2, rows, k, N))
        bmmp_e = sampling.gaussian_torus(
            k_be, params.glwe_std_dev, (3 * n // 2, rows, N)
        )
    ck = ClientKey(lwe_sk=lwe_sk, glwe_sk=glwe_sk, params=params)
    sk = make_server_key(
        params, lwe_sk, glwe_sk, bk_a, bk_e, ksk_a, ksk_e, bmmp_a, bmmp_e
    )
    return ck, sk
