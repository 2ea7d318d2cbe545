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


def make_server_key(
    params: TfheParams, lwe_sk, glwe_sk, bk_a, bk_e, ksk_a, ksk_e
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
    return ServerKey(
        bk_u32=bk_u32, bk_conv=bk_conv, bk_lm=bk_lm, ksk_u32=ksk_u32,
        ksk_mat=ksk_mat, params=params,
    )


def keygen(params: TfheParams, key) -> tuple[ClientKey, ServerKey]:
    """Sample secret keys and derive the server key (src/utils.rs:238-243 +
    src/bootstrapping.rs:23-56)."""
    if isinstance(key, int):
        key = jax.random.key(key)
    k, n, N = params.glwe_dimension, params.lwe_dimension, params.degree
    dp, ks = params.pbs_decomposer, params.ks_decomposer
    rows = (k + 1) * dp.levels
    k_lwe, k_glwe, k_bka, k_bke, k_kska, k_kske = jax.random.split(key, 6)
    lwe_sk = sampling.binary(k_lwe, (n,))
    glwe_sk = sampling.binary(k_glwe, (k, N))
    bk_a = sampling.uniform_u32(k_bka, (n, rows, k, N))
    bk_e = sampling.gaussian_torus(k_bke, params.glwe_std_dev, (n, rows, N))
    kn = k * N
    ksk_a = sampling.uniform_u32(k_kska, (kn * ks.levels, n))
    ksk_e = sampling.gaussian_torus(k_kske, params.lwe_std_dev, (kn * ks.levels,))
    ck = ClientKey(lwe_sk=lwe_sk, glwe_sk=glwe_sk, params=params)
    sk = make_server_key(params, lwe_sk, glwe_sk, bk_a, bk_e, ksk_a, ksk_e)
    return ck, sk
