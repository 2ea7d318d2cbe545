"""Latency-oriented whole-scan blind rotation (``impl="fusedl"``, B <= 8).

The throughput kernels (blind_rotate_kernel.py) expand the KEY side of each
CMUX into a sign-twisted Toeplitz operand — 54 strided rolls + 4-limb peels
into a 57 MB scratch per step. That cost is B-independent, which is exactly
right at B >= 256 and exactly wrong at B = 1: round-3's 54.9 ms single-gate
latency is ~76 us/step of expansion VPU work against ~0 MXU work (the README
previously misattributed this to BK HBM streaming; streaming the 79.8 MB key
once is ~0.1 ms).

This kernel flips the expansion to the DIGIT side:

  * per sample, the R = (k+1)*levels digit polynomials (reference carry
    chain, src/decomposer.rs:42-80) are expanded into ONE negacyclic
    circulant operand D[(r,t), j] = +-d_r[(j-t) mod N] — with FOUR digit
    rows packed per u32 byte-lane, so ceil(R/4) = 5 strided rolls per
    sample (vs the throughput kernels' 54 key-side rolls per step), each
    roll carrying four rows' circulants in its byte planes (rolls permute
    whole lanes; bytewise-negated rows ride in the negacyclic extension,
    sign-extending peels recover the int8 rows exactly);
  * the key rides pre-laid as int8 limb rows K[step][(col,limb), (r,t)]
    (``bk_latency_operand``, built once at key load: same 79.8 MB as the
    canonical BK) and streams one 110 KB slice per step;
  * one [ (k+1)*4, R*N ] x [ R*N, N ] int8 MXU dot per (step, sample)
    yields all (k+1) output polynomials' limb planes at once: out rows
    (col, limb), lanes = coefficients — already in accumulator orientation,
    so the wrapping-u32 recombine and acc update are plain row ops.

Exactness: identical contraction to the wide kernel (convolution is
commutative; the balanced signed key limbs recombine with wrapping shifts,
src/ggsw.rs:132-161 semantics) — bit-exact vs every other backend (tested
interpret + hardware).  Cost model: per step ~ B*R rolls (VPU) + one
56.6M-MAC dot; wins below B ~ 8 where the throughput kernels idle on
expansion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_tpu.ops.pallas.blind_rotate_kernel import (
    NUM_LIMBS,
    _decompose_kept_int8,
    _rotate_negacyclic,
)
from tfhe_tpu.params import TfheParams

#: the latency kernel holds one [R*N, N] digit-circulant per sample; beyond
#: this batch the throughput kernels win anyway (see module docstring)
MAX_LATENCY_BATCH = 8


def bk_latency_operand(bk_u32) -> jnp.ndarray:
    """Canonical BK u32[n, R, k+1, N] -> int8[n, (k+1)*4, R*N] signed limb
    rows for the latency kernel's per-step lhs (rows (col, limb), columns
    (r, t))."""
    from tfhe_tpu.ops.torus import to_signed_limbs

    n_steps, r_dim, k1, n = bk_u32.shape
    limbs = to_signed_limbs(bk_u32)  # int8[n, R, k+1, N, 4]
    x = jnp.moveaxis(limbs, (2, 4), (1, 2))  # [n, k+1, 4, R, N]
    return x.reshape(n_steps, k1 * NUM_LIMBS, r_dim * n)


def _kernel_latency(a_ref, acc_in_ref, bk_ref, acc_ref, d_ref, *,
                    params: TfheParams, batch: int):
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels
    r_d = k1 * levels

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = acc_in_ref[...]

    a = a_ref[0]  # [batch, 1] int32
    coeff = jax.lax.broadcasted_iota(jnp.int32, (batch, n), 1)

    # digits for ALL samples first (normal orientation, batch on sublanes),
    # then PACKED four rows per u32 byte-lane: a single strided roll builds
    # four rows' circulants at once (rolls are lane permutations, so the
    # four byte planes ride independently), quartering the roll count —
    # the dominant per-sample cost (5 rolls/sample vs 18)
    flat = []  # R int32 digit planes [batch, N] in canonical row order
    for poly in range(k1):
        accp = acc_ref[poly]  # [batch, N] u32
        rot = _rotate_negacyclic(accp, a, coeff, n)
        flat.extend(_decompose_kept_int8(rot - accp, dp, out_dtype=jnp.int32))
    n_groups = -(-r_d // 4)
    packed = []  # per group: (pos_u32, neg_u32) [batch, N]
    for gidx in range(n_groups):
        rows = flat[4 * gidx : 4 * gidx + 4]
        pos = jnp.zeros((batch, n), jnp.uint32)
        neg = jnp.zeros((batch, n), jnp.uint32)
        for l, d in enumerate(rows):
            pos = pos | ((d.astype(jnp.uint32) & jnp.uint32(0xFF))
                         << jnp.uint32(8 * l))
            neg = neg | (((-d).astype(jnp.uint32) & jnp.uint32(0xFF))
                         << jnp.uint32(8 * l))
        packed.append((pos, neg, len(rows)))

    # build every sample's digit circulant D_b[(r,t), j] = +-d_r[(j-t)%N]
    # side by side in the scratch's lane blocks (one u32 roll per 4-row
    # group per sample, sign-extending byte peels), then contract ALL
    # samples in ONE dot — the key operand loads once instead of B times
    for b in range(batch):
        for gidx, (pos, neg, nrows) in enumerate(packed):
            g_ext = jnp.concatenate(
                [pos[b : b + 1, :], neg[b : b + 1, :]], axis=1
            )  # [1, 2N] u32: second half holds the bytewise-negated rows
            base = jnp.broadcast_to(g_ext, (n, 2 * n))
            circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)[:, :n]
            for l in range(nrows):
                t = (circ >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)
                t = t.astype(jnp.int32)
                limb = t - ((t & 128) << 1)  # sign-extend the byte
                r = 4 * gidx + l
                d_ref[r * n : (r + 1) * n, b * n : (b + 1) * n] = limb.astype(
                    jnp.int8
                )
    klhs = bk_ref[0]  # [(k+1)*4, R*N] int8
    out = jax.lax.dot_general(
        klhs, d_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [(k+1)*4, batch*N]
    for b in range(batch):
        for col in range(k1):
            delta = jnp.zeros((1, n), jnp.uint32)
            for l in range(NUM_LIMBS):
                row = out[col * NUM_LIMBS + l : col * NUM_LIMBS + l + 1,
                          b * n : (b + 1) * n]
                delta = delta + (row.astype(jnp.uint32) << jnp.uint32(8 * l))
            acc_ref[col, b : b + 1, :] += delta


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def blind_rotate_latency(params: TfheParams, acc0, bk_lat, a_hat,
                         interpret=False):
    """acc0 u32[B, k+1, N] (B <= 8); bk_lat from ``bk_latency_operand``;
    a_hat int32[n, B] -> final accumulator. Bit-exact vs the scan backends."""
    batch, k1, n = acc0.shape
    assert batch <= MAX_LATENCY_BATCH, (
        f"impl='fusedl' is the small-batch latency path (B <= "
        f"{MAX_LATENCY_BATCH}); use the throughput kernels beyond it")
    steps = bk_lat.shape[0]
    r_d = k1 * params.pbs_decomposer.levels

    acc0_t = jnp.swapaxes(acc0, 0, 1)  # [k+1, B, N]
    a_t = a_hat.reshape(steps, batch, 1)
    out = pl.pallas_call(
        functools.partial(_kernel_latency, params=params, batch=batch),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, batch, 1), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, batch, n), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k1 * NUM_LIMBS, r_d * n), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k1, batch, n), lambda s: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k1, batch, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((r_d * n, batch * n), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * batch * k1 * NUM_LIMBS * r_d * n * n,
            bytes_accessed=steps * k1 * NUM_LIMBS * r_d * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_t, acc0_t, bk_lat)
    return jnp.swapaxes(out, 0, 1)
