"""Fully-fused Pallas blind rotation: the whole CMUX loop in one kernel.

One ``pallas_call`` with grid=(n,) runs all n blind-rotation steps
(src/bootstrapping.rs:90-105) with the accumulator RESIDENT IN VMEM for the
entire rotation; only the bootstrapping key streams from HBM (pipelined block
DMA, ~0.6MB/step).  Per grid step, entirely on-chip:

  1. per-sample negacyclic rotation acc * X^{a_i} — barrel shifter over
     log2(2N) static lane-rolls selected by exponent bits (VPU);
  2. diff = rot - acc; exact carry-chain signed decomposition into
     R=(k+1)*levels int8 digit rows (VPU);
  3. for each GGSW row r: the [N, N] sign-twisted Toeplitz operand is built
     in VMEM by a single strided ``pltpu.roll`` of the negacyclically
     extended row [g, -g] (sign applied in u32 pre-limb-split), then peeled
     into 4 balanced int8 limbs and contracted on the MXU
     (int8 x int8 -> int32);
  4. limb recombination (wrapping shifts) and acc += delta (VPU).

Layout notes (Mosaic): everything lives plane-major — acc [k+1, B, N],
digits [levels, k+1, B, N] — so that only the LAST TWO dims (B, N) are
hardware-tiled and every small static index (poly, level, column) hits an
untiled leading dim.  Slicing a size-3 tiled sublane dim is rejected by
Mosaic ("slice shape must be aligned to tiling"), and 1-D -> 3-D shape casts
are unsupported, so per-sample exponents arrive as [n, B, 1] 2-D tiles.

Exactly reproduces the reference CMUX semantics: acc += EP(digits(rot-acc))
== cmux(BK_i, acc, rot) (src/ggsw.rs:164-178).  Bit-exact vs the XLA
formulations (tested on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_tpu.params import TfheParams

NUM_LIMBS = 4


def _kernel(a_ref, acc_in_ref, bk_full_ref, acc_ref, *, params: TfheParams,
            batch: int):
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels

    step = pl.program_id(0)
    # whole step block as one array load: [R*(k+1), N] u32 (~110KB).  The BK
    # arrives row-flattened — a [1, R, k+1, N] block would put k+1=3 on a
    # tiled sublane dim, which Mosaic cannot slice (pads 3 -> 4).
    bk_step = bk_full_ref[0]

    @pl.when(step == 0)
    def _():
        acc_ref[...] = acc_in_ref[...]

    acc = acc_ref[...]  # [k+1, B, N] u32 (plane-major)

    # ---- 1. barrel negacyclic rotation by per-sample exponent a in [0, 2N)
    a = a_ref[step]  # [B, 1] int32 (2-D tile; see layout notes)
    coeff = jax.lax.broadcasted_iota(jnp.int32, (k1, batch, n), 2)
    rot = acc
    bits = (2 * n - 1).bit_length()
    for kb in range(bits):
        s = 1 << kb
        if s >= n:
            rolled = -rot
        else:
            r = pltpu.roll(rot, s, 2)
            rolled = jnp.where(coeff < s, -r, r)
        bit = jax.lax.broadcast_in_dim((a >> kb) & 1, (k1, batch, n), (1, 2))
        rot = jnp.where(bit == 1, rolled, rot)

    # ---- 2. exact signed decomposition of diff (carry chain, MSB-first)
    diff = rot - acc
    ig = dp.ignored_bits
    if ig:
        msb = (diff & jnp.uint32((1 << ig) - 1)) >> jnp.uint32(ig - 1)
        val = ((diff >> jnp.uint32(ig)) + msb) << jnp.uint32(ig)
    else:
        val = diff
    base_mask = jnp.uint32((1 << dp.log_base) - 1)
    half = jnp.uint32(1 << (dp.log_base - 1))
    carry = jnp.zeros_like(val)
    digs = []
    for l in range(dp.l_full):
        res = ((val >> jnp.uint32(dp.log_base * l)) & base_mask) + carry
        cm = res & half
        res = res - (cm << jnp.uint32(1))
        carry = cm >> jnp.uint32(dp.log_base - 1)
        digs.append(res)
    digs.reverse()
    digs = digs[:levels]  # levels x [k+1, B, N] u32 wrapping digits
    # sign-extend to int8 via (log_base+2)-bit trick
    sb = dp.log_base + 2
    m = jnp.uint32((1 << sb) - 1)
    top = jnp.uint32(1 << (sb - 1))
    digs8 = [
        ((d & m).astype(jnp.int32) - 2 * (d & top).astype(jnp.int32)).astype(jnp.int8)
        for d in digs
    ]

    # ---- 3+4. per-row Toeplitz contraction on the MXU, accumulate delta
    planes = [
        [jnp.zeros((batch, n), jnp.int32) for _ in range(NUM_LIMBS)]
        for _ in range(k1)
    ]
    for poly in range(k1):
        for j in range(levels):
            d = digs8[j][poly]  # [B, N] int8
            for col in range(k1):
                row = (poly * levels + j) * k1 + col  # canonical GGSW order
                g = bk_step[row : row + 1, :]  # [1, N] (array slice, static)
                g_ext = jnp.concatenate([g, -g], axis=1)  # sign in u32
                base = jnp.broadcast_to(g_ext, (n, 2 * n))
                circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
                w = circ[:, :n] + jnp.uint32(0x80808080)
                for l in range(NUM_LIMBS):
                    limb = ((w >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                        jnp.int32
                    ) - 128
                    planes[col][l] += jnp.dot(
                        d, limb.astype(jnp.int8), preferred_element_type=jnp.int32
                    )
    for col in range(k1):
        delta = jnp.zeros((batch, n), jnp.uint32)
        for l in range(NUM_LIMBS):
            delta = delta + (planes[col][l].astype(jnp.uint32) << jnp.uint32(8 * l))
        acc_ref[col] = acc[col] + delta


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def blind_rotate_fused(params: TfheParams, acc0, bk_u32, a_hat, interpret=False):
    """acc0 u32[B, k+1, N], bk u32[n, R, k+1, N], a_hat int32[n, B] -> final acc.

    The VMEM-resident working set is acc + digits + one double-buffered BK
    block: ~(k+1)*B*N*(4 + levels) bytes, so B<=256 at default_128 (N=512,
    k=2, l=6).  Larger batches should tile at the caller.
    """
    batch, k1, n = acc0.shape
    steps, r_dim = bk_u32.shape[0], bk_u32.shape[1]
    acc0_planes = jnp.swapaxes(acc0, 0, 1)  # [k+1, B, N]
    a_hat2 = a_hat[..., None]  # [n, B, 1]: kernel needs a 2-D per-step tile
    bk_flat = bk_u32.reshape(steps, r_dim * k1, n)  # rows (r, col) flattened
    out = pl.pallas_call(
        functools.partial(_kernel, params=params, batch=batch),
        grid=(steps,),
        in_specs=[
            # exponents resident whole (n*B int32, <1MB); BK streamed per step
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, batch, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_dim * k1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k1, batch, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k1, batch, n), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * steps * batch * r_dim * k1 * n * n * NUM_LIMBS,
            bytes_accessed=steps * r_dim * k1 * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_hat2, acc0_planes, bk_flat)
    return jnp.swapaxes(out, 0, 1)
