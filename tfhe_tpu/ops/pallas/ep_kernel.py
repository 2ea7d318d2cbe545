"""Pallas TPU kernel for the external-product contraction — the hot op.

Computes, exactly (int8 x int8 -> int32 on the MXU):

    out[b, c*4+l, o] = sum_{r,m} digits[b,r,m] * limb_l( +-bk[r,c,(o-m)%N] )

i.e. the negacyclic Toeplitz contraction of decomposed GLWE rows against one
GGSW (reference semantics: src/ggsw.rs:132-161 + src/utils.rs:113-160).

Design:
  * the sign-twisted Toeplitz operand W is never stored in HBM — each grid
    step builds the [N, N] circulant of one GGSW row IN VMEM with a single
    strided ``pltpu.roll`` (roll amount increasing by 1 per sublane), on the
    negacyclically extended row [g, -g] (sign applied in u32 BEFORE the
    signed-limb split, which cannot negate -128);
  * 4 balanced int8 limbs are peeled in-register and fed to the MXU as
    [B, N] @ [N, N] int8 matmuls with int32 accumulation;
  * the grid iterates over the R=(k+1)*levels rows sequentially, accumulating
    into a VMEM-resident int32 output block.

The XLA fallbacks (ops/poly.py conv/matmul formulations) remain for CPU and
cross-checks; this kernel is bit-identical to them (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LIMBS = 4


def _ep_kernel(d_ref, bk_ref, out_ref, *, n: int, c_dim: int):
    r = pl.program_id(0)

    @pl.when(r == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    d = d_ref[r]  # [B, N] int8 digits of row r (row-major layout: leading
    # dim is dynamically indexable; sublane/lane dims are not)
    bkr = bk_ref[r]  # [C, N] u32

    for c in range(c_dim):
        g = bkr[c : c + 1, :]  # [1, N] u32 (keep 2-D for Mosaic)
        g_ext = jnp.concatenate([g, -g], axis=1)  # [1, 2N]; sign in u32
        # circ[m, j] = g_ext[(j - m) mod 2N]; one strided lane-roll
        base = jnp.broadcast_to(g_ext, (n, 2 * n))
        circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
        w_u32 = circ[:, :n]  # [N(m), N(o)]: +-bk[r,c,(o-m)%N]
        t = w_u32 + jnp.uint32(0x80808080)
        for l in range(NUM_LIMBS):
            limb = ((t >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                jnp.int32
            ) - 128
            w8 = limb.astype(jnp.int8)
            acc = jnp.dot(d, w8, preferred_element_type=jnp.int32)  # [B, N]
            out_ref[:, c * NUM_LIMBS + l, :] += acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def ep_contract_pallas(digits_i8, bk_u32, interpret: bool = False):
    """digits int8[B, R, N] x GGSW u32[R, C, N] -> int32[B, C*4, N]."""
    b, r_dim, n = digits_i8.shape
    _, c_dim, _ = bk_u32.shape
    f = c_dim * NUM_LIMBS
    digits_rbn = jnp.moveaxis(digits_i8, 1, 0)  # [R, B, N]
    return pl.pallas_call(
        functools.partial(_ep_kernel, n=n, c_dim=c_dim),
        grid=(r_dim,),
        in_specs=[
            # full arrays in VMEM (digits 2.3MB, bk 0.6MB); rows picked by
            # program_id — a size-1 blocked dim may not occupy the last two
            # block positions on TPU
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, f, n), lambda r: (0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r_dim * n * n * f,
            bytes_accessed=b * r_dim * n + r_dim * c_dim * n * 4 + b * f * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(digits_rbn, bk_u32)


def _ep_kernel_rbn(d_ref, bk_ref, out_ref, *, n: int, c_dim: int):
    """Variant with digits [R, B, N] and output planes [C, L, B, N] — the
    transpose-free layout used by the blind-rotation scan (digits arrive
    level-major straight from the plane-stacked decomposer; output planes
    recombine elementwise into the [C, B, N] accumulator).  Grid is
    (batch_tiles, R): batch tiles bound VMEM (out planes alone are 24KB/sample
    in int32), rows accumulate sequentially into the revisited output block."""
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    d = d_ref[r]  # [B, N] int8
    bkr = bk_ref[r]  # [C, N] u32

    for c in range(c_dim):
        g = bkr[c : c + 1, :]  # [1, N]
        g_ext = jnp.concatenate([g, -g], axis=1)  # sign in u32
        base = jnp.broadcast_to(g_ext, (n, 2 * n))
        circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
        t = circ[:, :n] + jnp.uint32(0x80808080)
        for l in range(NUM_LIMBS):
            limb = ((t >> jnp.uint32(8 * l)) & jnp.uint32(0xFF)).astype(
                jnp.int32
            ) - 128
            out_ref[c, l] += jnp.dot(
                d, limb.astype(jnp.int8), preferred_element_type=jnp.int32
            )


@functools.partial(jax.jit, static_argnames=("interpret", "batch_tile"))
def ep_contract_pallas_rbn(digits_rbn_i8, bk_rows_u32, interpret: bool = False,
                           batch_tile: int | None = None):
    """digits int8[R, B, N] x GGSW rows u32[R, C, N] -> int32[C, 4, B, N].

    Row order of ``digits`` and ``bk_rows`` must match (the blind rotation
    uses level-major rows r' = level*(k+1)+poly with a correspondingly
    permuted key; the contraction is row-order invariant).
    """
    r_dim, b, n = digits_rbn_i8.shape
    _, c_dim, _ = bk_rows_u32.shape
    # Batch tiling bounds VMEM (the int32 output planes are 24KB/sample).
    # Empirically (v5e): untiled compiles and is fastest inside the rotation
    # scan up to B=1024; beyond that tile at 128 (256 overflows the 16MB
    # scoped VMEM budget by ~0.6MB when standalone).
    bt = batch_tile or (b if b <= 1024 else 128)
    assert b % bt == 0, (b, bt)
    return pl.pallas_call(
        functools.partial(_ep_kernel_rbn, n=n, c_dim=c_dim),
        grid=(b // bt, r_dim),
        in_specs=[
            pl.BlockSpec((r_dim, bt, n), lambda bb, r: (0, bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (c_dim, NUM_LIMBS, bt, n), lambda bb, r: (0, 0, bb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((c_dim, NUM_LIMBS, b, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the in-VMEM circulant build is [N, 2N] u32 (32MB at N=2048);
            # raise the scoped budget so large-degree params compile
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r_dim * n * n * c_dim * NUM_LIMBS,
            bytes_accessed=b * r_dim * n + r_dim * c_dim * n * 4
            + c_dim * NUM_LIMBS * b * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(digits_rbn_i8, bk_rows_u32)
