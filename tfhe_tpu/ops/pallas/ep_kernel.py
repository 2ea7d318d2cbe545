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

    d = d_ref[:, 0, :]  # [B, N] int8 digits of row r

    for c in range(c_dim):
        g = bk_ref[0, c, :]  # [N] u32
        g_ext = jnp.concatenate([g, -g])  # [2N]; negacyclic sign in u32
        # circ[m, j] = g_ext[(j - m) mod 2N]; one strided lane-roll
        base = jnp.broadcast_to(g_ext[None, :], (n, 2 * n))
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
    return pl.pallas_call(
        functools.partial(_ep_kernel, n=n, c_dim=c_dim),
        grid=(r_dim,),
        in_specs=[
            pl.BlockSpec((b, 1, n), lambda r: (0, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_dim, n), lambda r: (r, 0, 0), memory_space=pltpu.VMEM),
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
    )(digits_i8, bk_u32)
