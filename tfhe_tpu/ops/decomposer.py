"""Vectorized signed gadget decomposition (reference: src/decomposer.rs).

The reference decomposes one scalar at a time with an explicit carry loop
(src/decomposer.rs:42-80).  Here the same *exact* carry chain runs unrolled
over ``log_q/log_base`` positions as elementwise VPU ops on whole ciphertext
tensors at once.  The default path deliberately does NOT use the closed-form
balanced-digit trick (value + 0x888...8): the reference's carry rule emits an
anomalous digit +B when digit B-1 meets an incoming carry (res = B escapes
recentering because ``res & B/2 == 0``), and the closed form diverges bit-wise
from it even though both recompose identically.  Bit-exactness to the
reference wins for the default; the chain costs ~9 cheap vector ops per level.

Digits therefore lie in {-B/2 .. B/2-1} union {B} and always fit int8 for the
MXU contractions (params assert base <= 64).

``decompose_balanced_planes`` is the opt-in closed form (impl='fusedb' in the
bootstrap): the SAME half-up rounding and the SAME exact mod-2^32
reconstruction, digits in the strictly smaller range [-B/2, B/2), no
loop-carried carry — cheaper on the VPU and a different (documented,
DIVERGENCES.md) digit convention than the reference trace.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_tpu.params import DecomposerParams


def round_value(value, p: DecomposerParams) -> jnp.ndarray:
    """Round off ignored LSBs to nearest, half up (src/decomposer.rs:27-40)."""
    value = jnp.asarray(value, jnp.uint32)
    ig = p.ignored_bits
    if ig == 0:
        return value
    ignored_msb = (value & jnp.uint32((1 << ig) - 1)) >> jnp.uint32(ig - 1)
    return ((value >> jnp.uint32(ig)) + ignored_msb) << jnp.uint32(ig)


def decompose_u32(value, p: DecomposerParams) -> jnp.ndarray:
    """Exact carry-chain decomposition; u32[...] -> u32[..., levels], MSB-first
    (src/decomposer.rs:42-80)."""
    value = round_value(value, p)
    log_base = p.log_base
    base_mask = jnp.uint32((1 << log_base) - 1)
    half_mask = jnp.uint32(1 << (log_base - 1))
    carry = jnp.zeros_like(value)
    digits = []
    for l in range(p.l_full):
        res = ((value >> jnp.uint32(log_base * l)) & base_mask) + carry
        carry_mask = res & half_mask
        res = res - (carry_mask << jnp.uint32(1))
        carry = carry_mask >> jnp.uint32(log_base - 1)
        digits.append(res)
    digits.reverse()
    return jnp.stack(digits[: p.levels], axis=-1)


def digits_to_signed(digits_u32, p: DecomposerParams) -> jnp.ndarray:
    """Wrapping-u32 digits -> int8 in [-B/2, B] via (log_base+2)-bit sign-extend."""
    bits = p.log_base + 2
    m = jnp.uint32((1 << bits) - 1)
    top = jnp.uint32(1 << (bits - 1))
    v = (digits_u32 & m).astype(jnp.int32) - 2 * (digits_u32 & top).astype(jnp.int32)
    return v.astype(jnp.int8)


def decompose_signed(value, p: DecomposerParams) -> jnp.ndarray:
    """u32[...] -> int8[..., levels] signed digits, MSB-first."""
    return digits_to_signed(decompose_u32(value, p), p)


def recompose(digits_u32, p: DecomposerParams) -> jnp.ndarray:
    """sum(d_i * B^(levels-1-i)) << ignored_bits (src/decomposer.rs:83-95)."""
    d = jnp.asarray(digits_u32, jnp.uint32)
    shifts = jnp.uint32(p.log_base) * (
        jnp.uint32(p.levels - 1) - jnp.arange(p.levels, dtype=jnp.uint32)
    )
    value = (d << shifts).sum(axis=-1, dtype=jnp.uint32)
    return value << jnp.uint32(p.ignored_bits)


def decompose_signed_planes(value, p: DecomposerParams) -> jnp.ndarray:
    """Like ``decompose_signed`` but stacks the level axis FIRST:
    u32[...] -> int8[levels, ...] (MSB-first).

    Stacking on a new leading axis is a concat (no relayout), unlike the
    trailing-axis stack which transposes levels past the lane dimension —
    that transpose costs ~100us/step inside the blind-rotation scan on TPU.
    """
    value = round_value(value, p)
    log_base = p.log_base
    base_mask = jnp.uint32((1 << log_base) - 1)
    half_mask = jnp.uint32(1 << (log_base - 1))
    carry = jnp.zeros_like(value)
    digits = []
    for l in range(p.l_full):
        res = ((value >> jnp.uint32(log_base * l)) & base_mask) + carry
        carry_mask = res & half_mask
        res = res - (carry_mask << jnp.uint32(1))
        carry = carry_mask >> jnp.uint32(log_base - 1)
        digits.append(res)
    digits.reverse()
    return jnp.stack(
        [digits_to_signed(x, p) for x in digits[: p.levels]], axis=0
    )


def balanced_offset(p: DecomposerParams) -> int:
    """The pre-shift constant C of the closed-form balanced decomposition:
    C = (H << ig) + 2^(ig-1) with H = sum_l (B/2) B^l over the kept levels.
    ``(v + C) >> ig`` performs the reference's half-up rounding AND the
    balanced re-centering offset in one wrapping add."""
    half = 1 << (p.log_base - 1)
    hh = sum(half << (p.log_base * l) for l in range(p.levels))
    ig = p.ignored_bits
    if ig == 0:
        return hh
    return ((hh << ig) + (1 << (ig - 1))) & 0xFFFFFFFF


def decompose_balanced_planes(value, p: DecomposerParams) -> jnp.ndarray:
    """Closed-form balanced decomposition: u32[...] -> int8[levels, ...],
    MSB-first, digits in [-B/2, B/2).

    Exact: sum_l d_l B^(levels-1-l) << ignored_bits == round_value(value)
    (mod 2^32) — identical reconstruction (and identical rounding) to the
    carry chain; only the digit vector differs (no +B anomaly).  This is
    the XLA twin of the fused kernel's ``_decompose_balanced_int8``
    (ops/pallas/blind_rotate_kernel.py) used for bit-exact validation.
    """
    value = jnp.asarray(value, jnp.uint32)
    b = p.log_base
    half = 1 << (b - 1)
    ig = p.ignored_bits
    c = jnp.uint32(balanced_offset(p))
    u = (value + c) >> jnp.uint32(ig) if ig else value + c
    mask = jnp.uint32((1 << b) - 1)
    planes = [
        (((u >> jnp.uint32(b * l)) & mask).astype(jnp.int32) - half).astype(
            jnp.int8
        )
        for l in range(p.levels)
    ]
    planes.reverse()
    return jnp.stack(planes, axis=0)
