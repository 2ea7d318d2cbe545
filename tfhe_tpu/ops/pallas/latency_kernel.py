"""Latency-oriented whole-scan blind rotation (``impl="fusedl"``/``"bmmpl"``).

The throughput kernels (blind_rotate_kernel.py) expand the KEY side of each
CMUX into a sign-twisted Toeplitz operand — 54 strided rolls + 4-limb peels
into a 57 MB scratch per step.  That cost is B-independent, which is exactly
right at B >= 256 and exactly wrong at B = 1: round-3's 54.9 ms single-gate
latency was ~76 us/step of expansion VPU work against ~0 MXU work.

This kernel flips the expansion to the DIGIT side, and (round 5) eliminates
the byte-peel stage entirely with a 32->8-bit ``pltpu.bitcast``:

  * per sample, the R = (k+1)*levels digit polynomials (reference carry
    chain, src/decomposer.rs:42-80) are packed FOUR digit rows per u32
    byte-lane (digits at default_128 lie in [-8, 16], so their low byte IS
    their int8 two's-complement value);
  * all ceil(R/4) packed groups are stacked (negacyclic extension
    [pos | neg], halves pre-swapped for odd group parity so the group-block
    offset g*N folds out of the per-row roll shift mod 2N) and ONE strided
    ``pltpu.roll`` builds every group's circulant at once;
  * ONE ``pltpu.bitcast`` u32 -> int8 (probed on hardware: [M, L] ->
    [4M, L], out[4m+b] = byte b of row m, scripts/probe_r5_bitcast.py)
    reinterprets the packed circulant as the int8 digit operand with rows
    ordered (group, t, lane) — replacing the round-4 per-row peels
    (5 VPU ops/element over [N, N] per digit row, the dominant per-step
    cost) with a layout cast;
  * the key rides pre-laid as int8 limb rows K[step][(col,limb), (g,t,l)]
    (``bk_latency_operand``: same bytes as the canonical BK, columns
    statically permuted to the bitcast row order, zero-padded to 4*ceil(R/4)
    rows) and streams one slice per step;
  * one [ (k+1)*4, 4*G*N ] x [ 4*G*N, B*N ] int8 MXU dot per step yields
    all (k+1) output polynomials' limb planes at once; wrapping-u32
    recombine and acc update are plain row ops;
  * the grid can pack ``steps_per_cell`` CMUX steps per grid cell (a=0 /
    zero-key padding when the step count does not divide).  MEASURED (v5e,
    default_128, B=1, scripts/probe_r5_latency.py): spc=1/2/4/8 ->
    4.74/4.88/5.43/5.54 ms — per-cell overhead is already negligible and
    bigger cells only bloat the per-cell key DMA, so 1 is the default.

``variants=3`` is the BMMP halved-depth mode (``impl="bmmpl"``, notes/BMMP
Bootstrapping.md:15-25): n/2 steps, three (X^e - 1)acc diffs per step
(e = a+a', a, a'), digit rows and key rows concatenated variant-major
(matching the ``keygen(bmmp=True)`` key triples GGSW(ss'), GGSW(s(1-s')),
GGSW((1-s)s')).

Exactness: identical contraction to the scan backends (convolution is
commutative; the balanced signed key limbs recombine with wrapping shifts,
src/ggsw.rs:132-161 semantics) — bit-exact vs every other backend (tested
interpret + hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_tpu.ops.pallas.blind_rotate_kernel import (
    NUM_LIMBS,
    _decompose_kept_int8,
    _rotate_negacyclic,
)
from tfhe_tpu.params import TfheParams

#: the latency kernel holds one [4*G*N, N] digit-circulant per sample; beyond
#: this batch the throughput kernels win anyway (see module docstring)
MAX_LATENCY_BATCH = 8
#: the BMMP variant's circulant is 3x as tall (3R digit rows per step)
MAX_LATENCY_BATCH_BMMP = 4
#: groups stacked per roll call (bounds the [chunk*N, 2N] u32 temporaries)
_ROLL_CHUNK = 8


def _lat_operand_from_canonical(bk_can_u32) -> jnp.ndarray:
    """Canonical-row-order key u32[steps, R_tot, k+1, N] -> int8
    [steps, (k+1)*4, 4*G*N] signed limb rows for the latency kernel's
    per-step lhs: rows (col, limb), columns (g, t, l) matching the bitcast
    digit-circulant row order (l = digit row within the 4-per-u32 group;
    rows padded with zeros to G = ceil(R_tot/4) full groups)."""
    from tfhe_tpu.ops.torus import to_signed_limbs

    steps, r_tot, k1, n = bk_can_u32.shape
    g_tot = -(-r_tot // 4)
    limbs = to_signed_limbs(bk_can_u32)  # int8[steps, R, k+1, N, 4(limb)]
    x = jnp.moveaxis(limbs, (2, 4), (1, 2))  # [steps, k+1, limb, R, N]
    pad = g_tot * 4 - r_tot
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    x = x.reshape(steps, k1, NUM_LIMBS, g_tot, 4, n)  # [..., G, l, N(t)]
    x = jnp.swapaxes(x, -1, -2)  # [..., G, N(t), l]
    return x.reshape(steps, k1 * NUM_LIMBS, g_tot * 4 * n)


def bk_latency_operand(bk_u32) -> jnp.ndarray:
    """Canonical BK u32[n, R, k+1, N] -> latency-kernel lhs (see
    ``_lat_operand_from_canonical``)."""
    return _lat_operand_from_canonical(bk_u32)


def bk_latency_operand_bmmp(bk_bmmp_lm, params: TfheParams) -> jnp.ndarray:
    """BMMP key triples u32[n/2, 3R, k+1, N] (level-major rows per GGSW,
    ``ServerKey.bk_bmmp_lm``) -> latency-kernel lhs with 3R canonical-order
    rows per step, variant-major (ss', s(1-s'), (1-s)s')."""
    from tfhe_tpu.ops.poly import level_major_row_perm

    k1 = params.glwe_dimension + 1
    levels = params.pbs_decomposer.levels
    steps, r3, _, n = bk_bmmp_lm.shape
    r = k1 * levels
    assert r3 == 3 * r, (r3, r)
    perm = np.asarray(level_major_row_perm(k1, levels))
    inv = np.argsort(perm)  # level-major rows -> canonical rows
    x = bk_bmmp_lm.reshape(steps, 3, r, k1, n)[:, :, inv]
    return _lat_operand_from_canonical(x.reshape(steps, 3 * r, k1, n))


def _kernel_latency(a_ref, acc_in_ref, bk_ref, acc_ref, d_ref, *,
                    params: TfheParams, batch: int, variants: int, spc: int,
                    split_dots: bool = False):
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    r_tot = variants * k1 * dp.levels
    n_groups = -(-r_tot // 4)

    cell = pl.program_id(0)

    @pl.when(cell == 0)
    def _():
        acc_ref[...] = acc_in_ref[...]

    coeff = jax.lax.broadcasted_iota(jnp.int32, (batch, n), 1)
    for s in range(spc):
        # digits for ALL variants/polys (normal orientation, batch on
        # sublanes), packed four rows per u32 byte-lane
        flat = []  # R_tot int32 digit planes [batch, N], canonical order
        for v in range(variants):
            a = a_ref[s * variants + v]  # [batch, 1] int32
            for poly in range(k1):
                accp = acc_ref[poly]  # [batch, N] u32
                rot = _rotate_negacyclic(accp, a, coeff, n)
                flat.extend(
                    _decompose_kept_int8(rot - accp, dp, out_dtype=jnp.int32)
                )
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
            packed.append((pos, neg))

        # build every sample's digit circulant D_b[(g,t,l), j] =
        # +-d_{4g+l}[(j-t)%N]: groups stacked so ONE strided u32 roll per
        # chunk builds all their circulants (row u*N+t rolls by (u*N+t) mod
        # 2N = t + (u%2)*N, so odd-parity groups ride with their [pos|neg]
        # halves pre-swapped), then ONE bitcast reinterprets the packed
        # bytes as the int8 digit rows — no per-row peels
        def build_chunk(c0, c1):
            for b in range(batch):
                gs = list(range(c0, c1))
                blocks = []
                for g in gs:
                    pos, neg = packed[g]
                    halves = (
                        [neg[b : b + 1, :], pos[b : b + 1, :]]
                        if (g - c0) % 2
                        else [pos[b : b + 1, :], neg[b : b + 1, :]]
                    )
                    g_ext = jnp.concatenate(halves, axis=1)  # [1, 2N]
                    blocks.append(jnp.broadcast_to(g_ext, (n, 2 * n)))
                base = jnp.concatenate(blocks, axis=0)  # [len(gs)*N, 2N]
                circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)[:, :n]
                d_ref[c0 * 4 * n : c1 * 4 * n,
                      b * n : (b + 1) * n] = pltpu.bitcast(circ, jnp.int8)

        klhs = bk_ref[s]  # [(k+1)*4, 4*G*N] int8
        if split_dots:
            # per-group roll + dot: group g's dot depends only on group g's
            # circulant slice, so the scheduler may overlap group g+1's roll
            # (VPU) with group g's dot (MXU); int32 partials accumulate
            out = jnp.zeros((k1 * NUM_LIMBS, batch * n), jnp.int32)
            for g in range(n_groups):
                build_chunk(g, g + 1)
                out = out + jax.lax.dot_general(
                    klhs[:, g * 4 * n : (g + 1) * 4 * n],
                    d_ref[g * 4 * n : (g + 1) * 4 * n, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        else:
            for c0 in range(0, n_groups, _ROLL_CHUNK):
                build_chunk(c0, min(c0 + _ROLL_CHUNK, n_groups))
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
                    delta = delta + (row.astype(jnp.uint32)
                                     << jnp.uint32(8 * l))
                acc_ref[col, b : b + 1, :] += delta


@functools.partial(
    jax.jit,
    static_argnames=("params", "interpret", "steps_per_cell", "split_dots"),
)
def blind_rotate_latency(params: TfheParams, acc0, bk_lat, a_vhat,
                         interpret=False, steps_per_cell: int = 1,
                         split_dots: bool = False):
    """acc0 u32[B, k+1, N]; bk_lat from ``bk_latency_operand`` (V=1, B <= 8)
    or ``bk_latency_operand_bmmp`` (V=3, B <= 4); a_vhat int32[steps, V, B]
    (V=1: the mod-switched mask; V=3: rows (a+a', a, a') mod 2N per pair)
    -> final accumulator.  Bit-exact vs the scan backends."""
    batch, k1, n = acc0.shape
    steps, variants = a_vhat.shape[0], a_vhat.shape[1]
    max_b = MAX_LATENCY_BATCH if variants == 1 else MAX_LATENCY_BATCH_BMMP
    assert batch <= max_b, (
        f"latency path is the small-batch path (B <= {max_b} at V={variants});"
        " use the throughput kernels beyond it")
    r_tot = variants * k1 * params.pbs_decomposer.levels
    g_tot = -(-r_tot // 4)
    assert bk_lat.shape == (steps, k1 * NUM_LIMBS, g_tot * 4 * n), bk_lat.shape

    spc = steps_per_cell
    pad = (-steps) % spc
    if pad:  # a=0 + zero key rows: rot == acc, digits 0, delta 0 (no-op)
        a_vhat = jnp.pad(a_vhat, ((0, pad), (0, 0), (0, 0)))
        bk_lat = jnp.pad(bk_lat, ((0, pad), (0, 0), (0, 0)))
    cells = (steps + pad) // spc

    acc0_t = jnp.swapaxes(acc0, 0, 1)  # [k+1, B, N]
    a_t = a_vhat.reshape(cells * spc * variants, batch, 1)
    out = pl.pallas_call(
        functools.partial(_kernel_latency, params=params, batch=batch,
                          variants=variants, spc=spc, split_dots=split_dots),
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((spc * variants, batch, 1), lambda c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, batch, n), lambda c: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spc, k1 * NUM_LIMBS, g_tot * 4 * n),
                         lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k1, batch, n), lambda c: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k1, batch, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((g_tot * 4 * n, batch * n), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=(100 if variants == 1 else 120) * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * (steps + pad) * batch * k1 * NUM_LIMBS * g_tot * 4
            * n * n,
            bytes_accessed=(steps + pad) * k1 * NUM_LIMBS * g_tot * 4 * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_t, acc0_t, bk_lat)
    return jnp.swapaxes(out, 0, 1)
