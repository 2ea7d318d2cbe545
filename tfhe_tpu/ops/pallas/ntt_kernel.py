"""Fused whole-scan block-NTT blind rotation (``impl="nttf"``).

The round-3 XLA lowering of the block-NTT backend (ops/ntt.py) loses to the
Toeplitz Pallas kernel because its NTT-domain intermediates round-trip HBM
every scan step (NOTES_NTT.md).  This kernel is the "what WOULD flip it"
design from those notes, built for real: ONE ``pallas_call`` runs all n
CMUX steps (src/bootstrapping.rs:90-105) with the accumulator VMEM-resident
and the bootstrapping key streamed per step in NTT domain.

Layout strategy (the hard part — see NOTES_NTT.md for why):

  * the whole pipeline runs TRANSPOSED: acc [k+1, N(sublanes), bt(lanes)].
    The per-bin merged dot needs the contraction pair (r, j1) on sublanes;
    with batch on lanes that assembly is a FREE tile-aligned reshape
    ([R, 1, N2, bt] -> [R*N2, bt]), where the batch-on-sublanes orientation
    of the Toeplitz kernels would need lane<->sublane relayouts Mosaic
    cannot do cheaply (measured: scripts/ntt_kernel_probe.py, round 3).
  * the forward/inverse NTTs absorb the strided coefficient split
    c = i*N2 + j1 into DENSE [N, N] int8 matrices (ops/ntt.py:
    _dense_fwd_np/_dense_inv_np): N2x more MACs than the sparse plan, but
    every step is a plain matmul — the only Mosaic-legal formulation found
    (the sparse alternatives all require strided sublane gathers).
  * per NTT bin, ONE [2*CLN2, RN2] x [RN2, 2*bt] int8 dot computes all four
    limb-plane products (K-limb blocks stacked on lhs rows, D-limb blocks on
    rhs lanes); bins iterate in a ``lax.fori_loop`` with leading-dim dynamic
    indexing (proven pattern, scripts/ntt_kernel_probe.py probe A).
  * the two CRT primes run sequentially, reusing the D-hat scratch; the
    centered CRT lift, key-limb recombination and accumulator update close
    each step entirely on-chip.

Exactly reproduces ``impl="ntt"`` (reference carry-chain digits,
src/decomposer.rs:42-80; external product src/ggsw.rs:132-161): bit-exact in
interpret mode and on hardware (tests/test_ntt.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfhe_tpu.ops.ntt import (
    PRIMES,
    NttPlan,
    _dense_fwd_np,
    _dense_inv_np,
    plan_for_params,
)
from tfhe_tpu.ops.pallas.blind_rotate_kernel import _decompose_kept_int8
from tfhe_tpu.params import TfheParams


def _rotate_negacyclic_t(accp, a, coeff, n: int):
    """Transposed-orientation negacyclic rotation acc * X^a: coefficients on
    SUBLANES (axis 0), per-sample exponents a [1, bt] broadcast over them.
    Same math as blind_rotate_kernel._rotate_negacyclic."""
    rot = accp
    for kb in range(n.bit_length() - 1):
        s = 1 << kb
        r = pltpu.roll(rot, s, 0)
        rot = jnp.where(((a >> kb) & 1) == 1, r, rot)
    wrapped = ((coeff - a) & jnp.int32(2 * n - 1)) >= n
    return jnp.where(wrapped, -rot, rot)


def _mod_center(x, p: int):
    """Exact centered residue for |x| <= 2^25.2 (every call site's bound —
    asserted in comments at each use).  f32-reciprocal quotient: f32 rounding
    on x (<= 1 ulp at 2^25) and on the product put q within +-1 of
    round(x/p), so one conditional subtract + one add land r exactly in
    [-(p//2), p//2].  Integer `//` is avoided deliberately: Mosaic's div
    lowering crashed the remote compiler at this op count (probe H, r4)."""
    q = jnp.round(x.astype(jnp.float32) * jnp.float32(1.0 / p)).astype(jnp.int32)
    r = x - q * jnp.int32(p)
    r = r - jnp.int32(p) * (r > jnp.int32(p // 2)).astype(jnp.int32)
    return r + jnp.int32(p) * (r < jnp.int32(-(p // 2))).astype(jnp.int32)


def _combine3(hh, m, ll, p: int):
    x = _mod_center((_mod_center(hh, p) << 8) + _mod_center(m, p), p)
    return _mod_center((x << 8) + _mod_center(ll, p), p)


def _split2(x):
    lo = ((x + 128) & 255) - 128
    return ((x - lo) >> 8).astype(jnp.int8), lo.astype(jnp.int8)


def _kernel_nttf(a_ref, acc_in_ref, bk_ref, f_ref, g_ref, acc_ref,
                 d_ref, dh_ref, c_ref, r1_ref, *,
                 params: TfheParams, plan: NttPlan, bt: int):
    n = params.degree
    k1 = params.glwe_dimension + 1
    dp = params.pbs_decomposer
    levels = dp.levels
    r_d = k1 * levels
    n1, n2, kl = plan.n1, plan.n2, plan.key_limbs
    cl = k1 * kl  # (c, lambda) output planes
    p1, p2 = PRIMES
    inv_p1 = pow(p1, p2 - 2, p2)

    step = pl.program_id(0)
    tile = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        acc_ref[tile] = acc_in_ref[tile]

    a = a_ref[0, 0]  # [1, bt] int32
    coeff = jax.lax.broadcasted_iota(jnp.int32, (n, bt), 0)

    # ---- 1. rotation + reference carry-chain digits (VPU, transposed)
    for poly in range(k1):
        accp = acc_ref[tile, poly]  # [N, bt] u32
        rot = _rotate_negacyclic_t(accp, a, coeff, n)
        for j, d8 in enumerate(_decompose_kept_int8(rot - accp, dp)):
            d_ref[poly * levels + j] = d8  # int8 [N, bt]

    deltas = [jnp.zeros((n, bt), jnp.uint32) for _ in range(k1)]
    for pi, p in enumerate(PRIMES):
        # ---- 2. forward NTT: dense [N, N] x [N, bt] per (w-limb, digit row)
        for r in range(r_d):
            d8 = d_ref[r]
            o_hi = jax.lax.dot_general(
                f_ref[pi, 0], d8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o_lo = jax.lax.dot_general(
                f_ref[pi, 1], d8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            dh = _mod_center((o_hi << 8) + o_lo, p)  # [N, bt] centered
            dh_ref[r] = dh.reshape(n1, n2, bt)

        # ---- 3. merged per-bin contraction (fori over bins).  Access
        # patterns here are the probe-verified ones (scripts K1-K7, r4):
        # static-leading + dynamic-second reads, value concat, dynamic-first
        # stores — the mixed full-slice/dynamic 4D forms crash Mosaic.
        def bin_body(b, _):
            pieces = [
                dh_ref[r, pl.dslice(b, 1)].reshape(n2, bt)
                for r in range(r_d)
            ]
            x = jnp.concatenate(pieces, axis=0)  # [RN2, bt] i32 centered
            hi8, lo8 = _split2(x)
            rhs = jnp.concatenate(
                [hi8.astype(jnp.int8), lo8.astype(jnp.int8)], axis=1
            )  # [RN2, 2*bt]
            k2 = bk_ref[0, pi, b]  # [2*CLN2, RN2] i8
            out = jax.lax.dot_general(
                k2, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [2*CLN2, 2*bt]
            cln2 = cl * n2
            hh = out[0:cln2, 0:bt]
            hl = out[0:cln2, bt : 2 * bt]
            lh = out[cln2 : 2 * cln2, 0:bt]
            ll = out[cln2 : 2 * cln2, bt : 2 * bt]
            # |hh| <= RN2 * 2^14 = 2^21.2 and every _combine3 intermediate
            # <= 2^23.4: inside _mod_center's 2^25 domain
            chat = _combine3(hh, hl + lh, ll, p)  # [CLN2, bt] centered
            c_ref[pl.dslice(b, 1)] = chat[None]
            return 0

        lax.fori_loop(0, n1, bin_body, 0)

        # ---- 4. inverse NTT (dense) + CRT lift + limb recombine
        for c_idx in range(cl):
            # rows (bin, jout) for this (col, lambda): static sublane slice
            # (n2-aligned) + free leading-sublane merge
            x = c_ref[:, c_idx * n2 : (c_idx + 1) * n2, :].reshape(n, bt)
            hi8, lo8 = _split2(x)

            def gdot(wl, dl):
                return jax.lax.dot_general(
                    g_ref[pi, wl], dl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

            res = _combine3(gdot(0, hi8), gdot(0, lo8) + gdot(1, hi8),
                            gdot(1, lo8), p)  # [N, bt] centered residue
            if pi == 0:
                r1_ref[c_idx] = res
            else:
                r1 = r1_ref[c_idx]
                # centered CRT lift with inv_p1 split into bytes so every
                # product stays within _mod_center's 2^25 domain:
                # d*inv_p1 mod p2 == (center(d*ih, p2) << 8) + d*il mod p2
                d = res - r1  # |d| <= (p1+p2)/2 < 2^15.4
                ih, il = inv_p1 >> 8, inv_p1 & 255
                t = _mod_center(d * jnp.int32(ih), p2)  # d*ih <= 2^23.7
                t2 = _mod_center((t << 8) + d * jnp.int32(il), p2)  # <= 2^23.9
                s = r1 + jnp.int32(p1) * t2  # |S| < P/2: exact int32
                col, lam = divmod(c_idx, kl)
                deltas[col] = deltas[col] + (
                    s.astype(jnp.uint32) << jnp.uint32(plan.key_bits * lam)
                )

    for col in range(k1):
        acc_ref[tile, col] += deltas[col]


@functools.partial(
    jax.jit, static_argnames=("params", "interpret", "batch_tile")
)
def blind_rotate_nttf(params: TfheParams, acc0, bk_lhs, a_hat,
                      interpret=False, batch_tile: int | None = None):
    """acc0 u32[B, k+1, N]; bk_lhs int8[n, P, bins, 2*CLN2, RN2]
    (``ops.ntt.ntt_key_lhs_form`` of the resident NTT key); a_hat int32[n, B]
    -> final accumulator u32[B, k+1, N].  Bit-exact vs ``impl="ntt"``."""
    batch, k1, n = acc0.shape
    steps = bk_lhs.shape[0]
    plan = plan_for_params(params)
    assert n == plan.n
    # tile alignment of the [*, n2, bt] scratch views (i32 tiles = 8 sublanes)
    assert plan.n2 % 8 == 0, plan.n2
    # bt=768 fits the per-prime scratch budget at B <= 1536 per call
    # (dh 28.3 + c 14.2 + r1 14.2 + digits 7.1 + acc 2x9.4 + key/FG ~10 MB)
    bt = batch_tile or next(
        t for t in range(min(batch, 768), 0, -1) if batch % t == 0
    )
    assert batch % bt == 0, (batch, bt)
    n_tiles = batch // bt
    r_d = k1 * params.pbs_decomposer.levels
    cl = k1 * plan.key_limbs

    # transposed tiles [T, k+1, N, bt]
    acc0_t = acc0.reshape(n_tiles, bt, k1, n).transpose(0, 2, 3, 1)
    a_t = a_hat.reshape(steps, n_tiles, 1, bt)

    fwd = _dense_fwd_np(plan.n1, plan.n2)
    inv = _dense_inv_np(plan.n1, plan.n2)
    # fwd matrices transposed: lhs rows are the (bin, j1) outputs
    f_mat = jnp.asarray(
        [[fwd[pi][0].T, fwd[pi][1].T] for pi in range(2)], jnp.int8
    )
    g_mat = jnp.asarray([[inv[pi][0], inv[pi][1]] for pi in range(2)], jnp.int8)

    kern = functools.partial(_kernel_nttf, params=params, plan=plan, bt=bt)
    out = pl.pallas_call(
        kern,
        grid=(steps, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 1, bt), lambda s, t: (s, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles, k1, n, bt), lambda s, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1,) + bk_lhs.shape[1:], lambda s, t: (s, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(f_mat.shape, lambda s, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(g_mat.shape, lambda s, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_tiles, k1, n, bt), lambda s, t: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, k1, n, bt), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((r_d, n, bt), jnp.int8),  # digits
            pltpu.VMEM((r_d, plan.n1, plan.n2, bt), jnp.int32),  # D-hat
            pltpu.VMEM((plan.n1, cl * plan.n2, bt), jnp.int32),  # C-hat
            pltpu.VMEM((cl, n, bt), jnp.int32),  # prime-1 residues
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=125 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # dense fwd + intt dominate: 2 primes x 2 limbs x (R + CL) dense
            # [N, N] x [N, bt] products per step-tile
            flops=2 * steps * batch * (r_d + cl) * 4 * n * n,
            bytes_accessed=steps * int(np.prod(bk_lhs.shape[1:])),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_t, acc0_t, bk_lhs, f_mat, g_mat)
    return out.transpose(0, 3, 1, 2).reshape(batch, k1, n)
