"""Mosaic layout probes for the fused NTT-EP kernel design (not shipped API).

Answers, on the real TPU, which of the candidate layouts compile and how they
perform at the shapes the fused kernel needs:

  A. per-bin fori_loop: dhat[bin] leading-dim dynamic index, [bt,144]@[144,72]
     int8 dots, chat written to a [bin, bt, 72] scratch (leading dyn store);
  B. INTT per-cl: chat scratch [72, 64, 128] with leading-dim index,
     [64,64]@[64,128] dots accumulated;
  C. reshape probe: [1, 18432] -> [144, 128] (lane split) — expected slow/fail;
  D. unrolled python per-bin loop vs fori_loop compile time.

Run: python scripts/ntt_kernel_probe.py  (on TPU)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


BT, BINS, M2, CL, N1 = 128, 64, 144, 72, 64
P1 = 12289


def probe_a_merged_fori(dhat, kmat):
    """dhat int8[bins, BT, M2]; kmat int8[bins, M2, CL] -> int32[bins, BT, CL].
    fori_loop over bins, leading-dim dynamic index + store."""

    def kernel(d_ref, k_ref, out_ref):
        def body(b, _):
            d = d_ref[b]  # [BT, M2]
            k = k_ref[b]  # [M2, CL]
            out_ref[b] = jnp.dot(d, k, preferred_element_type=jnp.int32)
            return 0

        jax.lax.fori_loop(0, BINS, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BINS, BT, CL), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(dhat, kmat)


def probe_b_intt_dyn_sublane(chat, winv):
    """chat int32[CL, BINS, BT] (leading=cl); winv int8[N1, BINS].
    out[cl, i, b] = sum_bin winv[i, bin] * chat_lo[cl][bin, b] via per-cl dots
    (chat folded mod p to int8 single-limb for the probe)."""

    def kernel(c_ref, w_ref, out_ref):
        w = w_ref[...]  # [N1, BINS] int8

        def body(cl, _):
            c = c_ref[cl]  # [BINS, BT] int32
            c8 = (c % 64).astype(jnp.int8)
            out_ref[cl] = jnp.dot(w, c8, preferred_element_type=jnp.int32)
            return 0

        jax.lax.fori_loop(0, CL, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((CL, N1, BT), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(chat, winv)


def probe_c_lane_split(x):
    """[8, 18432] int32 -> [8, 144, 128] via in-kernel reshape."""

    def kernel(x_ref, out_ref):
        out_ref[...] = x_ref[...].reshape(8, M2, BT)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, M2, BT), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


def probe_d_sublane_dyn_store(chat_t):
    """Write [CL, BT] blocks into scratch[:, bin, :] (dynamic middle index),
    then read back. chat_t int32[BINS, CL, BT]."""

    def kernel(c_ref, out_ref, scratch):
        def body(b, _):
            blk = c_ref[b]  # [CL, BT]
            scratch[:, pl.dslice(b, 1), :] = blk[:, None, :]
            return 0

        jax.lax.fori_loop(0, BINS, body, 0)
        out_ref[...] = scratch[...]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((CL, BINS, BT), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((CL, BINS, BT), jnp.int32)],
    )(chat_t)


def run(name, fn, *args, ref=None):
    try:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            times.append(time.perf_counter() - t0)
        log(f"{name}: OK compile={compile_s:.1f}s best={min(times)*1e6:.0f}us")
        if ref is not None:
            assert np.array_equal(np.asarray(out), ref), f"{name}: WRONG RESULT"
            log(f"{name}: result exact")
        return out
    except Exception as e:  # noqa: BLE001
        log(f"{name}: FAILED — {type(e).__name__}: {str(e)[:300]}")
        return None


def main():
    rng = np.random.default_rng(0)
    log(f"device: {jax.devices()[0]}")

    dhat = rng.integers(-100, 100, (BINS, BT, M2)).astype(np.int8)
    kmat = rng.integers(-100, 100, (BINS, M2, CL)).astype(np.int8)
    ref_a = np.einsum("bxm,bmc->bxc", dhat.astype(np.int64), kmat.astype(np.int64)).astype(np.int32)
    run("A merged fori per-bin", probe_a_merged_fori, dhat, kmat, ref=ref_a)

    chat = rng.integers(-(1 << 20), 1 << 20, (CL, BINS, BT)).astype(np.int32)
    winv = rng.integers(-100, 100, (N1, BINS)).astype(np.int8)
    ref_b = np.einsum(
        "ib,cbx->cix", winv.astype(np.int64), (chat % 64).astype(np.int64)
    ).astype(np.int32)
    run("B intt per-cl", probe_b_intt_dyn_sublane, chat, winv, ref=ref_b)

    x = rng.integers(-1000, 1000, (8, M2 * BT)).astype(np.int32)
    run("C lane-split reshape", probe_c_lane_split, x, ref=x.reshape(8, M2, BT))

    chat_t = rng.integers(-1000, 1000, (BINS, CL, BT)).astype(np.int32)
    ref_d = np.moveaxis(chat_t, 0, 1)
    run("D sublane dyn store", probe_d_sublane_dyn_store, chat_t, ref=ref_d)


if __name__ == "__main__":
    main()
