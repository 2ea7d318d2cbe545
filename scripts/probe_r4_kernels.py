"""Round-4 hardware probes: Mosaic building blocks for the nttf / latency
kernels plus MXU dtype experiments.

Each probe is a tiny standalone pallas_call timed with the amortized method
(async dispatch chain, one sync) so the ~30ms tunnel RTT doesn't pollute the
numbers.  Results -> ARTIFACTS/probe_r4_kernels.json.

Probes:
  A  baseline wide int8 dot  [768,3072]x[3072,6144]   (the fused kernel shape)
  B  int4 lhs x int8 rhs     same shape               (digits ARE int4-range)
  C  int4 x int4             same shape
  D  sublane barrel (rolls on axis 0, per-lane selects) vs lane barrel
  E  digit-side Toeplitz expansion (18 strided i32 rolls + i8 peel)
  F  dense fwd-NTT dot       [512,512]x[512,768] int8 x 72/step
  G  per-bin merged dots     64 bins x 2 primes of [144,144]x[144,1536]
  H  VPU NTT-domain handling: 36 planes of combine+Barrett-mod+limb-split
  I  in-kernel 2D transpose  [768,512] i32
  J  free-reshape check      [512,768] i32 -> [64,8,768] leading access
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


RESULTS = {}


def probe(name):
    def deco(f):
        def run():
            try:
                t0 = time.perf_counter()
                res = f()
                res["compile_s"] = round(time.perf_counter() - t0, 1)
                RESULTS[name] = res
                log(f"[{name}] {res}")
            except Exception as e:
                RESULTS[name] = {"failed": f"{type(e).__name__}: {str(e)[:300]}"}
                log(f"[{name}] FAILED {type(e).__name__}: {str(e)[:300]}")
        return run
    return deco


def _dot_probe(lhs_dtype, rhs_dtype, m=768, k=3072, n=6144, cast_in_kernel=False):
    rng = np.random.default_rng(0)
    lhs8 = jnp.asarray(rng.integers(-8, 8, size=(m, k)), jnp.int8)
    rhs8 = jnp.asarray(rng.integers(-8, 8, size=(k, n)), jnp.int8)
    lhs = lhs8 if (cast_in_kernel or lhs_dtype == jnp.int8) else lhs8.astype(lhs_dtype)
    rhs = rhs8 if (cast_in_kernel or rhs_dtype == jnp.int8) else rhs8.astype(rhs_dtype)

    def kern(l_ref, r_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        l = l_ref[...]
        r = r_ref[...]
        if cast_in_kernel:
            if lhs_dtype != jnp.int8:
                l = l.astype(lhs_dtype)
            if rhs_dtype != jnp.int8:
                r = r.astype(rhs_dtype)
        o_ref[...] += jax.lax.dot_general(
            l, r, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((m, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )
    call = f
    f = jax.jit(lambda a, b: call(a, b))
    # correctness: spot-check 8 rows (full int64 matmul on host is minutes)
    want = STEPS * np.asarray(lhs8[:8], np.int64) @ np.asarray(rhs8, np.int64)
    got = np.asarray(f(lhs, rhs), np.int64)[:8]
    exact = bool(np.array_equal(got, want))
    t = bench(f, lhs, rhs) / STEPS
    macs = m * k * n
    return {
        "us_per_step": round(t * 1e6, 2),
        "tops": round(2 * macs / t / 1e12, 1),
        "exact": exact,
    }


@probe("A_int8_dot")
def probe_a():
    return _dot_probe(jnp.int8, jnp.int8)


@probe("B_int4xint8_dot")
def probe_b():
    return _dot_probe(jnp.int4, jnp.int8)


@probe("B2_int4xint8_cast_in_kernel")
def probe_b2():
    return _dot_probe(jnp.int4, jnp.int8, cast_in_kernel=True)


@probe("C_int4xint4_dot")
def probe_c():
    return _dot_probe(jnp.int4, jnp.int4)


def _barrel_probe(transposed: bool):
    n, bt = 512, 768
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=(n, bt) if transposed else (bt, n), dtype=np.uint32))
    a = jnp.asarray(rng.integers(0, 2 * n, size=(1, bt) if transposed else (bt, 1), dtype=np.int32))

    def kern(x_ref, a_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[...] = x_ref[...]

        rot = o_ref[...]
        av = a_ref[...]
        axis = 0 if transposed else 1
        if transposed:
            coeff = jax.lax.broadcasted_iota(jnp.int32, (n, bt), 0)
        else:
            coeff = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)
        for kb in range(9):  # log2(N) cyclic stages
            sh = 1 << kb
            r = pltpu.roll(rot, sh, axis)
            rot = jnp.where(((av >> kb) & 1) == 1, r, rot)
        wrapped = ((coeff - av) & jnp.int32(2 * n - 1)) >= n
        o_ref[...] = jnp.where(wrapped, -rot, rot)

    shp = (n, bt) if transposed else (bt, n)
    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec(shp, lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(a.shape, lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(shp, lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shp, jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    call = f
    f = jax.jit(lambda xx, aa: call(xx, aa))
    _ = np.asarray(f(x, a))  # compiles + runs
    t = bench(f, x, a) / STEPS
    return {"us_per_step": round(t * 1e6, 2)}


@probe("D_lane_barrel")
def probe_d1():
    return _barrel_probe(transposed=False)


@probe("D_sublane_barrel")
def probe_d2():
    return _barrel_probe(transposed=True)


@probe("E_digit_toeplitz_expand")
def probe_e():
    n, r_dim = 512, 18
    rng = np.random.default_rng(2)
    d = jnp.asarray(rng.integers(-8, 8, size=(r_dim, n), dtype=np.int32))

    def kern(d_ref, o_ref, w_ref):
        s = pl.program_id(0)
        for r in range(r_dim):
            g = d_ref[r : r + 1, :]
            g_ext = jnp.concatenate([g, -g], axis=1)
            base = jnp.broadcast_to(g_ext, (n, 2 * n))
            circ = pltpu.roll(base, 0, 1, stride=1, stride_axis=0)
            w_ref[r * n : (r + 1) * n, :] = circ[:, :n].astype(jnp.int8)
        o_ref[...] = (
            jnp.sum(w_ref[0:8, :].astype(jnp.int32), axis=0, keepdims=True) + s
        )

    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((r_dim, n), lambda s: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r_dim * n, n), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    call = f
    f = jax.jit(lambda dd: call(dd))
    _ = np.asarray(f(d))
    t = bench(f, d) / STEPS
    return {"us_per_step": round(t * 1e6, 2)}


@probe("F_dense_fwd_dots")
def probe_f():
    # 72 dots/step of [512,512]x[512,768] i8 (2 primes x 2 w-limbs x 18 rows),
    # modeled as 72 accumulating dots against one resident matrix
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.integers(-128, 128, size=(512, 512)), jnp.int8)
    d = jnp.asarray(rng.integers(-8, 8, size=(512, 768)), jnp.int8)

    def kern(w_ref, d_ref, o_ref):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        acc = jnp.zeros((512, 768), jnp.int32)
        for _ in range(72):
            acc += jax.lax.dot_general(
                w_ref[...], d_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        o_ref[...] += acc

    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((512, 512), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 768), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((512, 768), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, 768), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    call = f
    f = jax.jit(lambda a, b: call(a, b))
    _ = np.asarray(f(w, d))
    t = bench(f, w, d) / STEPS
    macs = 72 * 512 * 512 * 768
    return {"us_per_step": round(t * 1e6, 2), "tops": round(2 * macs / t / 1e12, 1)}


@probe("G_per_bin_merged_dots")
def probe_g():
    # 64 bins x 2 primes, one stacked dot [144,144]x[144,1536] each, rhs from a
    # bins-leading VMEM scratch (the nttf merged-stage shape at N1=64)
    rng = np.random.default_rng(4)
    keys = jnp.asarray(rng.integers(-128, 128, size=(128, 144, 144)), jnp.int8)
    dh = jnp.asarray(rng.integers(-128, 128, size=(64, 144, 1536)), jnp.int8)

    def kern(k_ref, d_ref, o_ref, c_ref):
        s = pl.program_id(0)
        for b in range(64):
            for p in range(2):
                c_ref[b] = jax.lax.dot_general(
                    k_ref[b * 2 + p], d_ref[b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        o_ref[...] = c_ref[s % 64].astype(jnp.int32)

    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((128, 144, 144), lambda s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 144, 1536), lambda s: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((144, 1536), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((144, 1536), jnp.int32),
        scratch_shapes=[pltpu.VMEM((64, 144, 1536), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )
    call = f
    f = jax.jit(lambda a, b: call(a, b))
    _ = np.asarray(f(keys, dh))
    t = bench(f, keys, dh) / STEPS
    macs = 128 * 144 * 144 * 1536
    return {"us_per_step": round(t * 1e6, 2), "tops": round(2 * macs / t / 1e12, 1)}


@probe("H_vpu_mod_split")
def probe_h():
    # 36 planes (18 rows x 2 primes) of: wlimb-combine + Barrett mod-center +
    # 2-limb split on [512, 768] i32 — the per-step D-hat handling cost
    rng = np.random.default_rng(5)
    hi = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, size=(512, 768), dtype=np.int32))
    lo = jnp.asarray(rng.integers(-(1 << 20), 1 << 20, size=(512, 768), dtype=np.int32))

    def kern(h_ref, l_ref, o_ref):
        s = pl.program_id(0)
        acc = jnp.zeros((512, 768), jnp.int32)
        for i in range(36):
            p = 12289 if i % 2 == 0 else 40961
            x = (h_ref[...] << 8) + l_ref[...]
            # centered reduction (XLA lowers const-division to mul-high)
            q = x // jnp.int32(p)
            r = x - q * jnp.int32(p)
            r = r - jnp.int32(p) * (r > jnp.int32(p // 2)).astype(jnp.int32)
            l8 = ((r + 128) & 255) - 128
            h8 = (r - l8) >> 8
            acc += h8 + l8
        o_ref[...] = acc + s

    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((512, 768), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 768), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((512, 768), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, 768), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    call = f
    f = jax.jit(lambda a, b: call(a, b))
    _ = np.asarray(f(hi, lo))
    t = bench(f, hi, lo) / STEPS
    return {"us_per_step": round(t * 1e6, 2)}


@probe("I_transpose_i32")
def probe_i():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(768, 512), dtype=np.int32))

    def kern(x_ref, o_ref):
        s = pl.program_id(0)
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0)) + s

    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((768, 512), lambda s: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((512, 768), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, 768), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    call = f
    f = jax.jit(lambda a: call(a))
    got = np.asarray(f(x))
    exact = bool(np.array_equal(got, np.asarray(x).T + STEPS - 1))
    t = bench(f, x) / STEPS
    return {"us_per_step": round(t * 1e6, 2), "exact": exact}


@probe("J_free_reshape_leading")
def probe_j():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, 1 << 30, size=(512, 768), dtype=np.int32))

    def kern(x_ref, o_ref):
        s = pl.program_id(0)
        x3 = x_ref[...].reshape(64, 8, 768)
        acc = jnp.zeros((8, 768), jnp.int32)
        for i in range(64):
            acc += x3[i]
        o_ref[...] = acc + s

    f = pl.pallas_call(
        kern,
        grid=(STEPS,),
        in_specs=[pl.BlockSpec((512, 768), lambda s: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 768), lambda s: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 768), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
    )
    call = f
    f = jax.jit(lambda a: call(a))
    got = np.asarray(f(x))
    want = np.asarray(x).reshape(64, 8, 768).sum(0) + STEPS - 1
    exact = bool(np.array_equal(got, want))
    t = bench(f, x) / STEPS
    return {"us_per_step": round(t * 1e6, 2), "exact": exact}


ALL = [probe_a, probe_b, probe_b2, probe_c, probe_d1, probe_d2, probe_e,
       probe_f, probe_g, probe_h, probe_i, probe_j]

if __name__ == "__main__":
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for p in ALL:
        if only and not any(o in p.__qualname__ or o in str(p) for o in only):
            continue
        p()
    with open("ARTIFACTS/probe_r4_kernels.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    log("written ARTIFACTS/probe_r4_kernels.json")
