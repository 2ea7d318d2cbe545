"""Focused diagnostics for the nttf hardware path:

  H2  does Mosaic compile i32 `//` / `%` by a constant?
  H3  div-free Barrett mod-center (split multiply) — compile + exactness
  J2  value reshape [512,768]i32 -> [64,8,768]: is it numpy-semantics?
  J3  scratch-view pattern the nttf kernel uses (store dh.reshape, read back)
  T2  transpose [512, 128] i32 (latency-kernel shape)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESULTS = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(name, fn):
    try:
        t0 = time.perf_counter()
        res = fn()
        res["compile_s"] = round(time.perf_counter() - t0, 1)
        RESULTS[name] = res
        log(f"[{name}] {res}")
    except Exception as e:
        RESULTS[name] = {"failed": f"{type(e).__name__}: {str(e)[:200]}"}
        log(f"[{name}] FAILED {type(e).__name__}: {str(e)[:200]}")


def h2():
    p = 12289
    x = jnp.asarray(
        np.random.default_rng(0).integers(-(1 << 25), 1 << 25, size=(512, 768),
                                          dtype=np.int64).astype(np.int32))

    def kern(x_ref, o_ref):
        v = x_ref[...]
        q = v // jnp.int32(p)
        r = v - q * jnp.int32(p)
        o_ref[...] = r - jnp.int32(p) * (r > jnp.int32(p // 2)).astype(jnp.int32)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((512, 768), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    got = np.asarray(f(x)).astype(np.int64)
    xv = np.asarray(x).astype(np.int64)
    want = xv % p
    want = np.where(want > p // 2, want - p, want)
    return {"exact": bool(np.array_equal(got, want))}


def h3():
    # div-free centered mod for |x| <= 2^25:
    #   m = round(2^26/p); split x = xh*2^13 + xl; q ~= (xh*m + (xl*m >> 13)) >> 13
    #   r = x - q*p; then two conditional subtract/add to center
    p = 12289
    m = (1 << 26) // p
    x = jnp.asarray(
        np.random.default_rng(1).integers(-(1 << 25), 1 << 25, size=(512, 768),
                                          dtype=np.int64).astype(np.int32))

    def kern(x_ref, o_ref):
        v = x_ref[...]
        xh = v >> 13
        xl = v & jnp.int32((1 << 13) - 1)
        q = (xh * jnp.int32(m) + ((xl * jnp.int32(m)) >> 13)) >> 13
        r = v - q * jnp.int32(p)
        r = r - jnp.int32(p) * (r > jnp.int32(p // 2)).astype(jnp.int32)
        r = r - jnp.int32(p) * (r > jnp.int32(p // 2)).astype(jnp.int32)
        r = r + jnp.int32(p) * (r < jnp.int32(-(p // 2))).astype(jnp.int32)
        o_ref[...] = r

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((512, 768), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    got = np.asarray(f(x)).astype(np.int64)
    xv = np.asarray(x).astype(np.int64)
    want = xv % p
    want = np.where(want > p // 2, want - p, want)
    return {"exact": bool(np.array_equal(got, want))}


def j2():
    x = jnp.asarray(np.arange(512 * 768, dtype=np.int32).reshape(512, 768))

    def kern(x_ref, o_ref):
        x3 = x_ref[...].reshape(64, 8, 768)
        o_ref[...] = x3[5]

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 768), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    got = np.asarray(f(x))
    want = np.asarray(x).reshape(64, 8, 768)[5]
    return {"exact": bool(np.array_equal(got, want))}


def j3():
    # the nttf store/read pattern: scratch [R, 64, 8, bt]; store
    # scratch[r] = val.reshape(64, 8, bt); read scratch[:, b] -> [R, 1, 8, bt]
    # -> reshape [R*8, bt]
    r_d, bt = 6, 768
    x = jnp.asarray(
        np.random.default_rng(2).integers(-100, 100, size=(r_d, 512, bt),
                                          dtype=np.int32))

    def kern(x_ref, o_ref, scr):
        for r in range(r_d):
            scr[r] = x_ref[r].reshape(64, 8, bt)

        def body(b, _):
            v = scr[:, pl.dslice(b, 1)]  # [R, 1, 8, bt]
            o_ref[pl.dslice(b, 1)] = v.reshape(1, r_d * 8, bt)
            return 0

        jax.lax.fori_loop(0, 64, body, 0)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((64, r_d * 8, bt), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((r_d, 64, 8, bt), jnp.int32)],
    )
    got = np.asarray(f(x))
    xv = np.asarray(x).reshape(r_d, 64, 8, bt)
    want = np.stack([xv[:, b].reshape(r_d * 8, bt) for b in range(64)])
    return {"exact": bool(np.array_equal(got, want))}


def t2():
    x = jnp.asarray(np.random.default_rng(3).integers(
        0, 1 << 20, size=(512, 128), dtype=np.int32))

    def kern(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0))

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((128, 512), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    got = np.asarray(f(x))
    return {"exact": bool(np.array_equal(got, np.asarray(x).T))}


if __name__ == "__main__":
    for name, fn in [("H2_i32_const_div", h2), ("H3_barrett_divfree", h3),
                     ("J2_value_reshape", j2), ("J3_scratch_view", j3),
                     ("T2_transpose_512x128", t2)]:
        run(name, fn)
    with open("ARTIFACTS/probe_r4b_diag.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    log("written ARTIFACTS/probe_r4b_diag.json")
