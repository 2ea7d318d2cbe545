"""Benchmark driver: gate bootstraps/sec on the available accelerator.

Workload: batched NAND gate bootstrapping at the default_128 parameter set
(n=722, k=2, N=512, l_pbs=6, l_ks=5 — the reference's non-test default,
src/lib.rs:101-123).  The reference publishes no numbers (SURVEY.md section
6); the north-star target is >=1000 gate bootstraps/sec/chip, which is used
as the baseline for ``vs_baseline``.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "bootstraps/s", "vs_baseline": N/1000}
Diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_BOOTSTRAPS_PER_SEC = 1000.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="default_128")
    ap.add_argument("--batch", type=int, default=0, help="0 = auto-tune")
    ap.add_argument("--impl", default="auto", choices=["auto", "conv", "matmul", "pallas"])
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--check", action="store_true", help="verify gate outputs decrypt correctly")
    args = ap.parse_args()

    import tfhe_tpu as tfhe
    from tfhe_tpu.models import lwe as mlwe
    from tfhe_tpu.models import test_vector as mtv
    from tfhe_tpu.models.bootstrap import pbs
    from tfhe_tpu.models.keys import keygen

    params = tfhe.get_params(args.params)
    dev = jax.devices()[0]
    log(f"device: {dev}, params: {params.name}")

    t0 = time.time()
    ck, sk = jax.jit(lambda key: keygen(params, key))(jax.random.key(0))
    jax.block_until_ready(sk.bk_conv)
    log(f"keygen (jitted): {time.time()-t0:.1f}s  bk={sk.bk_u32.nbytes/1e6:.1f}MB")

    tv = jnp.asarray(mtv.gate_test_vector(params, "nand"))

    def gate(ct0, ct1, server_key, impl):
        ct_in = mlwe.add(mlwe.scalar_mul(ct1, 2), ct0)
        return pbs(params, ct_in, server_key, tv, impl=impl)

    def bench_impl(impl: str, batch: int, iters: int):
        f = jax.jit(partial(gate, impl=impl))
        rng = np.random.default_rng(0)
        lhs = rng.integers(0, 2, size=batch).astype(np.uint32)
        rhs = rng.integers(0, 2, size=batch).astype(np.uint32)
        ct1 = jax.block_until_ready(tfhe.encrypt(ck, lhs, key=1))
        ct0 = jax.block_until_ready(tfhe.encrypt(ck, rhs, key=2))
        t0 = time.time()
        out = f(ct0, ct1, sk)
        _ = float(jnp.sum(out))  # force completion (block_until_ready is
        # unreliable through the remote tunnel)
        log(f"  [{impl} b={batch}] first call (compile+run): {time.time()-t0:.1f}s")
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = f(ct0, ct1, sk)
            _ = float(jnp.sum(out))
            times.append(time.time() - t0)
        best = min(times)
        rate = batch / best
        log(f"  [{impl} b={batch}] best {best*1e3:.1f}ms -> {rate:.1f} bootstraps/s")
        if args.check:
            got = np.asarray(tfhe.decrypt(ck, out))
            errs = int((got != (1 - (lhs & rhs))).sum())
            log(f"  [{impl} b={batch}] gate errors: {errs}/{batch}")
        return rate

    impls = ["pallas"] if args.impl == "auto" else [args.impl]
    batches = [args.batch] if args.batch else [1024]
    best_rate = 0.0
    for impl in impls:
        for b in batches:
            try:
                best_rate = max(best_rate, bench_impl(impl, b, args.iters))
            except Exception as e:
                log(f"  [{impl} b={b}] FAILED: {type(e).__name__}: {e}")
    if best_rate == 0.0 and args.impl == "auto":
        # pallas unavailable (e.g. CPU-only run): fall back to the conv backend
        try:
            best_rate = bench_impl("conv", 64, 2)
        except Exception as e:
            log(f"  [conv fallback] FAILED: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "gate bootstraps/sec/chip (default_128 NAND, batched PBS)",
                "value": round(best_rate, 2),
                "unit": "bootstraps/s",
                "vs_baseline": round(best_rate / BASELINE_BOOTSTRAPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
