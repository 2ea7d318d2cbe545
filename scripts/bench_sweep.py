"""Hardware sweep: gate-bootstrap throughput per (impl, batch) on the real TPU.

Measures the full NAND gate (linear combine -> 722-step blind rotation ->
sample extract -> key switch) at default_128 for every backend x batch
combination, verifying gate outputs decrypt correctly in the same run.
Writes a JSON table to stdout (one line) and diagnostics to stderr.

Usage: python scripts/bench_sweep.py [--configs pallas:1024,fused:1024,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DEFAULT_CONFIGS = "pallas:1024,pallas:2048,pallas:4096,fused:1024,fused:2048,bmmp:1024,bmmp:2048"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=DEFAULT_CONFIGS)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--params", default="default_128")
    args = ap.parse_args()
    configs = [
        (c.split(":")[0], int(c.split(":")[1])) for c in args.configs.split(",")
    ]

    import tfhe_tpu as tfhe
    from tfhe_tpu.models import lwe as mlwe
    from tfhe_tpu.models import test_vector as mtv
    from tfhe_tpu.models.bootstrap import pbs
    from tfhe_tpu.models.keys import keygen

    params = tfhe.get_params(args.params)
    log(f"device: {jax.devices()[0]}, params: {params.name}")

    need_bmmp = any(i.startswith("bmmp") for i, _ in configs)
    t0 = time.time()
    ck, sk = jax.jit(partial(keygen, params, bmmp=need_bmmp))(jax.random.key(0))
    jax.block_until_ready(sk.bk_u32)
    log(f"keygen (bmmp={need_bmmp}): {time.time()-t0:.1f}s")

    tv = jnp.asarray(mtv.gate_test_vector(params, "nand"))

    def gate(ct0, ct1, server_key, impl):
        ct_in = mlwe.add(mlwe.scalar_mul(ct1, 2), ct0)
        return pbs(params, ct_in, server_key, tv, impl=impl)

    results = []
    for impl, batch in configs:
        try:
            f = jax.jit(partial(gate, impl=impl))
            rng = np.random.default_rng(0)
            lhs = rng.integers(0, 2, size=batch).astype(np.uint32)
            rhs = rng.integers(0, 2, size=batch).astype(np.uint32)
            ct1 = jax.block_until_ready(tfhe.encrypt(ck, lhs, key=1))
            ct0 = jax.block_until_ready(tfhe.encrypt(ck, rhs, key=2))
            t0 = time.time()
            out = f(ct0, ct1, sk)
            _ = float(jnp.sum(out))
            log(f"[{impl} b={batch}] compile+run: {time.time()-t0:.1f}s")
            times = []
            for _ in range(args.iters):
                t0 = time.time()
                out = f(ct0, ct1, sk)
                _ = float(jnp.sum(out))
                times.append(time.time() - t0)
            best = min(times)
            got = np.asarray(tfhe.decrypt(ck, out))
            errs = int((got != (1 - (lhs & rhs))).sum())
            rate = batch / best
            log(f"[{impl} b={batch}] best {best*1e3:.1f}ms -> {rate:.1f} boots/s, "
                f"gate errors {errs}/{batch}")
            results.append({"impl": impl, "batch": batch, "ms": round(best * 1e3, 2),
                            "bootstraps_per_s": round(rate, 1), "gate_errors": errs})
        except Exception as e:
            log(f"[{impl} b={batch}] FAILED: {type(e).__name__}: {e}")
            results.append({"impl": impl, "batch": batch, "error": f"{type(e).__name__}: {e}"[:300]})

    print(json.dumps(results))


if __name__ == "__main__":
    main()
