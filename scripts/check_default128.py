"""default_128 correctness artifact: full gate truth tables + noise margins on
real hardware, for every production backend.

Writes ARTIFACTS/default128_check.json (committed each round) so the perf
numbers in BENCH_r*.json always have a matching correctness record at the
same parameter set on the same hardware (VERDICT r1 weak #4).

Run on the TPU chip:  python scripts/check_default128.py [--batch 512]
(CPU runs work too but take much longer; use --impls conv there.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


GATES = ["and", "or", "xor", "nand", "nor", "xnor"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default="default_128")
    ap.add_argument("--batch", type=int, default=512, help="per gate (all 4 input combos)")
    ap.add_argument("--impls", default="pallas,fused,fused3,bmmp")
    ap.add_argument("--out", default="ARTIFACTS/default128_check.json")
    args = ap.parse_args()
    impls = args.impls.split(",")

    import tfhe_tpu as tfhe
    from tfhe_tpu.models import lwe as mlwe
    from tfhe_tpu.models import test_vector as mtv
    from tfhe_tpu.models.bootstrap import pbs
    from tfhe_tpu.models.keys import keygen
    from tfhe_tpu.utils import noise as unoise

    params = tfhe.get_params(args.params)
    need_bmmp = any(i.startswith("bmmp") for i in impls)
    log(f"device: {jax.devices()[0]}, params: {params.name}")
    t0 = time.time()
    ck, sk = jax.jit(partial(keygen, params, bmmp=need_bmmp))(jax.random.key(42))
    jax.block_until_ready(sk.bk_u32)
    log(f"keygen: {time.time()-t0:.1f}s")

    # tv enters as a traced ARGUMENT so all gates share one executable per impl
    def gate_fn(ct0, ct1, server_key, tv, impl):
        ct_in = mlwe.add(mlwe.scalar_mul(ct1, 2), ct0)
        return pbs(params, ct_in, server_key, tv, impl=impl)

    rng = np.random.default_rng(7)
    b = args.batch
    lhs = np.tile(np.array([0, 0, 1, 1], np.uint32), b // 4)
    rhs = np.tile(np.array([0, 1, 0, 1], np.uint32), b // 4)
    ct1 = jax.block_until_ready(tfhe.encrypt(ck, lhs, key=int(rng.integers(1 << 30))))
    ct0 = jax.block_until_ready(tfhe.encrypt(ck, rhs, key=int(rng.integers(1 << 30))))

    result = {
        "params": params.name,
        "device": str(jax.devices()[0]),
        "batch_per_gate": b,
        "impls": {},
    }
    for impl in impls:
        f = jax.jit(partial(gate_fn, impl=impl))
        per_gate = {}
        worst = 0.0
        total_errs = 0
        t0 = time.time()
        for gi, gname in enumerate(GATES):
            tv = jnp.asarray(mtv.gate_test_vector(params, gname))
            out = f(ct0, ct1, sk, tv)
            got = np.asarray(tfhe.decrypt(ck, out))
            want = np.array(
                [mtv.GATE_FNS[gname](int(l), int(r)) for l, r in zip(lhs, rhs)],
                np.uint32,
            )
            errs = int((got != want).sum())
            rep = unoise.measure(ck, out, want)
            per_gate[gname] = {
                "errors": errs,
                "noise_max_over_delta": round(rep.max_abs_over_delta, 4),
                "noise_mean_over_delta": round(rep.mean_abs_over_delta, 4),
            }
            worst = max(worst, rep.max_abs_over_delta)
            total_errs += errs
            log(f"[{impl}] {gname}: {errs}/{b} errors, max|e|/D={rep.max_abs_over_delta:.4f}")
        result["impls"][impl] = {
            "gates": per_gate,
            "total_errors": total_errs,
            "total_checked": b * len(GATES),
            "worst_noise_max_over_delta": round(worst, 4),
            "wall_s": round(time.time() - t0, 1),
        }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps({k: v["total_errors"] for k, v in result["impls"].items()}))


if __name__ == "__main__":
    main()
