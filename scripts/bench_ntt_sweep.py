"""Round-5 NTT best-shot sweep (VERDICT r4 item 4): give the block-NTT tier's
5.7x MAC advantage its best configuration, then close the question.

Sweeps the fused whole-scan NTT kernel (impl='nttf') over inner sizes N1 at
default_128 and the large-degree profiles, against the Toeplitz whole-scan
kernel ('fusedb'/'pallas') at the same batch.  Structurally infeasible
combinations are recorded with their reason (n2 % 8 != 0 tile alignment,
resident-key HBM, Mosaic compile failures) rather than skipped silently.

Writes ARTIFACTS/ntt_crossover_r5.json.

Usage: python scripts/bench_ntt_sweep.py [--quick]
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE", "/tmp/tfhe_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_best(fn, iters, *args, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        jax.block_until_ready(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def bench_impl(params, ck, sk, impl, batch, iters):
    import tfhe_tpu as tfhe
    from tfhe_tpu.models import lwe as mlwe
    from tfhe_tpu.models import test_vector as mtv
    from tfhe_tpu.models.bootstrap import pbs
    from tfhe_tpu.utils import noise as unoise

    tv = jnp.asarray(mtv.gate_test_vector(params, "nand"))

    def gate(ct0, ct1, server_key):
        ct_in = mlwe.add(mlwe.scalar_mul(ct1, 2), ct0)
        return pbs(params, ct_in, server_key, tv, impl=impl)

    f = jax.jit(gate)
    rng = np.random.default_rng(0)
    lhs = rng.integers(0, 2, size=batch).astype(np.uint32)
    rhs = rng.integers(0, 2, size=batch).astype(np.uint32)
    ct1 = jax.block_until_ready(tfhe.encrypt(ck, lhs, key=1))
    ct0 = jax.block_until_ready(tfhe.encrypt(ck, rhs, key=2))
    t0 = time.perf_counter()
    out = f(ct0, ct1, sk)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best, out = time_best(f, iters, ct0, ct1, sk)
    got = np.asarray(tfhe.decrypt(ck, out))
    want = 1 - (lhs & rhs)
    errs = int((got != want).sum())
    rep = unoise.measure(ck, out, want)
    return dict(
        impl=impl, batch=batch, ms=round(best * 1e3, 2),
        bootstraps_per_s=round(batch / best, 1), gate_errors=errs,
        noise_max_over_delta=round(rep.max_abs_over_delta, 4),
        compile_s=round(compile_s, 1),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="default_128 only")
    ap.add_argument("--only", default="",
                    help="comma-separated param names to restrict to")
    ap.add_argument("--single", default="",
                    help="run ONE case ('params:base' or 'params:<n1>') and "
                         "print its JSON row — used by --subproc, which runs "
                         "every case in a fresh process so one OOM cannot "
                         "poison the device arena for later cases")
    ap.add_argument("--subproc", action="store_true",
                    help="drive each case via a fresh subprocess")
    ap.add_argument("--out", default="ARTIFACTS/ntt_crossover_r5.json")
    args = ap.parse_args()

    import tfhe_tpu as tfhe
    from tfhe_tpu.models.keys import keygen, with_ntt_lhs_key
    from tfhe_tpu.ops import ntt as ontt

    res = {"note": (
        "nttf N1 sweep + large-degree crossover, v5e, NAND end-to-end, "
        "amortized async-dispatch timing; infeasible combos carry reasons. "
        "Baselines: fusedb/pallas Toeplitz whole-scan kernels same batch.")}

    cases = [("default_128", [32, 64], "fusedb", 1536)]
    if not args.quick:
        cases += [
            ("large_2048", [64, 128, 256], "pallas", 256),
            ("large_4096", [128, 256, 512], "pallas", 128),
        ]

    def run_case(pname, what, base_impl, batch):
        """One (params, backend-or-N1) measurement -> row dict."""
        params = tfhe.get_params(pname)
        ontt.set_plan_n1(None)
        ck, sk = jax.jit(partial(keygen, params))(jax.random.key(0))
        jax.block_until_ready(sk.bk_u32)
        if what == "base":
            try:
                r = bench_impl(params, ck, sk, base_impl, batch, args.iters)
                log(f"  {base_impl}: {r['bootstraps_per_s']} boots/s "
                    f"({r['gate_errors']} errors)")
                return r
            except Exception as e:
                log(f"  {base_impl} FAILED: {e}")
                return dict(impl=base_impl,
                            failed=f"{type(e).__name__}: {str(e)[:200]}")
        n1 = int(what)
        ontt.set_plan_n1(n1)
        plan = ontt.plan_for_params(params)
        tag = f"nttf[N1={n1},N2={plan.n2},limbs={plan.key_limbs}]"
        if plan.n2 % 8:
            log(f"  {tag}: infeasible (n2 % 8)")
            return dict(impl=tag, infeasible=(
                f"n2={plan.n2} violates the i32 tile alignment the fused "
                "kernel's [*, n2, bt] scratch views need (n2 % 8 == 0)"))
        try:
            t0 = time.perf_counter()
            # lhs-only form: ONE resident key copy (the nttf kernel's
            # operand), built directly from the canonical key — the only
            # HBM-feasible route at N >= 2048
            sk_n = jax.jit(partial(with_ntt_lhs_key, drop_rhs=True))(sk)
            jax.block_until_ready(sk_n.bk_ntt_lhs)
            key_gb = sk_n.bk_ntt_lhs.nbytes / 2**30
            log(f"  {tag}: key {key_gb:.2f} GiB "
                f"({time.perf_counter()-t0:.0f}s)")
        except Exception as e:  # HBM guard (ValueError) or device OOM
            log(f"  {tag}: infeasible ({type(e).__name__}: {str(e)[:120]})")
            return dict(impl=tag,
                        infeasible=f"{type(e).__name__}: {str(e)[:200]}")
        try:
            r = bench_impl(params, ck, sk_n, "nttf", batch, args.iters)
            r["impl"] = tag
            r["ntt_key_gib"] = round(key_gb, 2)
            log(f"  {tag}: {r['bootstraps_per_s']} boots/s "
                f"({r['gate_errors']} errors)")
            return r
        except Exception as e:
            log(f"  {tag} FAILED: {type(e).__name__}: {str(e)[:300]}")
            return dict(impl=tag, failed=f"{type(e).__name__}: {str(e)[:300]}")

    if args.only:
        keep = set(args.only.split(","))
        cases = [c for c in cases if c[0] in keep]

    if args.single:
        pname, what = args.single.split(":")
        base_impl, batch = next(
            (b, bt) for pn, _, b, bt in cases if pn == pname)
        print(json.dumps(run_case(pname, what, base_impl, batch)))
        return

    if args.subproc:
        import subprocess

        for pname, n1s, base_impl, batch in cases:
            log(f"=== {pname} (batch {batch}) ===")
            rows = []
            for what in ["base"] + [str(x) for x in n1s]:
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--single", f"{pname}:{what}",
                       "--iters", str(args.iters)]
                pr = subprocess.run(cmd, capture_output=True, text=True,
                                    timeout=7200)
                sys.stderr.write(pr.stderr[-2000:])
                try:
                    rows.append(json.loads(pr.stdout.strip().splitlines()[-1]))
                except Exception:
                    rows.append(dict(case=f"{pname}:{what}",
                                     failed=f"subprocess rc={pr.returncode}"))
            res[pname] = rows
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=1)
        log(f"wrote {args.out}")
        print(json.dumps(res))
        return

    # in-process fallback (no --subproc): same run_case per case, so both
    # modes measure the identical configuration; prefer --subproc on
    # hardware (a failed HBM allocation poisons the arena process-wide)
    for pname, n1s, base_impl, batch in cases:
        log(f"=== {pname} (batch {batch}) ===")
        res[pname] = [run_case(pname, what, base_impl, batch)
                      for what in ["base"] + [str(x) for x in n1s]]
        ontt.set_plan_n1(None)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(res, fh, indent=1)
    log(f"wrote {args.out}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
