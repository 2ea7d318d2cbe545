"""Round-5 timing-methodology probe: amortized async-dispatch timing carries
a residual ~RTT/iters per call.  Measures the SAME B=1 fusedl gate at
different dispatches-per-sync; if t(iters) ~ t_true + RTT/iters, the fit
exposes both.  Justifies bench.py's 64-dispatch latency rows and quantifies
how much of r4's 9.5 ms B=1 figure was methodology."""
import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE", "/tmp/tfhe_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import tfhe_tpu as tfhe
    from tfhe_tpu.models import lwe as mlwe
    from tfhe_tpu.models import test_vector as mtv
    from tfhe_tpu.models.bootstrap import pbs
    from tfhe_tpu.models.keys import keygen, with_latency_key

    params = tfhe.get_params("default_128")
    ck, sk = jax.jit(partial(keygen, params))(jax.random.key(0))
    sk = jax.jit(with_latency_key)(sk)
    jax.block_until_ready(sk.bk_lat)
    tv = jnp.asarray(mtv.gate_test_vector(params, "nand"))

    def gate(ct0, ct1, server_key):
        ct_in = mlwe.add(mlwe.scalar_mul(ct1, 2), ct0)
        return pbs(params, ct_in, server_key, tv, impl="fusedl")

    f = jax.jit(gate)
    ct0 = jax.block_until_ready(tfhe.encrypt(ck, np.array([1], np.uint32), key=1))
    ct1 = jax.block_until_ready(tfhe.encrypt(ck, np.array([0], np.uint32), key=2))
    np.asarray(f(ct0, ct1, sk))  # warm-up

    rows = {}
    for iters in (4, 8, 16, 32, 64, 128, 256):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [f(ct0, ct1, sk) for _ in range(iters)]
            np.asarray(outs[-1][0, :1])
            best = min(best, (time.perf_counter() - t0) / iters)
        rows[str(iters)] = round(best * 1e3, 3)
        print(f"iters={iters}: {best*1e3:.3f} ms/call", file=sys.stderr)
    # least-squares fit t = t_true + rtt/iters
    xs = np.array([1.0 / int(k) for k in rows])
    ys = np.array(list(rows.values()))
    a = np.vstack([np.ones_like(xs), xs]).T
    (t_true, rtt), *_ = np.linalg.lstsq(a, ys, rcond=None)
    out = dict(
        per_call_ms_by_dispatches_per_sync=rows,
        fit_true_ms=round(float(t_true), 3),
        fit_rtt_ms=round(float(rtt), 2),
        note="t(iters) = t_true + RTT/iters; B=1 fusedl NAND gate, v5e",
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
