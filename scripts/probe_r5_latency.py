"""Round-5 latency probes: steps_per_cell sweep of the bitcast latency kernel
at B=1 (how much of the ~9 us/step is per-grid-cell overhead?)."""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE", "/tmp/tfhe_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tfhe_tpu as tfhe
from tfhe_tpu.models.bootstrap import _init_acc
from tfhe_tpu.models.keys import keygen, with_latency_key
from tfhe_tpu.ops.pallas.latency_kernel import blind_rotate_latency


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_best(fn, iters=20, rounds=3):
    out = fn()
    np.asarray(jax.block_until_ready(out))[0, 0, 0]  # materialize
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(iters)]
        jax.block_until_ready(outs[-1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


def main():
    params = tfhe.get_params("default_128")
    ck, sk = jax.jit(lambda k: keygen(params, k))(jax.random.key(0))
    sk = jax.jit(with_latency_key)(sk)
    jax.block_until_ready(sk.bk_lat)
    rng = np.random.default_rng(0)
    res = {}
    for batch in (1, 4):
        approx = jnp.asarray(rng.integers(
            0, 2 * params.degree, size=(batch, params.lwe_dimension + 1),
            dtype=np.uint32))
        tv = jnp.asarray(rng.integers(0, 2**32, size=(params.degree,),
                                      dtype=np.uint32))
        acc0, a_hat = _init_acc(params, approx, tv)
        ref = None
        for spc, split in [(1, False), (2, False), (4, False), (8, False),
                           (1, True), (2, True)]:
            tag = f"B{batch}_spc{spc}" + ("_split" if split else "")
            try:
                f = lambda: blind_rotate_latency(
                    params, acc0, sk.bk_lat, a_hat[:, None, :],
                    steps_per_cell=spc, split_dots=split)
                t, out = time_best(f)
                outn = np.asarray(out)
                if ref is None:
                    ref = outn
                exact = bool(np.array_equal(outn, ref))
                res[tag] = dict(ms=round(t * 1e3, 3), exact_vs_spc1=exact)
                log(f"{tag}: {t*1e3:.2f} ms  exact={exact}")
            except Exception as e:
                res[tag] = f"failed: {type(e).__name__}"
                log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
