"""Hardware probe: where do the fused blind-rotate kernel's cycles go?

Random-tensor harness (wrapping-u32 exactness makes random keys as good as
real ones for timing): sweeps batch_tile, and uses the skip_expand /
skip_digits timing probes to split per-step cost into
  MXU contraction | Toeplitz expansion | barrel+carry digit pipeline.
Prints one line per config.  Run on the real TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tfhe_tpu.params import get_params
from tfhe_tpu.ops.pallas.blind_rotate_kernel import blind_rotate_fused

params = get_params("default_128")
n, k1, N = params.lwe_dimension, params.glwe_dimension + 1, params.degree
R = k1 * params.pbs_decomposer.levels
B = int(sys.argv[1]) if len(sys.argv) > 1 else 3072

key = jax.random.key(0)
k1_, k2_, k3_ = jax.random.split(key, 3)
bk = jax.random.bits(k1_, (n, R, k1, N), jnp.uint32)
acc0 = jax.random.bits(k2_, (B, k1, N), jnp.uint32)
a_hat = jax.random.randint(k3_, (n, B), 0, 2 * N, jnp.int32)
jax.block_until_ready((bk, acc0, a_hat))
print(f"B={B} inputs ready", flush=True)

ref_out = None


def run(tag, **kw):
    global ref_out
    f = lambda: blind_rotate_fused(params, acc0, bk, a_hat, **kw)
    t0 = time.perf_counter()
    out = f()
    _ = float(jnp.sum(out))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        _ = float(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    best = min(times)
    exact = ""
    if (not kw.get("skip_expand") and not kw.get("skip_digits")
            and not kw.get("balanced") and kw.get("key_limbs", 4) == 4):
        if ref_out is None:
            ref_out = out
            exact = " [ref]"
        else:
            exact = " EXACT" if bool(jnp.all(out == ref_out)) else " MISMATCH!"
    print(f"{tag:28s} best {best*1e3:7.1f}ms  {best*1e6/n:7.1f}us/step  "
          f"{B/best:7.1f} rot/s  (compile {compile_s:.0f}s){exact}", flush=True)


which = os.environ.get("PROBE", "wide")
if which == "pipe":
    from tfhe_tpu.ops.pallas.blind_rotate_kernel import blind_rotate_fused_pipe

    def run_pipe(tag, **kw):
        global ref_out
        f = lambda: blind_rotate_fused_pipe(params, acc0, bk, a_hat, **kw)
        t0 = time.perf_counter()
        out = f()
        _ = float(jnp.sum(out))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = f()
            _ = float(jnp.sum(out))
            times.append(time.perf_counter() - t0)
        best = min(times)
        exact = ""
        if kw.get("key_limbs", 4) == 4 and ref_out is not None:
            exact = " EXACT" if bool(jnp.all(out == ref_out)) else " MISMATCH!"
        print(f"{tag:28s} best {best*1e3:7.1f}ms  {best*1e6/n:7.1f}us/step  "
              f"{B/best:7.1f} rot/s  (compile {compile_s:.0f}s){exact}",
              flush=True)

    run("narrow bt=512", batch_tile=512, wide=False)
    run_pipe("pipe bt=512", batch_tile=512)
elif which == "wide":
    run("wide bt=512", batch_tile=512, wide=True)
    run("narrow bt=512", batch_tile=512, wide=False)
    run("wide bt=768", batch_tile=768, wide=True)
    run("wide bt=512 3limb", batch_tile=512, wide=True, key_limbs=3)
elif which == "bal":
    # exact-chain (int32+trunc-cast) vs closed-form balanced digits
    run("wide bt=768 chain", batch_tile=768, wide=True)
    run("wide bt=768 balanced", batch_tile=768, wide=True, balanced=True)
    run("wide bt=768 bal 3limb", batch_tile=768, wide=True, balanced=True,
        key_limbs=3)
else:
    run("bt=512", batch_tile=512, wide=False)
    run("bt=512 skip_expand", batch_tile=512, skip_expand=True)
    run("bt=512 skip_digits", batch_tile=512, skip_digits=True)
    run("bt=512 skip_both", batch_tile=512, skip_expand=True, skip_digits=True)
    run("bt=512 3limb", batch_tile=512, key_limbs=3)
