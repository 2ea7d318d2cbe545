"""Hardware validation of the fused whole-scan blind-rotate Pallas kernel.

Compares blind_rotate_fused (ops/pallas/blind_rotate_kernel.py) bit-exactly
against the production pallas scan backend at default_128, then times both.
Run on the real TPU chip (not under the CPU conftest).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import tfhe_tpu as tfhe
from tfhe_tpu.models import lwe as mlwe
from tfhe_tpu.models import test_vector as mtv
from tfhe_tpu.models.bootstrap import _init_acc, blind_rotate
from tfhe_tpu.models.keys import keygen
from tfhe_tpu.ops.pallas.blind_rotate_kernel import blind_rotate_fused
from tfhe_tpu.ops.torus import switch_modulus, u32

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128

params = tfhe.get_params("default_128")
ck, sk = jax.jit(lambda key: keygen(params, key))(jax.random.key(0))
jax.block_until_ready(sk.bk_u32)
print(f"keys ready, batch={BATCH}", flush=True)

tv = u32(jnp.asarray(mtv.gate_test_vector(params, "nand")))
rng = np.random.default_rng(0)
lhs = rng.integers(0, 2, size=BATCH).astype(np.uint32)
rhs = rng.integers(0, 2, size=BATCH).astype(np.uint32)
ct1 = tfhe.encrypt(ck, lhs, key=1)
ct0 = tfhe.encrypt(ck, rhs, key=2)
ct_in = mlwe.add(mlwe.scalar_mul(ct1, 2), ct0)
approx = switch_modulus(u32(ct_in), params.log_q, params.log_degree + 1)


@jax.jit
def fused(approx_ct):
    acc0, a_hat = _init_acc(params, approx_ct, tv)
    return blind_rotate_fused(params, acc0, sk.bk_u32, a_hat)


@partial(jax.jit, static_argnames="impl")
def scan_path(approx_ct, impl="pallas"):
    return blind_rotate(params, approx_ct, sk, tv, impl=impl)


t0 = time.time()
out_fused = np.asarray(fused(approx))
print(f"fused compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out_scan = np.asarray(scan_path(approx))
print(f"scan  compile+run: {time.time()-t0:.1f}s", flush=True)

if np.array_equal(out_fused, out_scan):
    print("BIT-EXACT: fused == scan backend")
else:
    bad = (out_fused != out_scan).sum()
    print(f"MISMATCH: {bad}/{out_fused.size} elements differ")
    sys.exit(1)

for name, f in [("fused", fused), ("scan", scan_path)]:
    times = []
    for _ in range(4):
        t0 = time.time()
        r = f(approx)
        _ = float(jnp.sum(r))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name}: best {best*1e3:.1f}ms -> {BATCH/best:.1f} rotations/s")
