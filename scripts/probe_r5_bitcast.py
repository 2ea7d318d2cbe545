"""Round-5 probe: semantics of pltpu.bitcast u32 -> int8 on TPU vs interpret.

Question: for x u32[M, L], what shape does bitcast(x, int8) produce, and how
do the 4 bytes of x[m, l] map into it?  Candidates:
  A) [4M, L] with out[4m + b, l] = byte b (little-endian) of x[m, l]
  B) [4M, L] with out[M*b + m, l] = byte b  (plane-major)
  C) [M, 4L] lane expansion
The latency-kernel bitcast optimisation needs a STATIC, known mapping (any of
them works — the key operand columns are permuted to match at key load).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

M, L = 8, 128


def kern(x_ref, o_ref):
    y = pltpu.bitcast(x_ref[...], jnp.int8)
    o_ref[...] = y


def run(interpret):
    x = np.arange(M * L, dtype=np.uint32).reshape(M, L)
    # distinctive bytes: byte b of x[m,l] = (b*64 + m*8 + l) % 251
    xb = np.zeros((M, L), np.uint32)
    for b in range(4):
        xb |= (((64 * b + 8 * np.arange(M)[:, None] + np.arange(L)[None, :]) % 251)
               .astype(np.uint32) << (8 * b))
    # try candidate output shapes until one compiles
    for shape in [(4 * M, L), (M, 4 * L)]:
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(shape, jnp.int8),
                interpret=interpret,
            )(jnp.asarray(xb))
            out = np.asarray(out)
            print(f"interpret={interpret}: out shape {out.shape} OK")
            break
        except Exception as e:
            print(f"interpret={interpret}: shape {shape} failed: {str(e)[:200]}")
    else:
        return
    want = lambda b: (64 * b + 8 * np.arange(M)[:, None] + np.arange(L)[None, :]) % 251
    w8 = lambda b: want(b).astype(np.uint8).astype(np.int8)
    if out.shape == (4 * M, L):
        okA = all(np.array_equal(out[4 * m + b], w8(b)[m]) for m in range(M) for b in range(4))
        okB = all(np.array_equal(out[M * b + m], w8(b)[m]) for m in range(M) for b in range(4))
        print(f"  A (row-interleaved little-endian): {okA}")
        print(f"  B (plane-major): {okB}")
        if not (okA or okB):
            print("  neither; out[0:8,0:6]:\n", out[0:8, 0:6])
            print("  want A rows 0..1:", w8(0)[0, 0:6], w8(1)[0, 0:6])
    else:
        print("  lane-expanded; out[0,0:16]:", out[0, 0:16])


if __name__ == "__main__":
    import sys
    run(interpret=(sys.argv[1:] == ["interpret"]))
