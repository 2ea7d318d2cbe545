"""Command-line interface: keygen / encrypt / gate / decrypt / demo.

The reference ships a hello-world binary (src/main.rs:1-3); this is the real
client/server workflow driver on top of the serialization layer:

    python -m tfhe_tpu.cli keygen  --params default_128 --out keys/
    python -m tfhe_tpu.cli encrypt --client keys/client.npz --bits 1011 --out a.npz
    python -m tfhe_tpu.cli gate    --server keys/server.npz --op nand \
                                   --lhs a.npz --rhs b.npz --out out.npz
    python -m tfhe_tpu.cli decrypt --client keys/client.npz --in out.npz
    python -m tfhe_tpu.cli demo    --params test_insecure
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _jax():
    import jax

    return jax


def cmd_keygen(args):
    jax = _jax()
    import tfhe_tpu as tfhe
    from tfhe_tpu.utils import serialization as ser

    params = tfhe.get_params(args.params)
    t0 = time.time()
    ck, sk = jax.jit(lambda k: tfhe.keygen(params, k))(jax.random.key(args.seed))
    jax.block_until_ready(sk.bk_u32)
    os.makedirs(args.out, exist_ok=True)
    ser.save_client_key(os.path.join(args.out, "client.npz"), ck)
    ser.save_server_key(os.path.join(args.out, "server.npz"), sk)
    print(f"keygen({params.name}) in {time.time()-t0:.1f}s -> {args.out}/{{client,server}}.npz")


def cmd_encrypt(args):
    import tfhe_tpu as tfhe
    from tfhe_tpu.utils import serialization as ser

    ck = ser.load_client_key(args.client)
    bits = np.array([int(c) for c in args.bits], dtype=np.uint32)
    assert np.all(bits < (1 << ck.params.log_p))
    cts = tfhe.encrypt(ck, bits, key=args.seed)
    ser.save_ciphertexts(args.out, cts, ck.params)
    print(f"encrypted {len(bits)} messages -> {args.out}")


def cmd_gate(args):
    import tfhe_tpu as tfhe
    from tfhe_tpu.utils import serialization as ser

    sk = ser.load_server_key(args.server)
    lhs, p1 = ser.load_ciphertexts(args.lhs)
    rhs, p2 = ser.load_ciphertexts(args.rhs)
    assert p1 == sk.params and p2 == sk.params, "parameter mismatch"
    if args.impl == "ntt":
        from tfhe_tpu.models.keys import with_ntt_key

        sk = with_ntt_key(sk)
    t0 = time.time()
    if args.op == "not":
        out = tfhe.gates.not_(sk, lhs)
    else:
        # index = 2*lhs + rhs
        out = tfhe.gates.gate(sk, args.op, rhs, lhs, impl=args.impl)
    np.asarray(out)
    ser.save_ciphertexts(args.out, out, sk.params)
    print(f"{args.op} on {lhs.shape[0]} ciphertext pairs in {time.time()-t0:.1f}s -> {args.out}")


def cmd_decrypt(args):
    import tfhe_tpu as tfhe
    from tfhe_tpu.utils import serialization as ser

    ck = ser.load_client_key(args.client)
    cts, p = ser.load_ciphertexts(args.infile)
    assert p == ck.params
    bits = np.asarray(tfhe.decrypt(ck, cts))
    print("".join(str(int(b)) for b in bits))


def cmd_demo(args):
    jax = _jax()
    import tfhe_tpu as tfhe

    params = tfhe.get_params(args.params)
    print(f"params: {params.name} (n={params.lwe_dimension}, k={params.glwe_dimension}, "
          f"N={params.degree})")
    t0 = time.time()
    ck, sk = jax.jit(lambda k: tfhe.keygen(params, k))(jax.random.key(0))
    jax.block_until_ready(sk.bk_u32)
    print(f"keygen: {time.time()-t0:.1f}s (bk {np.asarray(sk.bk_u32).nbytes/1e6:.1f} MB)")
    rng = np.random.default_rng(args.seed)
    a = rng.integers(0, 2, size=8).astype(np.uint32)
    b = rng.integers(0, 2, size=8).astype(np.uint32)
    ca = tfhe.encrypt(ck, a, key=1)
    cb = tfhe.encrypt(ck, b, key=2)
    for op, fn in [("and", None), ("xor", None), ("nand", None)]:
        t0 = time.time()
        out = tfhe.gates.gate(sk, op, cb, ca)
        got = np.asarray(tfhe.decrypt(ck, out))
        import tfhe_tpu.models.test_vector as mtv

        want = np.array([mtv.GATE_FNS[op](int(x), int(y)) for x, y in zip(a, b)])
        ok = "OK" if np.array_equal(got, want) else "MISMATCH"
        print(f"{op:5s}({a.tolist()},{b.tolist()}) = {got.tolist()} [{ok}] "
              f"({time.time()-t0:.1f}s)")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tfhe_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("keygen");  kg.set_defaults(fn=cmd_keygen)
    kg.add_argument("--params", default="default_128")
    kg.add_argument("--out", required=True)
    kg.add_argument("--seed", type=int, default=0)

    en = sub.add_parser("encrypt"); en.set_defaults(fn=cmd_encrypt)
    en.add_argument("--client", required=True)
    en.add_argument("--bits", required=True, help="e.g. 1011")
    en.add_argument("--out", required=True)
    en.add_argument("--seed", type=int, default=1)

    ga = sub.add_parser("gate");    ga.set_defaults(fn=cmd_gate)
    ga.add_argument("--server", required=True)
    ga.add_argument("--op", required=True,
                    choices=["and", "or", "xor", "nand", "nor", "xnor",
                             "andny", "andyn", "not"])
    ga.add_argument("--lhs", required=True)
    ga.add_argument("--rhs", required=False, default=None)
    ga.add_argument("--out", required=True)
    ga.add_argument("--impl", default="auto",
                    choices=["auto", "conv", "matmul", "pallas", "fused",
                             "fused3", "bmmp", "ntt"])

    de = sub.add_parser("decrypt"); de.set_defaults(fn=cmd_decrypt)
    de.add_argument("--client", required=True)
    de.add_argument("--in", dest="infile", required=True)

    dm = sub.add_parser("demo");    dm.set_defaults(fn=cmd_demo)
    dm.add_argument("--params", default="test_insecure")
    dm.add_argument("--seed", type=int, default=7)

    args = ap.parse_args(argv)
    if args.cmd == "gate" and args.op != "not" and args.rhs is None:
        ap.error("--rhs required for binary gates")
    if args.cmd == "gate" and args.op == "not" and args.rhs is None:
        args.rhs = args.lhs
    args.fn(args)


if __name__ == "__main__":
    main()
