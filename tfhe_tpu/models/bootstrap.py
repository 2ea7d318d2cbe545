"""Programmable bootstrapping (reference: src/bootstrapping.rs) — scan-based.

Pipeline (src/bootstrapping.rs:58-120):
  1. modulus-switch the LWE ciphertext from q=2^32 to 2N;
  2. acc = trivial-GLWE(v(X)) * X^(-b_hat);
  3. n-step CMUX loop — here a ``lax.scan`` over the bootstrapping key with the
     whole ciphertext batch advancing together (per-sample monomial exponents);
  4. sample-extract coefficient 0 -> LWE of dimension k*N;
  5. key-switch back to dimension n.

The scan step fuses CMUX as acc += EP(digits(rot - acc), BK_i): decompose once,
one int8 MXU contraction, wrapping-u32 recombine.  Throughput comes from the
batch axis; the loop itself is inherently serial (SURVEY.md section 7.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tfhe_tpu.models import glwe as mglwe
from tfhe_tpu.models import keyswitch as mks
from tfhe_tpu.ops.pallas.ep_kernel import ep_contract_pallas
from tfhe_tpu.ops.poly import ep_combine, ep_contract_conv, ep_contract_matmul
from tfhe_tpu.ops.torus import switch_modulus, u32
from tfhe_tpu.params import TfheParams


def sample_extract0(glwe_ct) -> jnp.ndarray:
    """Extract coefficient 0 as an LWE of dimension k*N
    (src/bootstrapping.rs:122-156, specialised to sample_index=0)."""
    ct = u32(glwe_ct)
    n = ct.shape[-1]
    k = ct.shape[-2] - 1
    a = ct[..., :k, :]
    idx = (n - jnp.arange(n, dtype=jnp.int32)) & (n - 1)  # j -> (N-j) mod N
    w = jnp.take_along_axis(a, jnp.broadcast_to(idx, a.shape), axis=-1)
    w = jnp.where(jnp.arange(n) > 0, -w, w)
    flat = w.reshape(ct.shape[:-2] + (k * n,))
    b = ct[..., k, 0:1]
    return jnp.concatenate([flat, b], axis=-1)


def blind_rotate(
    params: TfheParams,
    approx_ct,
    bk_conv_i8,
    bk_u32,
    tv_encoded,
    impl: str = "conv",
) -> jnp.ndarray:
    """n-step CMUX loop (src/bootstrapping.rs:79-105); batched.

    approx_ct: u32[B, n+1] already mod-switched to 2N; tv_encoded: u32[N]
    (the *encoded* test-vector polynomial, src/bootstrapping.rs:82-86).
    ``impl`` selects the contraction formulation; the unused key layout may be
    passed as None.
    """
    k = params.glwe_dimension
    n_dim = params.lwe_dimension
    b_hat = approx_ct[..., n_dim].astype(jnp.int32)  # [B]
    batch = approx_ct.shape[:-1]

    acc_b = jnp.broadcast_to(u32(tv_encoded), batch + tv_encoded.shape)
    acc0 = mglwe.trivial_encrypt(acc_b, k)  # [B, k+1, N]
    acc0 = mglwe.mul_monomial(acc0, -b_hat)

    a_hat = jnp.moveaxis(approx_ct[..., :n_dim], -1, 0).astype(jnp.int32)  # [n, B]

    def step(acc, xs):
        bk_c, bk_m, a_i = xs
        rot = mglwe.mul_monomial(acc, a_i)  # acc * X^{a_i}
        digits = mglwe.decompose(rot - acc, params.pbs_decomposer)  # [B, R, N]
        if impl == "conv":
            raw = ep_contract_conv(digits, bk_c)
        elif impl == "pallas":
            raw = ep_contract_pallas(digits, bk_m)
        else:
            raw = ep_contract_matmul(digits, bk_m)
        return acc + ep_combine(raw, k + 1), None

    xs = (
        bk_conv_i8 if impl == "conv" else jnp.zeros((n_dim, 0), jnp.int8),
        bk_u32 if impl in ("matmul", "pallas") else jnp.zeros((n_dim, 0), jnp.uint32),
        a_hat,
    )
    acc, _ = lax.scan(step, acc0, xs)
    return acc


def pbs(
    params: TfheParams,
    ct,
    bk_conv_i8,
    bk_u32,
    ksk_mat_i8,
    tv_encoded,
    impl: str = "conv",
) -> jnp.ndarray:
    """Full programmable bootstrap (src/bootstrapping.rs:58-120); batched."""
    approx = switch_modulus(u32(ct), params.log_q, params.log_degree + 1)
    acc = blind_rotate(params, approx, bk_conv_i8, bk_u32, tv_encoded, impl=impl)
    extracted = sample_extract0(acc)
    from_n = params.glwe_dimension * params.degree
    return mks.key_switch(extracted, from_n, params.ks_decomposer, ksk_mat_i8)
