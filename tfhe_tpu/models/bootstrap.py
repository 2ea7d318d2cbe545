"""Programmable bootstrapping (reference: src/bootstrapping.rs) — scan-based.

Pipeline (src/bootstrapping.rs:58-120):
  1. modulus-switch the LWE ciphertext from q=2^32 to 2N;
  2. acc = trivial-GLWE(v(X)) * X^(-b_hat);
  3. n-step CMUX loop — a ``lax.scan`` over the bootstrapping key with the
     whole ciphertext batch advancing together (per-sample monomial exponents
     via the barrel shifter);
  4. sample-extract coefficient 0 -> LWE of dimension k*N;
  5. key-switch back to dimension n.

The scan step fuses CMUX as acc += EP(digits(rot - acc), BK_i): decompose
once, one exact int8 MXU contraction, wrapping-u32 recombine.  Three
interchangeable contraction backends (all bit-identical):

  * ``pallas``  — fused Pallas kernel; the Toeplitz operand is built in VMEM
    by a strided roll (ops/pallas/ep_kernel.py).  Uses the transpose-free
    [k+1, B, N] accumulator layout with level-major digit rows matched by the
    row-permuted ``ServerKey.bk_lm``.  Default on TPU.
  * ``conv``    — one int8 ``conv_general_dilated`` per step.  Default on CPU.
  * ``matmul``  — explicit XLA Toeplitz expansion (cross-check baseline).

Throughput comes from the batch axis; the loop itself is inherently serial
(SURVEY.md section 7.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from tfhe_tpu.models import glwe as mglwe
from tfhe_tpu.models import keyswitch as mks
from tfhe_tpu.ops.decomposer import decompose_signed_planes
from tfhe_tpu.ops.pallas.ep_kernel import ep_contract_pallas_rbn
from tfhe_tpu.ops.poly import (
    ep_combine,
    ep_combine_planes,
    ep_contract_conv,
    ep_contract_matmul,
    monomial_mul,
)
from tfhe_tpu.ops.torus import switch_modulus, u32
from tfhe_tpu.params import TfheParams


# biggest batch one whole-scan pallas_call keeps VMEM-resident: at default_128
# the aliased acc window is B*6KB against a ~116MB budget with the 57MB
# Toeplitz scratch (ops/pallas/blind_rotate_kernel.py); 4096 leaves margin
_FUSED_MAX_BATCH = 4096


#: every backend string ``blind_rotate`` accepts (single source of truth for
#: bench.py / cli.py flag surfaces).  ``*_interpret`` variants run the same
#: Pallas kernel in interpret mode (CPU-runnable); ``fused3``/``fusedc3``/
#: ``fusedp3`` are the truncated-key approximate modes; ``fusedb`` swaps in
#: the balanced digit convention (exact mod 2^32, DIVERGENCES.md #3).
VALID_IMPLS = (
    "auto", "conv", "matmul", "pallas", "pallas_interpret",
    "fused", "fused3", "fusedb", "fusedb3", "fused_interpret",
    "fusedb_interpret",
    "fusedc", "fusedc3", "fusedc_interpret",
    "fusedp", "fusedp3", "fusedp_interpret",
    "fusedw", "fusedwb", "fusedw_interpret", "fusedwb_interpret",
    "bmmp", "bmmp_interpret", "ntt", "ntts", "nttf", "nttf_interpret",
    "fusedl", "fusedl_interpret", "bmmpl", "bmmpl_interpret",
)

#: latency-path impls (small-batch whole-scan kernels; never batch-chunked)
_LATENCY_IMPLS = ("fusedl", "fusedl_interpret", "bmmpl", "bmmpl_interpret")


def resolve_impl(impl: str) -> str:
    """'auto' -> 'pallas' on TPU, 'conv' elsewhere."""
    if impl != "auto":
        return impl
    return "pallas" if jax.default_backend() == "tpu" else "conv"


def sample_extract(glwe_ct, index=0) -> jnp.ndarray:
    """Extract coefficient ``index`` as an LWE of dimension k*N
    (src/bootstrapping.rs:122-156, general form).

    a'[i*N + j] = a_i[(index - j) mod N], negated where j > index (the
    negacyclic wraparound); b' = b[index].  ``index`` may be a Python int or
    a traced int32 scalar (broadcastable over the batch).
    """
    ct = u32(glwe_ct)
    n = ct.shape[-1]
    k = ct.shape[-2] - 1
    h = jnp.asarray(index, jnp.int32)  # scalar or [batch...]
    a = ct[..., :k, :]
    j = jnp.arange(n, dtype=jnp.int32)
    idx = ((h[..., None] - j) & (n - 1))[..., None, :]  # [..., 1, N]
    w = jnp.take_along_axis(a, jnp.broadcast_to(idx, a.shape), axis=-1)
    w = jnp.where((j > h[..., None])[..., None, :], -w, w)
    flat = w.reshape(ct.shape[:-2] + (k * n,))
    b = jnp.take_along_axis(
        ct[..., k, :], jnp.broadcast_to(h[..., None], ct.shape[:-2] + (1,)), axis=-1
    )
    return jnp.concatenate([flat, b], axis=-1)


def sample_extract0(glwe_ct) -> jnp.ndarray:
    """Coefficient-0 specialisation (the PBS hot path): at index 0 the
    gather collapses to a reverse + negate — a'[i*N+j] = a_i[(0-j) mod N]
    negated for j>0 is a_i[0] followed by the negated reversal of
    a_i[1:] — so no take_along_axis is needed (measured: the general
    gather cost 64ms of a 976ms gate at B=3072)."""
    ct = u32(glwe_ct)
    k = ct.shape[-2] - 1
    a = ct[..., :k, :]
    w = jnp.concatenate([a[..., :1], -jnp.flip(a[..., 1:], axis=-1)], axis=-1)
    flat = w.reshape(ct.shape[:-2] + (k * ct.shape[-1],))
    return jnp.concatenate([flat, ct[..., k, :1]], axis=-1)


def _init_acc(params: TfheParams, approx_ct, tv_encoded):
    """acc0 = trivial(v(X)) * X^(-b_hat), batched (src/bootstrapping.rs:79-86)."""
    k = params.glwe_dimension
    n_dim = params.lwe_dimension
    b_hat = approx_ct[..., n_dim].astype(jnp.int32)
    batch = approx_ct.shape[:-1]
    acc_b = jnp.broadcast_to(u32(tv_encoded), batch + tv_encoded.shape)
    acc0 = mglwe.trivial_encrypt(acc_b, k)
    acc0 = mglwe.mul_monomial(acc0, -b_hat)
    a_hat = jnp.moveaxis(approx_ct[..., :n_dim], -1, 0).astype(jnp.int32)  # [n, B]
    return acc0, a_hat


def rotate_chunk_xla(params, acc, bk_chunk, a_chunk, impl):
    """Run a contiguous chunk of CMUX steps (conv / matmul backends).

    acc: u32[B, k+1, N]; bk_chunk: the key slice for these steps
    (conv kernel layout for ``impl='conv'``, canonical u32 rows otherwise);
    a_chunk: int32[steps, B].  Exposed separately so the pipeline-parallel
    rotation (parallel/pipeline.py) can run per-stage chunks.
    """
    k = params.glwe_dimension

    def step(acc, xs):
        bk_i, a_i = xs
        rot = mglwe.mul_monomial(acc, a_i)  # acc * X^{a_i}
        digits = mglwe.decompose(rot - acc, params.pbs_decomposer)  # [B, R, N]
        if impl == "conv":
            raw = ep_contract_conv(digits, bk_i)
        else:
            raw = ep_contract_matmul(digits, bk_i)
        return acc + ep_combine(raw, k + 1), None

    acc, _ = lax.scan(step, acc, (bk_chunk, a_chunk))
    return acc


def _blind_rotate_xla(params, approx_ct, bk, tv_encoded, impl):
    """conv / matmul backends: acc layout [B, k+1, N]."""
    acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
    return rotate_chunk_xla(params, acc0, bk, a_hat, impl)


def rotate_chunk_pallas(params, acc, bk_lm_chunk, a_chunk, interpret=False):
    """Pallas-backed rotation chunk with the [B, k+1, N] acc interface
    (transposes to the kernel's [k+1, B, N] layout internally).  ``bk_lm_chunk``
    is a slice of ``ServerKey.bk_lm`` (level-major rows)."""
    k1 = params.glwe_dimension + 1
    levels = params.pbs_decomposer.levels
    acc_t = jnp.swapaxes(acc, 0, 1)  # [k+1, B, N]

    def step(a, xs):
        bk_i, a_i = xs
        rot = monomial_mul(a, a_i[None, :])
        digits = decompose_signed_planes(rot - a, params.pbs_decomposer)
        digits = digits.reshape((levels * k1,) + digits.shape[2:])
        raw = ep_contract_pallas_rbn(digits, bk_i, interpret=interpret)
        return a + ep_combine_planes(raw), None

    acc_t, _ = lax.scan(step, acc_t, (bk_lm_chunk, a_chunk))
    return jnp.swapaxes(acc_t, 0, 1)


def rotate_chunk_ntt(params, acc, bk_chunk, a_chunk, stream: bool = False):
    """Block-NTT rotation chunk ([B, k+1, N] acc).

    ``stream=False``: ``bk_chunk`` is the precomputed NTT-domain key from
    ``with_ntt_key`` (int8; best when the whole key fits HBM — ~1.9GB at
    default_128).  ``stream=True``: ``bk_chunk`` is the canonical u32 key;
    each step's GGSW rows are transformed to NTT domain INSIDE the scan.
    The transform is batch-independent (one key-side forward NTT per step,
    ~1% of the per-step MACs at B>=64), so streaming trades nothing at real
    batch sizes while keeping HBM at the canonical key's size — at
    large_2048 the resident NTT key would be 722 x 25MB = 18GB and cannot
    exist; streaming is the only way to run the MAC-optimal plan there.
    """
    from tfhe_tpu.ops.ntt import ep_contract_ntt, make_ep_ntt_key, plan_for_params

    k = params.glwe_dimension
    plan = plan_for_params(params)

    def step(a, xs):
        bk_i, a_i = xs
        if stream:
            bk_i = make_ep_ntt_key(bk_i, plan)
        rot = mglwe.mul_monomial(a, a_i)
        digits = mglwe.decompose(rot - a, params.pbs_decomposer)
        return a + ep_contract_ntt(digits, bk_i, plan, c_dim=k + 1), None

    acc, _ = lax.scan(step, acc, (bk_chunk, a_chunk))
    return acc


def rotate_chunk(params, acc, bk_chunk, a_chunk, impl, interpret=False):
    """Backend-generic rotation chunk: [B, k+1, N] acc in/out.  ``bk_chunk``
    must be the matching key form (bk_conv / bk_u32 / bk_lm / bk_ntt slices)."""
    if impl == "pallas":
        return rotate_chunk_pallas(params, acc, bk_chunk, a_chunk, interpret)
    if impl == "ntt":
        return rotate_chunk_ntt(params, acc, bk_chunk, a_chunk)
    return rotate_chunk_xla(params, acc, bk_chunk, a_chunk, impl)


def _blind_rotate_pallas(params, approx_ct, bk_lm, tv_encoded, interpret=False):
    """Pallas backend: transpose-free [k+1, B, N] accumulator, level-major
    digit rows r' = level*(k+1)+poly matching the permuted key ``bk_lm``."""
    acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
    return rotate_chunk_pallas(params, acc0, bk_lm, a_hat, interpret)


def _blind_rotate_ntt(params, approx_ct, bk, tv_encoded, stream: bool = False):
    """Block-NTT backend (ops/ntt.py): BK NTT-domain resident (or streamed,
    see ``rotate_chunk_ntt``), the per-step contraction is one merged
    [B, R*N2] @ [R*N2, C*L*N2] int8 matmul per NTT bin instead of the O(N^2)
    Toeplitz expansion — ~11x fewer MXU MACs at default_128 (see
    NOTES_NTT.md).  Bit-exact vs the other backends."""
    acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
    return rotate_chunk_ntt(params, acc0, bk, a_hat, stream=stream)


def _blind_rotate_bmmp(params, approx_ct, bk_bmmp_lm, tv_encoded, interpret=False):
    """BMMP halved-depth rotation (notes/BMMP Bootstrapping.md:15-25):

        acc *= X^(a s + a' s')
             = acc + EP(G(ss'), (X^(a+a')-1)acc)
                   + EP(G(s(1-s')), (X^a-1)acc)
                   + EP(G((1-s)s'), (X^(a')-1)acc)

    n/2 scan steps; the three external products share one fused contraction
    (digit rows and key rows concatenated variant-major).  Implemented but
    only *documented* in the reference (its loop is the standard per-bit one,
    src/bootstrapping.rs:90-105).
    """
    k1 = params.glwe_dimension + 1
    levels = params.pbs_decomposer.levels
    two_n = 2 * params.degree
    acc0_bkn, a_hat = _init_acc(params, approx_ct, tv_encoded)
    acc0 = jnp.swapaxes(acc0_bkn, 0, 1)  # [k+1, B, N]
    a0 = a_hat[0::2]  # [n/2, B]
    a1 = a_hat[1::2]
    asum = jnp.mod(a0 + a1, two_n)

    def step(acc, xs):
        bk_i, e0, e1, es = xs  # bk_i u32[3R, k+1, N]
        digit_blocks = []
        for e in (es, e0, e1):  # order matches key triple (ss', s(1-s'), (1-s)s')
            rot = monomial_mul(acc, e[None, :]) - acc  # (X^e - 1) acc
            digs = decompose_signed_planes(rot, params.pbs_decomposer)
            digit_blocks.append(digs.reshape((levels * k1,) + digs.shape[2:]))
        digits = jnp.concatenate(digit_blocks, axis=0)  # [3R, B, N]
        raw = ep_contract_pallas_rbn(digits, bk_i, interpret=interpret)
        return acc + ep_combine_planes(raw), None

    acc, _ = lax.scan(step, acc0, (bk_bmmp_lm, a0, a1, asum))
    return jnp.swapaxes(acc, 0, 1)


def blind_rotate(params: TfheParams, approx_ct, server_key, tv_encoded,
                 impl: str = "auto") -> jnp.ndarray:
    """n-step CMUX loop (src/bootstrapping.rs:79-105); batched.

    approx_ct: u32[B, n+1] already mod-switched to 2N; tv_encoded: u32[N]
    (the *encoded* test vector, src/bootstrapping.rs:82-86).
    """
    impl = resolve_impl(impl)
    if impl in _LATENCY_IMPLS:
        # validate up front (ADVICE r4): the latency kernels are B-capped by
        # design; big batches belong on the throughput kernels, not chunked
        # through a kernel whose whole point is the B <= 8 regime
        from tfhe_tpu.ops.pallas import latency_kernel as latk

        cap = (latk.MAX_LATENCY_BATCH if impl.startswith("fusedl")
               else latk.MAX_LATENCY_BATCH_BMMP)
        if approx_ct.shape[0] > cap:
            raise ValueError(
                f"impl={impl!r} is the small-batch latency path (B <= {cap});"
                f" got B={approx_ct.shape[0]} — use a throughput impl"
                " ('fused'/'fusedb'/'pallas') for large batches")
    # the whole-scan kernels keep the batch VMEM-resident; chunk bigger
    # batches into independent pallas_calls (exact: samples are independent).
    # fusedp's parity digit scratch halves its per-call budget.
    max_b = 2048 if impl.startswith("fusedp") else (
        1536 if impl.startswith(("fusedw", "nttf")) else _FUSED_MAX_BATCH
    )
    if (impl.startswith(("fused", "nttf")) and impl not in _LATENCY_IMPLS
            and approx_ct.shape[0] > max_b):
        b = approx_ct.shape[0]
        cuts = list(range(0, b, max_b)) + [b]
        return jnp.concatenate(
            [
                blind_rotate(params, approx_ct[lo:hi], server_key, tv_encoded, impl)
                for lo, hi in zip(cuts[:-1], cuts[1:])
            ],
            axis=0,
        )
    if impl in ("fusedc", "fusedc3", "fusedc_interpret"):
        # column-split whole-scan kernel: bt=512 tiles balance the MXU's
        # weight-load latency (ops/pallas/blind_rotate_kernel.py:_kernel_cols)
        from tfhe_tpu.ops.pallas.blind_rotate_kernel import blind_rotate_fused_cols

        acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
        return blind_rotate_fused_cols(
            params, acc0, server_key.bk_u32, a_hat,
            interpret=(impl == "fusedc_interpret"),
            key_limbs=3 if impl == "fusedc3" else 4,
        )
    if impl in ("fusedw", "fusedwb", "fusedw_interpret", "fusedwb_interpret"):
        # wide-dot + software-pipelined whole-scan kernel: column-ordered wide
        # dots let each poly's next-step digit pipeline overlap the remaining
        # columns' MXU work (ops/pallas/blind_rotate_kernel.py)
        from tfhe_tpu.ops.pallas.blind_rotate_kernel import (
            blind_rotate_fused_wide_pipe,
        )

        acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
        return blind_rotate_fused_wide_pipe(
            params, acc0, server_key.bk_u32, a_hat,
            interpret=impl.endswith("_interpret"),
            balanced=impl.startswith("fusedwb"),
        )
    if impl in ("fusedp", "fusedp3", "fusedp_interpret"):
        # software-pipelined whole-scan kernel: step s+1's digit pipeline
        # (VPU) overlaps step s's contraction (MXU) via a parity
        # double-buffered digit scratch (ops/pallas/blind_rotate_kernel.py)
        from tfhe_tpu.ops.pallas.blind_rotate_kernel import blind_rotate_fused_pipe

        acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
        return blind_rotate_fused_pipe(
            params, acc0, server_key.bk_u32, a_hat,
            interpret=(impl == "fusedp_interpret"),
            key_limbs=3 if impl == "fusedp3" else 4,
        )
    if impl in ("fused", "fused3", "fused_interpret", "fusedb", "fusedb3",
                "fusedb_interpret"):
        # whole-scan Pallas kernel: acc VMEM-resident for all n steps, BK
        # streamed per step (ops/pallas/blind_rotate_kernel.py).  ``fused3``
        # is the truncated-key approximate mode (25% less MXU work; see the
        # kernel docstring for the noise argument).  ``fusedb`` swaps in the
        # closed-form balanced decomposition — exact mod-2^32, no carry
        # chain, digit convention differs from the reference trace
        # (DIVERGENCES.md).  ``fusedb3`` combines both (fastest, approximate).
        from tfhe_tpu.ops.pallas.blind_rotate_kernel import blind_rotate_fused

        acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
        return blind_rotate_fused(
            params, acc0, server_key.bk_u32, a_hat,
            interpret=impl.endswith("_interpret"),
            key_limbs=3 if impl in ("fused3", "fusedb3") else 4,
            balanced=impl.startswith("fusedb"),
        )
    if impl in ("bmmp", "bmmp_interpret"):
        assert server_key.bk_bmmp_lm is not None, "keygen(..., bmmp=True) required"
        return _blind_rotate_bmmp(
            params, approx_ct, server_key.bk_bmmp_lm, tv_encoded,
            interpret=(impl == "bmmp_interpret"),
        )
    if impl in ("fusedl", "fusedl_interpret"):
        # latency path (B <= 8): digit-side circulant expansion (packed
        # rolls + bitcast) removes the B-independent key-expansion VPU cost
        # that bounds B=1 latency (ops/pallas/latency_kernel.py)
        from tfhe_tpu.ops.pallas.latency_kernel import (
            bk_latency_operand, blind_rotate_latency,
        )

        bk_lat = server_key.bk_lat  # cached by keys.with_latency_key
        if bk_lat is None:
            bk_lat = bk_latency_operand(server_key.bk_u32)
        acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
        return blind_rotate_latency(
            params, acc0, bk_lat, a_hat[:, None, :],
            interpret=(impl == "fusedl_interpret"),
        )
    if impl in ("bmmpl", "bmmpl_interpret"):
        # BMMP halved-depth latency path (B <= 4): n/2 steps, three
        # (X^e - 1)acc diffs per step against the keygen(bmmp=True) triples
        from tfhe_tpu.ops.pallas.latency_kernel import (
            bk_latency_operand_bmmp, blind_rotate_latency,
        )

        assert server_key.bk_bmmp_lm is not None, "keygen(..., bmmp=True) required"
        bk_lat = server_key.bk_bmmp_lat  # cached by keys.with_latency_key
        if bk_lat is None:
            bk_lat = bk_latency_operand_bmmp(server_key.bk_bmmp_lm, params)
        acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
        two_n = 2 * params.degree
        a0, a1 = a_hat[0::2], a_hat[1::2]
        a_v = jnp.stack([jnp.mod(a0 + a1, two_n), a0, a1], axis=1)
        return blind_rotate_latency(
            params, acc0, bk_lat, a_v,
            interpret=(impl == "bmmpl_interpret"),
        )
    if impl in ("nttf", "nttf_interpret"):
        # fused whole-scan block-NTT kernel (ops/pallas/ntt_kernel.py):
        # acc VMEM-resident, key streamed per step in NTT domain, dense
        # fwd/INTT transforms + per-bin merged dots.  Bit-exact vs 'ntt'.
        from tfhe_tpu.ops.ntt import ntt_key_lhs_form
        from tfhe_tpu.ops.pallas.ntt_kernel import blind_rotate_nttf

        bk_lhs = server_key.bk_ntt_lhs  # cached by keys.with_ntt_lhs_key
        if bk_lhs is None:
            # compat fallback: derive in-call (a full-key HBM transpose per
            # gate call — fine at N=512, fatal at N >= 2048)
            assert server_key.bk_ntt is not None, (
                "keys.with_ntt_lhs_key(server_key) (or with_ntt_key) required")
            bk_lhs = ntt_key_lhs_form(server_key.bk_ntt)
        acc0, a_hat = _init_acc(params, approx_ct, tv_encoded)
        return blind_rotate_nttf(
            params, acc0, bk_lhs, a_hat,
            interpret=(impl == "nttf_interpret"),
        )
    if impl == "ntt":
        assert server_key.bk_ntt is not None, "keys.with_ntt_key(server_key) required"
        return _blind_rotate_ntt(params, approx_ct, server_key.bk_ntt, tv_encoded)
    if impl == "ntts":
        # streaming NTT: per-step key transform inside the scan; no
        # precomputed NTT key needed (required at N >= 2048 where the
        # resident key would exceed HBM)
        return _blind_rotate_ntt(
            params, approx_ct, server_key.bk_u32, tv_encoded, stream=True
        )
    if impl == "pallas":
        return _blind_rotate_pallas(params, approx_ct, server_key.bk_lm, tv_encoded)
    if impl == "pallas_interpret":
        return _blind_rotate_pallas(
            params, approx_ct, server_key.bk_lm, tv_encoded, interpret=True
        )
    bk = server_key.bk_conv if impl == "conv" else server_key.bk_u32
    return _blind_rotate_xla(params, approx_ct, bk, tv_encoded, impl)


def pbs(params: TfheParams, ct, server_key, tv_encoded, impl: str = "auto"):
    """Full programmable bootstrap (src/bootstrapping.rs:58-120); batched.

    ct: u32[B, n+1]; server_key: models.keys.ServerKey; tv_encoded: u32[N].
    """
    from tfhe_tpu.utils.profiling import scope

    with scope("pbs.mod_switch"):
        approx = switch_modulus(u32(ct), params.log_q, params.log_degree + 1)
    with scope("pbs.blind_rotate"):
        acc = blind_rotate(params, approx, server_key, u32(tv_encoded), impl=impl)
    with scope("pbs.sample_extract"):
        extracted = sample_extract0(acc)
    from_n = params.glwe_dimension * params.degree
    with scope("pbs.key_switch"):
        return mks.key_switch(
            extracted, from_n, params.ks_decomposer, server_key.ksk_mat
        )
