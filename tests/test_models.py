"""Models layer vs golden: bit-exact u32 equality under shared randomness,
then end-to-end gate correctness through the public API."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tfhe_tpu as tfhe
import tfhe_tpu.golden.model as g
from tfhe_tpu.models import bootstrap as mboot
from tfhe_tpu.models import ggsw as mggsw
from tfhe_tpu.models import glwe as mglwe
from tfhe_tpu.models import keyswitch as mks
from tfhe_tpu.models import lwe as mlwe
from tfhe_tpu.models import test_vector as mtv
from tfhe_tpu.models.keys import make_server_key
from tfhe_tpu.params import get_params

TEST = get_params("test_insecure")


def rnd_u32(rng, shape):
    return rng.integers(0, 1 << 32, size=shape, dtype=np.uint32)


def gaussian_u32(rng, std, shape):
    return g.f64_to_torus(rng.normal(0.0, std, size=shape))


@pytest.fixture(scope="module")
def shared():
    """Keys + keygen randomness shared between golden and JAX paths."""
    rng = np.random.default_rng(2024)
    p = TEST
    k, N, n = p.glwe_dimension, p.degree, p.lwe_dimension
    rows = (k + 1) * p.pbs_decomposer.levels
    kn = k * N
    d = dict(
        lwe_sk=rng.integers(0, 2, size=n, dtype=np.uint32),
        glwe_sk=rng.integers(0, 2, size=(k, N), dtype=np.uint32),
        bk_a=rnd_u32(rng, (n, rows, k, N)),
        bk_e=gaussian_u32(rng, p.glwe_std_dev, (n, rows, N)),
        ksk_a=rnd_u32(rng, (kn * p.ks_decomposer.levels, n)),
        ksk_e=gaussian_u32(rng, p.lwe_std_dev, (kn * p.ks_decomposer.levels,)),
    )
    bk_g, ksk_g = g.bootstrapping_key_gen(
        d["lwe_sk"], d["glwe_sk"], p, d["bk_a"], d["bk_e"], d["ksk_a"], d["ksk_e"]
    )
    server = make_server_key(
        p, d["lwe_sk"], d["glwe_sk"], d["bk_a"], d["bk_e"], d["ksk_a"], d["ksk_e"]
    )
    return d, bk_g, ksk_g, server, rng


class TestBitExactKeys:
    def test_bootstrapping_key(self, shared):
        d, bk_g, ksk_g, server, _ = shared
        assert np.array_equal(np.asarray(server.bk_u32), bk_g)

    def test_key_switching_key(self, shared):
        d, bk_g, ksk_g, server, _ = shared
        assert np.array_equal(np.asarray(server.ksk_u32), ksk_g)


class TestBitExactCiphertexts:
    def test_lwe_encrypt(self, shared):
        d, *_ = shared
        rng = np.random.default_rng(7)
        p = TEST
        a = rnd_u32(rng, (5, p.lwe_dimension))
        e = gaussian_u32(rng, p.lwe_std_dev, (5,))
        pt = g.lwe_encode(np.arange(5, dtype=np.uint32) % 4, p)
        ours = np.asarray(mlwe.encrypt(d["lwe_sk"], pt, a, e))
        for i in range(5):
            assert np.array_equal(ours[i], g.encrypt_lwe(d["lwe_sk"], pt[i], a[i], e[i]))
        # decrypt matches too
        dec = np.asarray(mlwe.decrypt(d["lwe_sk"], ours))
        for i in range(5):
            assert dec[i] == g.decrypt_lwe(d["lwe_sk"], ours[i])

    def test_glwe_encrypt_decrypt(self, shared):
        d, *_ = shared
        rng = np.random.default_rng(8)
        p = TEST
        gp = p.glwe_params()
        k, N = p.glwe_dimension, p.degree
        a = rnd_u32(rng, (k, N))
        e = gaussian_u32(rng, gp.std_dev, (N,))
        msg = rng.integers(0, 4, size=N, dtype=np.uint32)
        pt = g.glwe_encode(msg, gp)
        sk_t = mglwe.sk_toeplitz(d["glwe_sk"])
        ours = np.asarray(mglwe.encrypt(sk_t, pt, a, e))
        want = g.encrypt_glwe(d["glwe_sk"], pt, a, e)
        assert np.array_equal(ours, want)
        assert np.array_equal(
            np.asarray(mglwe.decrypt(sk_t, ours)), g.decrypt_glwe(d["glwe_sk"], want)
        )

    def test_glwe_monomial_and_decompose(self, shared):
        d, *_ = shared
        rng = np.random.default_rng(9)
        p = TEST
        ct = rnd_u32(rng, (p.glwe_dimension + 1, p.degree))
        for exp in (-700, -1, 0, 3, 511, 512, 1023):
            ours = np.asarray(mglwe.mul_monomial(ct, exp))
            want = g.glwe_mul_monomial(ct, exp)
            assert np.array_equal(ours, want), exp
        dec_ours = np.asarray(mglwe.decompose(ct, p.pbs_decomposer))
        dec_want = g.digits_to_signed(
            g.decompose_glwe(ct, p.pbs_decomposer), p.pbs_decomposer
        )
        assert np.array_equal(dec_ours, dec_want.astype(np.int8))


class TestBitExactOps:
    def test_external_product(self, shared):
        d, bk_g, _, server, _ = shared
        rng = np.random.default_rng(10)
        p = TEST
        ct = rnd_u32(rng, (p.glwe_dimension + 1, p.degree))
        want = g.external_product(bk_g[1], ct, p)
        for impl in ("conv", "matmul"):
            ours = np.asarray(
                mggsw.external_product(server.bk_u32[1], ct[None], p, impl=impl)
            )[0]
            assert np.array_equal(ours, want), impl

    def test_cmux(self, shared):
        d, bk_g, _, server, _ = shared
        rng = np.random.default_rng(11)
        p = TEST
        c0 = rnd_u32(rng, (p.glwe_dimension + 1, p.degree))
        c1 = rnd_u32(rng, (p.glwe_dimension + 1, p.degree))
        want = g.cmux(bk_g[2], c0, c1, p)
        ours = np.asarray(mggsw.cmux(server.bk_u32[2], c0[None], c1[None], p))[0]
        assert np.array_equal(ours, want)

    def test_key_switch(self, shared):
        d, _, ksk_g, server, _ = shared
        rng = np.random.default_rng(12)
        p = TEST
        kn = p.glwe_dimension * p.degree
        ct = rnd_u32(rng, (3, kn + 1))
        ours = np.asarray(
            mks.key_switch(ct, kn, p.ks_decomposer, server.ksk_mat)
        )
        for i in range(3):
            want = g.key_switch_lwe(ct[i], kn, p.lwe_dimension, p.ks_decomposer, ksk_g)
            assert np.array_equal(ours[i], want)

    def test_sample_extract(self, shared):
        rng = np.random.default_rng(13)
        p = TEST
        ct = rnd_u32(rng, (2, p.glwe_dimension + 1, p.degree))
        ours = np.asarray(mboot.sample_extract0(ct))
        for i in range(2):
            want = g.sample_extract(ct[i], p.glwe_params(), 0)
            assert np.array_equal(ours[i], want)


class TestBitExactBootstrap:
    @pytest.mark.parametrize("impl", ["conv", "matmul"])
    def test_full_pbs_bit_exact(self, shared, impl):
        """The keystone test: the entire PBS pipeline produces bit-identical
        ciphertexts to the golden model."""
        d, bk_g, ksk_g, server, _ = shared
        rng = np.random.default_rng(14)
        p = TEST
        tv_clear = g.construct_identity_test_vector(p)
        tv_enc = jnp.asarray(mtv.identity_test_vector(p))
        for m in range(4):
            a = rnd_u32(rng, (p.lwe_dimension,))
            e = gaussian_u32(rng, p.lwe_std_dev, ())
            ct = g.encrypt_lwe(d["lwe_sk"], g.lwe_encode(m, p), a, e)
            want = g.bootstrap(ct, bk_g, ksk_g, tv_clear, p)
            ours = np.asarray(
                mboot.pbs(p, ct[None], server, tv_enc, impl=impl)
            )[0]
            assert np.array_equal(ours, want), (impl, m)

    def test_full_pbs_bit_exact_ntt(self, shared):
        """Block-NTT backend (ops/ntt.py, impl='ntt') end-to-end: the whole
        PBS with the NTT-domain-resident key is bit-identical to golden."""
        from tfhe_tpu.models.keys import with_ntt_key

        d, bk_g, ksk_g, server, _ = shared
        rng = np.random.default_rng(21)
        p = TEST
        server_ntt = with_ntt_key(server)
        tv_clear = g.construct_identity_test_vector(p)
        tv_enc = jnp.asarray(mtv.identity_test_vector(p))
        a = rnd_u32(rng, (2, p.lwe_dimension))
        e = gaussian_u32(rng, p.lwe_std_dev, (2,))
        cts = np.stack([
            g.encrypt_lwe(d["lwe_sk"], g.lwe_encode(m, p), a[m], e[m])
            for m in range(2)
        ])
        want = np.stack([g.bootstrap(cts[i], bk_g, ksk_g, tv_clear, p)
                         for i in range(2)])
        ours = np.asarray(mboot.pbs(p, cts, server_ntt, tv_enc, impl="ntt"))
        assert np.array_equal(ours, want)

    def test_full_pbs_bit_exact_ntt_streaming(self, shared):
        """Streaming NTT backend (impl='ntts'): per-step key transform inside
        the scan, no resident NTT key — bit-identical to golden.  This is the
        only runnable NTT mode at N >= 2048, where the resident key would
        exceed HBM (models/keys.py:with_ntt_key guard)."""
        d, bk_g, ksk_g, server, _ = shared
        rng = np.random.default_rng(27)
        p = TEST
        tv_clear = g.construct_identity_test_vector(p)
        tv_enc = jnp.asarray(mtv.identity_test_vector(p))
        a = rnd_u32(rng, (2, p.lwe_dimension))
        e = gaussian_u32(rng, p.lwe_std_dev, (2,))
        cts = np.stack([
            g.encrypt_lwe(d["lwe_sk"], g.lwe_encode(m, p), a[m], e[m])
            for m in range(2)
        ])
        want = np.stack([g.bootstrap(cts[i], bk_g, ksk_g, tv_clear, p)
                         for i in range(2)])
        ours = np.asarray(mboot.pbs(p, cts, server, tv_enc, impl="ntts"))
        assert np.array_equal(ours, want)

    def test_full_pbs_bit_exact_nttf_interpret(self, shared):
        """Fused whole-scan block-NTT kernel (ops/pallas/ntt_kernel.py,
        impl='nttf') in interpret mode: bit-identical to golden (and hence to
        impl='ntt' — the VERDICT r3 acceptance bar)."""
        from tfhe_tpu.models.keys import with_ntt_key

        d, bk_g, ksk_g, server, _ = shared
        rng = np.random.default_rng(33)
        p = TEST
        server_ntt = with_ntt_key(server)
        tv_clear = g.construct_identity_test_vector(p)
        tv_enc = jnp.asarray(mtv.identity_test_vector(p))
        a = rnd_u32(rng, (2, p.lwe_dimension))
        e = gaussian_u32(rng, p.lwe_std_dev, (2,))
        cts = np.stack([
            g.encrypt_lwe(d["lwe_sk"], g.lwe_encode(m, p), a[m], e[m])
            for m in range(2)
        ])
        want = np.stack([g.bootstrap(cts[i], bk_g, ksk_g, tv_clear, p)
                         for i in range(2)])
        ours = np.asarray(
            mboot.pbs(p, cts, server_ntt, tv_enc, impl="nttf_interpret")
        )
        assert np.array_equal(ours, want)
        # the cached lhs-only key form (keys.with_ntt_lhs_key, drop_rhs=True:
        # what bench.py and the large-degree sweep serve from) is
        # bit-identical through the same kernel, with NO rhs key resident
        from tfhe_tpu.models.keys import with_ntt_lhs_key

        server_lhs = with_ntt_lhs_key(server, drop_rhs=True)
        assert server_lhs.bk_ntt is None
        ours_lhs = np.asarray(
            mboot.pbs(p, cts, server_lhs, tv_enc, impl="nttf_interpret")
        )
        assert np.array_equal(ours_lhs, want)

    def test_fused_wide_equals_narrow_nano(self):
        """The wide-dot fused kernel (lane-concatenated digit planes, single
        [R_d*N, CL*N] Toeplitz scratch, aliased acc) is bit-identical to the
        narrow per-plane kernel — random-tensor harness (wrapping-u32
        exactness makes random keys as good as real ones)."""
        from tfhe_tpu.ops.pallas.blind_rotate_kernel import blind_rotate_fused

        p = get_params("nano")
        n, k1, N = p.lwe_dimension, p.glwe_dimension + 1, p.degree
        rows = k1 * p.pbs_decomposer.levels
        key = jax.random.key(7)
        ka, kb, kc = jax.random.split(key, 3)
        bk = jax.random.bits(ka, (n, rows, k1, N), jnp.uint32)
        acc0 = jax.random.bits(kb, (8, k1, N), jnp.uint32)
        a_hat = jax.random.randint(kc, (n, 8), 0, 2 * N, jnp.int32)
        ref = blind_rotate_fused(p, acc0, bk, a_hat, interpret=True,
                                 wide=False, batch_tile=4)
        for bt in (4, 8):
            got = blind_rotate_fused(p, acc0, bk, a_hat, interpret=True,
                                     wide=True, batch_tile=bt)
            assert bool(jnp.all(ref == got)), bt

    def test_fused_batch_chunking_exact(self, monkeypatch):
        """Batches above _FUSED_MAX_BATCH split into independent pallas_calls
        with identical results (models/bootstrap.py:blind_rotate)."""
        from tfhe_tpu.models import keys as mkeys
        from tfhe_tpu.ops.torus import switch_modulus

        p = get_params("nano")
        ck, sk = jax.jit(lambda s: mkeys.keygen(p, s))(jax.random.key(3))
        tv = jnp.asarray(mtv.identity_test_vector(p))
        cts = tfhe.encrypt(ck, np.arange(6, dtype=np.uint32) % 4, key=9)
        approx = switch_modulus(cts, p.log_q, p.log_degree + 1)
        whole = mboot.blind_rotate(p, approx, sk, tv, impl="fused_interpret")
        monkeypatch.setattr(mboot, "_FUSED_MAX_BATCH", 4)
        chunked = mboot.blind_rotate(p, approx, sk, tv, impl="fused_interpret")
        assert np.array_equal(np.asarray(whole), np.asarray(chunked))

    def test_full_pbs_bit_exact_fusedb_interpret(self, shared):
        """Balanced-digit whole-scan kernel (impl='fusedb', interpret mode):
        bit-identical to an XLA scan running the SAME closed-form balanced
        decomposition (ops/decomposer.py:decompose_balanced_planes), and the
        full PBS output decrypts/decodes to the same messages as golden
        (different exact digit convention, identical reconstruction —
        see DIVERGENCES.md)."""
        from tfhe_tpu.ops.decomposer import decompose_balanced_planes
        from tfhe_tpu.ops.poly import ep_combine, ep_contract_matmul
        from tfhe_tpu.ops.torus import switch_modulus

        d, bk_g, ksk_g, server, _ = shared
        rng = np.random.default_rng(31)
        p = TEST
        k1 = p.glwe_dimension + 1
        levels = p.pbs_decomposer.levels
        tv_clear = g.construct_identity_test_vector(p)
        tv_enc = jnp.asarray(mtv.identity_test_vector(p))
        a = rnd_u32(rng, (2, p.lwe_dimension))
        e = gaussian_u32(rng, p.lwe_std_dev, (2,))
        msgs = [1, 3]
        cts = np.stack([
            g.encrypt_lwe(d["lwe_sk"], g.lwe_encode(m, p), a[i], e[i])
            for i, m in enumerate(msgs)
        ])
        approx = switch_modulus(jnp.asarray(cts), p.log_q, p.log_degree + 1)
        # XLA balanced scan (matmul contraction): the independent oracle
        acc, a_hat = mboot._init_acc(p, approx, tv_enc)
        for i in range(p.lwe_dimension):
            rot = mglwe.mul_monomial(acc, a_hat[i])
            digs = decompose_balanced_planes(rot - acc, p.pbs_decomposer)
            digs = jnp.moveaxis(digs, 0, -2)  # [B, k+1, levels, N]
            digs = digs.reshape(digs.shape[0], k1 * levels, p.degree)
            raw = ep_contract_matmul(digs, server.bk_u32[i])
            acc = acc + ep_combine(raw, k1)
        want_rot = np.asarray(acc)
        ours_rot = np.asarray(mboot.blind_rotate(
            p, approx, server, tv_enc, impl="fusedb_interpret"))
        assert np.array_equal(ours_rot, want_rot)
        # full PBS decodes identically to the golden (reference-convention)
        # bootstrap, though the ciphertext bits differ
        ref = np.stack([g.bootstrap(cts[i], bk_g, ksk_g, tv_clear, p)
                        for i in range(2)])
        ours = np.asarray(
            mboot.pbs(p, cts, server, tv_enc, impl="fusedb_interpret"))
        for i in range(2):
            got = g.lwe_decode(g.decrypt_lwe(d["lwe_sk"], ours[i]), p)
            want = g.lwe_decode(g.decrypt_lwe(d["lwe_sk"], ref[i]), p)
            assert got == want, (i, got, want)

    def test_full_pbs_bit_exact_pallas_interpret(self, shared):
        """Pallas backend (interpret mode on CPU) is bit-identical too —
        covers the level-major digit rows + bk_lm permutation + VMEM-layout
        kernel against the same golden pipeline."""
        d, bk_g, ksk_g, server, _ = shared
        rng = np.random.default_rng(15)
        p = TEST
        tv_clear = g.construct_identity_test_vector(p)
        tv_enc = jnp.asarray(mtv.identity_test_vector(p))
        a = rnd_u32(rng, (p.lwe_dimension,))
        e = gaussian_u32(rng, p.lwe_std_dev, ())
        ct = g.encrypt_lwe(d["lwe_sk"], g.lwe_encode(2, p), a, e)
        want = g.bootstrap(ct, bk_g, ksk_g, tv_clear, p)
        ours = np.asarray(
            mboot.pbs(p, ct[None], server, tv_enc, impl="pallas_interpret")
        )[0]
        assert np.array_equal(ours, want)


NANO = get_params("nano")


class TestKernelBitExactNano:
    """Whole-scan kernel families, bit-exact at nano shapes (N=64, n=4).

    The full-size (test_insecure, N=512) interpret runs of these kernels cost
    43-500 s EACH on CPU, which kept the driver from ever seeing the whole
    suite (VERDICT r4 item 2).  The kernels' digit pipelines and contraction
    orders are degree-independent, so nano pins the same semantics in
    seconds against the conv scan (itself golden-pinned bit-exact at
    test_insecure above).  Full-size interpret representatives that remain
    at test_insecure: fusedb (the shared ``_kernel`` body + full-PBS golden
    decode), pallas (per-step kernel), nttf (NTT tier); additionally every
    family is hardware-bit-exact in the 0-gate-error bench artifacts
    (ARTIFACTS/*_r4.json, latency_r5.json)."""

    @pytest.fixture(scope="class")
    def env(self):
        from tfhe_tpu.models.keys import with_latency_key

        p = NANO
        ck, sk = tfhe.keygen(p, jax.random.key(5), bmmp=True)
        sk = with_latency_key(sk)
        rng = np.random.default_rng(77)
        approx = jnp.asarray(rng.integers(
            0, 2 * p.degree, size=(8, p.lwe_dimension + 1), dtype=np.uint32))
        tv = jnp.asarray(rng.integers(0, 1 << 32, size=(p.degree,),
                                      dtype=np.uint32))
        refs = {
            "conv": np.asarray(
                mboot.blind_rotate(p, approx, sk, tv, impl="conv")),
            "fusedb_interpret": np.asarray(mboot.blind_rotate(
                p, approx, sk, tv, impl="fusedb_interpret")),
            "bmmp_interpret": np.asarray(mboot.blind_rotate(
                p, approx[:4], sk, tv, impl="bmmp_interpret")),
        }
        return p, sk, approx, tv, refs

    @pytest.mark.parametrize("impl,ref,batch", [
        ("fused_interpret", "conv", 8),    # carry-chain digits in-kernel
        ("fusedp_interpret", "conv", 8),   # parity double-buffered digits
        ("fusedc_interpret", "conv", 8),   # column-split + digit scratch
        ("fusedw_interpret", "conv", 8),   # wide-dot pipelined
        ("fusedl_interpret", "conv", 8),   # bitcast digit-circulant latency
        ("fusedl_interpret", "conv", 3),   # latency kernel, odd batch
        ("fusedwb_interpret", "fusedb_interpret", 8),  # balanced wide
        ("bmmpl_interpret", "bmmp_interpret", 4),  # BMMP latency kernel
        ("bmmpl_interpret", "bmmp_interpret", 3),  # odd batch
    ])
    def test_blind_rotate_matches(self, env, impl, ref, batch):
        p, sk, approx, tv, refs = env
        got = np.asarray(
            mboot.blind_rotate(p, approx[:batch], sk, tv, impl=impl))
        assert np.array_equal(got, refs[ref][:batch]), impl


class TestSampleExtractGeneral:
    def test_arbitrary_index_vs_golden(self, shared):
        rng = np.random.default_rng(17)
        p = TEST
        ct = rnd_u32(rng, (2, p.glwe_dimension + 1, p.degree))
        for idx in (0, 1, 17, p.degree // 2, p.degree - 1):
            ours = np.asarray(mboot.sample_extract(ct, idx))
            for i in range(2):
                want = g.sample_extract(ct[i], p.glwe_params(), idx)
                assert np.array_equal(ours[i], want), idx

    def test_batched_per_sample_indices(self, shared):
        rng = np.random.default_rng(18)
        p = TEST
        ct = rnd_u32(rng, (3, p.glwe_dimension + 1, p.degree))
        idxs = np.array([3, 500, 0], dtype=np.int32)
        ours = np.asarray(mboot.sample_extract(ct, idxs))
        for i in range(3):
            want = g.sample_extract(ct[i], p.glwe_params(), int(idxs[i]))
            assert np.array_equal(ours[i], want), i


class TestClearSimulationOracle:
    """Port of the reference's clear-simulation oracle
    (src/bootstrapping.rs:232-287): re-run the blind rotation in plaintext
    with the secret key (explicit mod-2N index tracking) and assert the
    homomorphic accumulator decrypts to exactly the predicted rotated test
    vector plus noise below Delta/2 — pinpointing sign/index bugs directly
    instead of as opaque decode failures."""

    @pytest.mark.parametrize("impl", ["conv", "matmul"])
    def test_blind_rotate_matches_clear_simulation(self, shared, impl):
        from tfhe_tpu.ops.torus import switch_modulus as jsm, u32 as ju32

        d, bk_g, ksk_g, server, _ = shared
        rng = np.random.default_rng(19)
        p = TEST
        tv_clear = g.construct_identity_test_vector(p)
        tv_enc = jnp.asarray(mtv.identity_test_vector(p))
        for m in range(1 << p.log_p):
            a = rnd_u32(rng, (p.lwe_dimension,))
            e = gaussian_u32(rng, p.lwe_std_dev, ())
            ct = g.encrypt_lwe(d["lwe_sk"], g.lwe_encode(m, p), a, e)
            predicted = g.blind_rotate_in_clear(ct, d["lwe_sk"], tv_clear, p)
            approx = np.asarray(jsm(ju32(ct[None]), p.log_q, p.log_degree + 1))
            acc = np.asarray(
                mboot.blind_rotate(p, approx, server, tv_enc, impl=impl)
            )[0]
            phase = g.decrypt_glwe(d["glwe_sk"], acc)
            diff = (phase - predicted).astype(np.int64)
            diff = np.where(diff >= 1 << 31, diff - (1 << 32), diff)
            assert np.abs(diff).max() < p.delta // 2, (impl, m)
            # and the predicted coefficient 0 decodes to the identity LUT value
            ext = g.sample_extract(acc, p.glwe_params(), 0)
            got = int(g.lwe_decode(g.decrypt_lwe(flat_sk(d), ext), p))
            pred = int(g.lwe_decode(predicted[0], p))
            assert got == pred, (impl, m)


def flat_sk(d):
    return g.flatten_glwe_sk(d["glwe_sk"])


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def jax_keys(self):
        return tfhe.keygen(TEST, jax.random.key(123))

    def test_encrypt_decrypt(self, jax_keys):
        ck, _ = jax_keys
        msgs = np.array([0, 1, 2, 3, 1, 0], dtype=np.uint32)
        cts = tfhe.encrypt(ck, msgs, key=5)
        assert np.array_equal(np.asarray(tfhe.decrypt(ck, cts)), msgs)

    @pytest.mark.parametrize("gate", ["and", "or", "xor", "nand", "nor", "xnor"])
    def test_gate_truth_table(self, jax_keys, gate):
        ck, sk = jax_keys
        lhs = np.array([0, 0, 1, 1], dtype=np.uint32)
        rhs = np.array([0, 1, 0, 1], dtype=np.uint32)
        c1 = tfhe.encrypt(ck, lhs, key=20)
        c0 = tfhe.encrypt(ck, rhs, key=21)
        out = tfhe.gates.gate(sk, gate, c0, c1)
        got = np.asarray(tfhe.decrypt(ck, out))
        want = np.array([mtv.GATE_FNS[gate](int(l), int(r)) for l, r in zip(lhs, rhs)])
        assert np.array_equal(got, want), gate

    def test_not_gate(self, jax_keys):
        ck, sk = jax_keys
        bits = np.array([0, 1, 1, 0], dtype=np.uint32)
        out = tfhe.gates.not_(sk, tfhe.encrypt(ck, bits, key=30))
        assert np.array_equal(np.asarray(tfhe.decrypt(ck, out)), 1 - bits)

    def test_mux(self, jax_keys):
        ck, sk = jax_keys
        sel = np.array([0, 0, 1, 1], dtype=np.uint32)
        a = np.array([0, 1, 0, 1], dtype=np.uint32)
        b = np.array([1, 0, 1, 0], dtype=np.uint32)
        out = tfhe.gates.mux(
            sk,
            tfhe.encrypt(ck, sel, key=31),
            tfhe.encrypt(ck, a, key=32),
            tfhe.encrypt(ck, b, key=33),
        )
        want = np.where(sel == 1, a, b)
        assert np.array_equal(np.asarray(tfhe.decrypt(ck, out)), want)

    def test_identity_bootstrap(self, jax_keys):
        ck, sk = jax_keys
        msgs = np.array([0, 1, 2, 3], dtype=np.uint32)
        out = tfhe.bootstrap_identity(sk, tfhe.encrypt(ck, msgs, key=40))
        assert np.array_equal(np.asarray(tfhe.decrypt(ck, out)), msgs)


class TestNegativePhaseWrap:
    """Regression: a negative blind-rotation index must extract the pre-negated
    top coefficient of the test vector and decode correctly mod 2^log_p
    (the padding-bit alias; src/test_vector.rs:54-64 + src/lwe.rs:105).
    This failed for NAND(0,0) with negative input noise before the decode-mask
    fix -- statistically ~50% of (0,0) gate evaluations."""

    def test_forced_negative_phase(self, shared):
        d, bk_g, ksk_g, server, _ = shared
        p = TEST
        # trivial LWE of value 0 with explicitly negative phase: b = -epsilon
        eps = np.uint32(1 << 20)  # well within half a block
        ct = np.zeros((p.lwe_dimension + 1,), dtype=np.uint32)
        ct[-1] = np.uint32(0) - eps
        tv = jnp.asarray(mtv.gate_test_vector(p, "nand"))
        out = np.asarray(mboot.pbs(p, ct[None], server, tv))[0]
        from tfhe_tpu.ops.torus import decode as t_decode

        got = int(t_decode(g.decrypt_lwe(d["lwe_sk"], out), p.log_q, p.log_p, p.padding_bits))
        assert got == 1  # NAND(0,0) = 1 even with negative phase

    def test_gate_00_both_noise_signs(self, shared):
        d, bk_g, ksk_g, server, _ = shared
        p = TEST
        tv = jnp.asarray(mtv.gate_test_vector(p, "nand"))
        for eps in (np.uint32(1 << 20), np.uint32(0) - np.uint32(1 << 20)):
            ct = np.zeros((p.lwe_dimension + 1,), dtype=np.uint32)
            ct[-1] = eps
            out = np.asarray(mboot.pbs(p, ct[None], server, tv))[0]
            from tfhe_tpu.ops.torus import decode as t_decode

            got = int(
                t_decode(g.decrypt_lwe(d["lwe_sk"], out), p.log_q, p.log_p, p.padding_bits)
            )
            assert got == 1, eps


class TestThreeInputGates:
    """3-input gates via 4c2+2c1+c0 (notes/Boolean Gates.md:7-11) on the
    log_p=3 profile, plus the generic LUT bootstrap."""

    @pytest.fixture(scope="class")
    def keys3(self):
        return tfhe.keygen(get_params("test_insecure_3in"), jax.random.key(321))

    @pytest.mark.parametrize("gate", ["mux", "maj", "and3", "xor3"])
    def test_gate3_truth_table(self, keys3, gate):
        ck, sk = keys3
        f = mtv.GATE3_FNS[gate]
        bits = np.array([[ (i>>2)&1, (i>>1)&1, i&1 ] for i in range(8)], np.uint32)
        c2 = tfhe.encrypt(ck, bits[:, 0], key=60)
        c1 = tfhe.encrypt(ck, bits[:, 1], key=61)
        c0 = tfhe.encrypt(ck, bits[:, 2], key=62)
        out = tfhe.gates.gate3(sk, gate, c2, c1, c0)
        got = np.asarray(tfhe.decrypt(ck, out))
        want = np.array([f(int(r[0]), int(r[1]), int(r[2])) for r in bits])
        assert np.array_equal(got, want), gate

    def test_apply_lut_generic(self, keys3):
        ck, sk = keys3
        lut = [3, 1, 4, 1, 5, 2, 6, 5]  # arbitrary function Z_8 -> Z_8... values < 8
        msgs = np.arange(8, dtype=np.uint32)
        cts = tfhe.encrypt(ck, msgs, key=63)
        out = tfhe.gates.apply_lut(sk, cts, lut)
        got = np.asarray(tfhe.decrypt(ck, out))
        assert np.array_equal(got, np.array(lut))


class TestBmmp:
    """BMMP halved-depth bootstrapping (notes/BMMP Bootstrapping.md:15-25) —
    documented in the reference but implemented only here."""

    @pytest.fixture(scope="class")
    def bmmp_keys(self):
        return tfhe.keygen(TEST, jax.random.key(777), bmmp=True)

    def test_key_shape(self, bmmp_keys):
        _, sk = bmmp_keys
        p = TEST
        rows = (p.glwe_dimension + 1) * p.pbs_decomposer.levels
        assert sk.bk_bmmp_lm.shape == (
            p.lwe_dimension // 2, 3 * rows, p.glwe_dimension + 1, p.degree
        )

    @pytest.mark.parametrize("gate", ["nand", "xor"])
    def test_gates_via_bmmp(self, bmmp_keys, gate):
        ck, sk = bmmp_keys
        lhs = np.array([0, 0, 1, 1], dtype=np.uint32)
        rhs = np.array([0, 1, 0, 1], dtype=np.uint32)
        c1 = tfhe.encrypt(ck, lhs, key=70)
        c0 = tfhe.encrypt(ck, rhs, key=71)
        out = tfhe.gates.gate(sk, gate, c0, c1, impl="bmmp_interpret")
        got = np.asarray(tfhe.decrypt(ck, out))
        want = np.array([mtv.GATE_FNS[gate](int(l), int(r)) for l, r in zip(lhs, rhs)])
        assert np.array_equal(got, want), gate

    def test_noise_margin(self, bmmp_keys):
        from tfhe_tpu.utils import noise as unoise

        ck, sk = bmmp_keys
        msgs = np.array([0, 1, 2, 3], dtype=np.uint32)
        out = tfhe.bootstrap_identity(sk, tfhe.encrypt(ck, msgs, key=72),
                                      impl="bmmp_interpret")
        rep = unoise.measure(ck, out, msgs)
        assert rep.failures == 0
        assert rep.max_abs_over_delta < 0.5
