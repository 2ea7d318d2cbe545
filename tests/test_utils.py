"""Serialization roundtrips and noise metering."""

import numpy as np
import jax
import pytest

import tfhe_tpu as tfhe
from tfhe_tpu.utils import noise as unoise
from tfhe_tpu.utils import serialization as ser
from tfhe_tpu.params import get_params

TEST = get_params("test_insecure")


@pytest.fixture(scope="module")
def keys():
    return tfhe.keygen(TEST, jax.random.key(5))


class TestSerialization:
    def test_params_json_roundtrip(self):
        s = ser.params_to_json(TEST)
        assert ser.params_from_json(s) == TEST

    def test_client_key_roundtrip(self, keys, tmp_path):
        ck, _ = keys
        p = tmp_path / "ck.npz"
        ser.save_client_key(p, ck)
        back = ser.load_client_key(p)
        assert np.array_equal(np.asarray(back.lwe_sk), np.asarray(ck.lwe_sk))
        assert np.array_equal(np.asarray(back.glwe_sk), np.asarray(ck.glwe_sk))
        assert back.params == TEST

    def test_server_key_roundtrip_rebuilds_layouts(self, keys, tmp_path):
        _, sk = keys
        p = tmp_path / "sk.npz"
        ser.save_server_key(p, sk)
        back = ser.load_server_key(p)
        assert np.array_equal(np.asarray(back.bk_u32), np.asarray(sk.bk_u32))
        assert np.array_equal(np.asarray(back.bk_conv), np.asarray(sk.bk_conv))
        assert np.array_equal(np.asarray(back.ksk_mat), np.asarray(sk.ksk_mat))

    def test_loaded_server_key_still_computes(self, keys, tmp_path):
        ck, sk = keys
        p = tmp_path / "sk.npz"
        ser.save_server_key(p, sk)
        back = ser.load_server_key(p)
        bits = np.array([0, 1, 1, 0], dtype=np.uint32)
        out = tfhe.gates.nand(back, tfhe.encrypt(ck, bits, key=1), tfhe.encrypt(ck, bits, key=2))
        assert np.array_equal(np.asarray(tfhe.decrypt(ck, out)), 1 - (bits & bits))

    def test_server_key_bmmp_roundtrip(self, tmp_path):
        """A saved BMMP server key must stay a BMMP key (regression: the
        first serializer silently dropped bk_bmmp_lm)."""
        ck, sk = tfhe.keygen(TEST, jax.random.key(6), bmmp=True)
        p = tmp_path / "sk_bmmp.npz"
        ser.save_server_key(p, sk)
        back = ser.load_server_key(p)
        assert back.bk_bmmp_lm is not None
        assert np.array_equal(np.asarray(back.bk_bmmp_lm), np.asarray(sk.bk_bmmp_lm))
        bits = np.array([0, 1], dtype=np.uint32)
        out = tfhe.gates.gate(back, "nand", tfhe.encrypt(ck, bits, key=3),
                              tfhe.encrypt(ck, bits, key=4), impl="bmmp_interpret")
        assert np.array_equal(np.asarray(tfhe.decrypt(ck, out)), 1 - (bits & bits))

    def test_ciphertext_roundtrip(self, keys, tmp_path):
        ck, _ = keys
        cts = tfhe.encrypt(ck, np.array([1, 2, 3], np.uint32), key=9)
        p = tmp_path / "ct.npz"
        ser.save_ciphertexts(p, cts, TEST)
        back, params = ser.load_ciphertexts(p)
        assert params == TEST
        assert np.array_equal(np.asarray(back), np.asarray(cts))


class TestNoise:
    def test_fresh_ciphertext_margin(self, keys):
        ck, _ = keys
        msgs = np.array([0, 1, 2, 3] * 8, dtype=np.uint32)
        cts = tfhe.encrypt(ck, msgs, key=11)
        rep = unoise.measure(ck, cts, msgs)
        assert rep.failures == 0
        assert rep.max_abs_over_delta < 0.01  # fresh noise is tiny at these params

    def test_post_pbs_margin(self, keys):
        ck, sk = keys
        msgs = np.array([0, 1, 1, 0, 1, 0, 0, 1], dtype=np.uint32)
        out = tfhe.bootstrap_identity(sk, tfhe.encrypt(ck, msgs, key=12))
        rep = unoise.measure(ck, out, msgs)
        assert rep.failures == 0
        assert rep.max_abs_over_delta < 0.5

    def test_detects_corruption(self, keys):
        ck, _ = keys
        msgs = np.array([1, 1], dtype=np.uint32)
        cts = np.asarray(tfhe.encrypt(ck, msgs, key=13)).copy()
        cts[0, -1] += np.uint32(TEST.delta)  # push past the decode threshold
        rep = unoise.measure(ck, cts, msgs)
        assert rep.failures == 1


class TestKernelTuning:
    """_tuning() calibration (ADVICE r3: no untested per-generation rows)."""

    def test_off_tpu_is_conservative(self):
        from tfhe_tpu.ops.pallas import blind_rotate_kernel as brk

        brk._tuning.cache_clear()
        assert brk._tuning() == brk._DEFAULT_TUNING
        brk._tuning.cache_clear()

    def test_measured_generation_uses_table(self, monkeypatch):
        from tfhe_tpu.ops.pallas import blind_rotate_kernel as brk

        class Dev:
            device_kind = "TPU v5 lite"

        monkeypatch.setattr(brk.jax, "devices", lambda: [Dev()])
        monkeypatch.setattr(brk.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            brk, "_probe_vmem_budget",
            lambda b: (_ for _ in ()).throw(AssertionError("probe must not run")),
        )
        brk._tuning.cache_clear()
        assert brk._tuning() == brk._GEN_TUNING["v5 lite"]
        brk._tuning.cache_clear()

    def test_unknown_generation_probes(self, monkeypatch):
        from tfhe_tpu.ops.pallas import blind_rotate_kernel as brk

        class Dev:
            device_kind = "TPU v99x"

        monkeypatch.setattr(brk.jax, "devices", lambda: [Dev()])
        monkeypatch.setattr(brk.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(brk, "_probe_vmem_budget", lambda b: False)
        brk._tuning.cache_clear()
        assert brk._tuning() == brk._DEFAULT_TUNING
        brk._tuning.cache_clear()
        monkeypatch.setattr(brk, "_probe_vmem_budget", lambda b: True)
        assert brk._tuning() == brk._AGGRESSIVE_TUNING
        brk._tuning.cache_clear()
