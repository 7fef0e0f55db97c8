"""Fused Pallas fbank kernel: interpret-mode parity with the host oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.kernels.fbank_pallas import fbank_pallas
from speaker_diarization_tpu.ops import features as F


class TestPallasFbank:
    @pytest.mark.parametrize("n_samples", [64000, 16000, 7200])
    def test_matches_host_kaldi_fbank(self, n_samples):
        rng = np.random.default_rng(0)
        x = (0.2 * rng.standard_normal((2, n_samples))).astype(np.float32)
        ref = np.stack([F.kaldi_fbank(xi, dither=0.0, mean_norm=True) for xi in x])
        out = np.asarray(fbank_pallas(jnp.asarray(x), interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=5e-3)

    def test_matches_xla_path(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray((0.2 * rng.standard_normal((1, 32000))).astype(np.float32))
        a = np.asarray(fbank_pallas(x, interpret=True))
        b = np.asarray(F.kaldi_fbank_jax(x, mean_norm=True))
        np.testing.assert_allclose(a, b, atol=5e-3)

    def test_8k_config(self):
        # 8 kHz: win 200, shift 80, r = 40 ≤ shift — still supported
        rng = np.random.default_rng(2)
        x = (0.2 * rng.standard_normal((1, 16000))).astype(np.float32)
        out = np.asarray(fbank_pallas(jnp.asarray(x), sample_rate=8000, num_mel_bins=40, interpret=True))
        ref = F.kaldi_fbank(x[0], sample_rate=8000, num_mel_bins=40, dither=0.0, mean_norm=True)
        assert out.shape == (1,) + ref.shape
        np.testing.assert_allclose(out[0], ref, atol=5e-3)

    def test_auto_dispatch_on_cpu_uses_xla(self):
        x = jnp.asarray(np.zeros((1, 16000), np.float32))
        out = F.kaldi_fbank_auto(x)
        assert out.shape[0] == 1 and out.shape[2] == 80


class TestPallasLogmel:
    @pytest.mark.parametrize("n_samples", [16080, 8000])
    def test_matches_xla_logmel(self, n_samples):
        from speaker_diarization_tpu.kernels.fbank_pallas import logmel_pallas

        rng = np.random.default_rng(3)
        x = (0.2 * rng.standard_normal((2, n_samples))).astype(np.float32)
        n = F.count_frames(n_samples, 80)
        ref = np.asarray(F.logmel_frames_jax(jnp.asarray(x), n, 200, 80, 8000, 23, True))
        out = np.asarray(logmel_pallas(jnp.asarray(x), n, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_16k_eend_config(self):
        from speaker_diarization_tpu.kernels.fbank_pallas import logmel_pallas

        rng = np.random.default_rng(4)
        x = (0.2 * rng.standard_normal((1, 32000))).astype(np.float32)
        n = F.count_frames(32000, 160)
        ref = np.asarray(F.logmel_frames_jax(jnp.asarray(x), n, 400, 160, 16000, 23, True))
        out = np.asarray(logmel_pallas(jnp.asarray(x), n, 400, 160, 16000, 23, interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-4)
