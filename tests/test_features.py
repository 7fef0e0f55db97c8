"""Feature front-end tests.

Oracles:
- transformers.audio_utils (an independent librosa-compatible
  reimplementation) for the mel filterbank and spectrogram;
- direct-definition NumPy loops for framing/splicing;
- host NumPy path vs batched JAX device path cross-checks.
"""

import numpy as np
import pytest
from transformers import audio_utils as au

from speaker_diarization_tpu.ops import features as F

pytestmark = pytest.mark.quick


def _rand_audio(n, seed=0, sr=8000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    sig = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return sig.astype(np.float32)


class TestMelFilterbank:
    @pytest.mark.parametrize("sr,n_fft,n_mels", [(8000, 256, 23), (16000, 512, 23), (16000, 512, 40), (16000, 1024, 80)])
    def test_matches_librosa_semantics(self, sr, n_fft, n_mels):
        ours = F.mel_filterbank(sr, n_fft, n_mels)
        ref = au.mel_filter_bank(
            num_frequency_bins=1 + n_fft // 2,
            num_mel_filters=n_mels,
            min_frequency=0.0,
            max_frequency=sr / 2.0,
            sampling_rate=sr,
            norm="slaney",
            mel_scale="slaney",
        ).T  # au returns (n_freq, n_mels)
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_htk_scale(self):
        ours = F.mel_filterbank(16000, 512, 30, htk=True, norm=None)
        ref = au.mel_filter_bank(257, 30, 0.0, 8000.0, 16000, norm=None, mel_scale="htk").T
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestSTFT:
    @pytest.mark.parametrize("n,frame_size,shift", [(8000, 200, 80), (8001, 200, 80), (16000, 400, 160), (16160, 400, 160), (1000, 400, 160)])
    def test_frame_count(self, n, frame_size, shift):
        Y = F.stft(_rand_audio(n), frame_size, shift)
        assert Y.shape == (F.count_frames(n, shift), F.fft_size_for(frame_size) // 2 + 1)
        # reference rule: 1 + n//shift, minus one when divisible
        expect = 1 + n // shift - (1 if n % shift == 0 else 0)
        assert Y.shape[0] == expect

    def test_matches_independent_spectrogram(self):
        x = _rand_audio(8001)
        Y = np.abs(F.stft(x, 200, 80))
        win = au.window_function(200, "hann", frame_length=256, center=True)
        ref = au.spectrogram(x, win, frame_length=256, hop_length=80, power=1.0, center=True, pad_mode="constant").T
        np.testing.assert_allclose(Y, ref[: Y.shape[0]], atol=1e-3, rtol=1e-3)

    def test_transform_logmel23_mn_pipeline(self):
        x = _rand_audio(8000 * 3)
        Y = F.stft(x, 200, 80)
        lm = F.transform(Y, "logmel23_mn", sample_rate=8000)
        assert lm.shape == (Y.shape[0], 23)
        np.testing.assert_allclose(lm.mean(axis=0), 0.0, atol=1e-4)

    def test_transform_all_types_run(self):
        x = _rand_audio(8000)
        Y = F.stft(x, 200, 80)
        for tt in [None, "log", "logmel", "logmel23", "logmel23_mn", "logmel23_swn", "logmel23_mvn", "logmel23_espnet"]:
            out = F.transform(Y, tt, sample_rate=8000)
            assert out.shape[0] == Y.shape[0]
            assert np.isfinite(out).all()


class TestSpliceSubsample:
    def test_splice_matches_direct(self):
        rng = np.random.default_rng(1)
        Y = rng.standard_normal((50, 7)).astype(np.float32)
        c = 3
        out = F.splice(Y, c)
        assert out.shape == (50, 7 * 7)
        Yp = np.pad(Y, [(c, c), (0, 0)])
        for t in [0, 5, 49]:
            direct = np.concatenate([Yp[t + k] for k in range(2 * c + 1)])
            np.testing.assert_allclose(out[t], direct)

    def test_subsample(self):
        Y = np.arange(100).reshape(20, 5)
        T = np.arange(40).reshape(20, 2)
        Ys, Ts = F.subsample(Y, T, 10)
        assert Ys.shape == (2, 5) and Ts.shape == (2, 2)
        np.testing.assert_array_equal(Ys[1], Y[10])

    def test_get_input_dim(self):
        assert F.get_input_dim(200, 7, "logmel23_mn") == 23 * 15
        assert F.get_input_dim(400, 0, "log") == 257


class TestJaxPath:
    def test_logmel_matches_host(self):
        import jax.numpy as jnp

        x = _rand_audio(8000)
        host = F.transform(F.stft(x, 200, 80), "logmel23_mn", sample_rate=8000)
        n_frames = F.count_frames(len(x), 80)
        dev = np.asarray(
            F.logmel_frames_jax(jnp.asarray(x)[None], n_frames, 200, 80, 8000, 23, mean_norm=True)
        )[0]
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=2e-3, rtol=1e-3)

    def test_full_eend_frontend_matches_host(self):
        import jax.numpy as jnp

        x = _rand_audio(8000 * 2 + 40)
        host = F.transform(F.stft(x, 200, 80), "logmel23_mn", sample_rate=8000)
        host = F.splice(host, 7)
        host = F.subsample(host, subsampling=10)
        dev = np.asarray(F.eend_frontend_jax(jnp.asarray(x)[None], len(x)))[0]
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=2e-3, rtol=1e-3)

    def test_batched_shapes(self):
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(np.stack([_rand_audio(8000, s) for s in range(4)]))
        fn = jax.jit(lambda a: F.eend_frontend_jax(a, 8000))
        out = fn(x)
        assert out.shape == (4, (F.count_frames(8000, 80) + 9) // 10, 23 * 15)
