"""Speech enhancement: spectral gating denoiser + dataset hooks."""

import os

import numpy as np

from speaker_diarization_tpu.data.enhance import enhance_corpus, get_enhancer, spectral_gate_denoise
from speaker_diarization_tpu.data.kaldi_io import load_scp
from speaker_diarization_tpu.data.simulate import simulate_corpus
from speaker_diarization_tpu.data.tsvad_dataset import TSVADChunkDataset
from speaker_diarization_tpu.data import wav as wavio
from speaker_diarization_tpu.infer import EmbeddingStore
from speaker_diarization_tpu.data.rttm import read_rttm_by_rec


def _snr(clean, test):
    noise = test[: len(clean)] - clean
    return 10 * np.log10(np.sum(clean**2) / max(np.sum(noise**2), 1e-12))


class TestSpectralGate:
    def test_improves_snr(self):
        rng = np.random.default_rng(0)
        rate = 16000
        t = np.arange(rate * 2) / rate
        clean = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        noise = rng.standard_normal(len(t)).astype(np.float32)
        noise *= np.sqrt(np.sum(clean**2) / np.sum(noise**2))  # 0 dB SNR
        noisy = clean + noise
        den = spectral_gate_denoise(noisy, rate)
        assert _snr(clean, den) > _snr(clean, noisy) + 2.0  # ≥2 dB gain
        assert den.dtype == noisy.dtype and len(den) == len(noisy)

    def test_short_input_passthrough(self):
        x = np.random.default_rng(1).standard_normal(100).astype(np.float32)
        np.testing.assert_array_equal(spectral_gate_denoise(x, 16000), x)

    def test_get_enhancer(self):
        assert get_enhancer("spectral_gate") is spectral_gate_denoise
        fn = lambda a, r: a * 0
        assert get_enhancer(fn) is fn


class TestEnhanceHooks:
    def test_offline_corpus_and_dataset_substitution(self, tmp_path):
        data_dir = simulate_corpus(
            str(tmp_path / "sim"), n_mixtures=1, n_speakers=2, rate=8000, seed=5,
            with_noise=True, src_speakers=4, utts_per_speaker=4,
        )
        out = enhance_corpus(data_dir, str(tmp_path / "enh"))
        scp = load_scp(os.path.join(out, "wav.scp"))
        assert sorted(scp) == sorted(load_scp(os.path.join(data_dir, "wav.scp")))
        rec = sorted(scp)[0]
        orig, r1 = wavio.read_wav(load_scp(os.path.join(data_dir, "wav.scp"))[rec])
        enh, r2 = wavio.read_wav(scp[rec])
        assert r1 == r2 and len(enh) == len(orig)
        assert not np.allclose(enh, orig)

        store = EmbeddingStore()
        turns = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
        for rc, ts in turns.items():
            for spk in {t.speaker for t in ts}:
                store.put(rc, spk, np.ones((2, 16), np.float32))

        # offline substitution path (eval: deterministic)
        ds = TSVADChunkDataset(
            data_dir, store, rs_len=1.0, segment_shift=1.0, rate=8000,
            is_train=False, enhanced_audio_dir=out,
        )
        item = ds[0]
        st = int(item["start_frame"] / 25 * 8000)
        np.testing.assert_allclose(item["audio"], enh[st : st + len(item["audio"])], atol=1e-6)

        # online enhancer hook (train: probability 1)
        ds2 = TSVADChunkDataset(
            data_dir, store, rs_len=1.0, segment_shift=1.0, rate=8000,
            is_train=True, aug_prob=0.0, enhancer=lambda a, r: np.zeros_like(a), enhance_prob=1.0,
        )
        assert np.all(ds2[0]["audio"] == 0)
