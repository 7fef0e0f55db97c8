"""Image-source room acoustics: RT60 vs the analytic Sabine target, image
lattice correctness, random-room sampling contract, spherical noise field
coherence (reference genrir.py + gensphnoise semantics)."""

import numpy as np
import pytest

from speaker_diarization_tpu.data.room import (
    RandomRoomSimulator,
    image_source_rir,
    measure_t60,
    sabine_alpha,
    spherical_noise,
)


class TestImageSourceRIR:
    def test_rt60_matches_sabine_target(self):
        fs = 8000
        room = (6.0, 5.0, 3.0)
        for t60 in (0.2, 0.35):
            h = image_source_rir(room, (2.0, 1.5, 1.2), (3.5, 2.8, 1.5), t60, fs)
            est = measure_t60(h, fs)
            # image method with uniform Sabine beta lands near the target
            assert 0.6 * t60 < est < 1.5 * t60, (t60, est)

    def test_direct_path_delay(self):
        fs = 16000
        room = (8.0, 6.0, 3.0)
        src, mic = (2.0, 2.0, 1.5), (5.0, 2.0, 1.5)  # 3 m apart
        h = image_source_rir(room, src, mic, 0.3, fs)
        first = np.argmax(np.abs(h) > 1e-3 * np.abs(h).max())
        expect = 3.0 / 340.0 * fs
        assert abs(first - expect) < 3, (first, expect)

    def test_longer_t60_decays_slower(self):
        fs = 8000
        room = (6.0, 5.0, 3.0)
        h_short = image_source_rir(room, (2, 2, 1.5), (4, 3, 1.5), 0.15, fs)
        h_long = image_source_rir(room, (2, 2, 1.5), (4, 3, 1.5), 0.4, fs)
        assert measure_t60(h_long, fs) > measure_t60(h_short, fs)

    def test_rejects_invalid_geometry(self):
        with pytest.raises(ValueError):
            image_source_rir((5, 5, 3), (6.0, 1, 1), (2, 2, 1), 0.3, 8000)
        # physically impossible T60 for a tiny room (Sabine alpha >= 1)
        assert sabine_alpha((2, 2, 2), 0.01) >= 1.0
        with pytest.raises(ValueError):
            image_source_rir((2, 2, 2), (1, 1, 1), (0.5, 0.5, 0.5), 0.01, 8000)


class TestRandomRoomSimulator:
    def test_sampling_contract(self):
        sim = RandomRoomSimulator(fs=8000, seed=3)
        spec = sim.sample_room(3)
        L = np.asarray(spec.room)
        assert (L >= (5, 5, 2.5)).all() and (L <= (10, 10, 4.5)).all()
        assert 0.1 <= spec.t60 <= 0.4
        assert sabine_alpha(spec.room, spec.t60) < 1.0
        assert len(spec.speakers) == 3
        for s in spec.speakers:
            assert (np.asarray(s) > 0).all() and (np.asarray(s) < L).all()

    def test_rirs_render(self):
        sim = RandomRoomSimulator(fs=8000, seed=4)
        hs = sim.rirs(2)
        assert len(hs) == 2
        for h in hs:
            assert len(h) > 400 and np.isfinite(h).all()
            assert np.abs(h).max() == pytest.approx(1.0)


class TestSphericalNoise:
    def test_mono_reduces_to_white(self):
        mics = np.zeros((1, 3))
        x = spherical_noise(mics, 8000, 8000, n_directions=16, seed=0)
        assert x.shape == (1, 8000)
        assert np.isfinite(x).all()
        assert x.std() > 0

    def test_coherence_follows_isotropic_model(self):
        """Two mics d apart: magnitude-squared coherence of an isotropic
        field is sinc^2(2 pi f d / c) — high at low f, low near the first
        sinc null."""
        fs, n = 16000, 4 * 16000
        d = 0.2
        mics = np.array([[0, 0, 0], [d, 0, 0]], float)
        x = spherical_noise(mics, n, fs, n_directions=128, seed=1)
        from scipy.signal import coherence

        f, cxy = coherence(x[0], x[1], fs=fs, nperseg=1024)
        c = 340.0
        # low-frequency bin: near-full coherence
        lo = cxy[(f > 50) & (f < 150)].mean()
        assert lo > 0.8, lo
        # near the first null of sinc(2 pi f d / c): f0 = c / (2 d)
        f0 = c / (2 * d)
        null = cxy[(f > 0.9 * f0) & (f < 1.1 * f0)].mean()
        assert null < 0.3, (f0, null)
        assert lo - null > 0.5
