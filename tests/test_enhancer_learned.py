"""Learned denoiser: jit round trip, overfit SNR gain, CLI train/export,
quality vs the spectral-gate DSP fallback."""

import os

import numpy as np
import pytest


def _tone(rate, secs, f0=220.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * secs)) / rate
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3.1 * t)
    sig = 0.3 * np.sin(2 * np.pi * f0 * t) * env
    return sig.astype(np.float32)


def _si_snr_np(est, ref):
    ref = ref - ref.mean()
    est = est - est.mean()
    proj = (est @ ref) / (ref @ ref + 1e-12) * ref
    return 10 * np.log10((proj @ proj + 1e-12) / ((est - proj) @ (est - proj) + 1e-12))


class TestMaskDenoiser:
    def test_stft_istft_roundtrip(self):
        import jax.numpy as jnp

        from speaker_diarization_tpu.models.enhancer import istft, stft

        x = np.random.default_rng(0).standard_normal((2, 4000)).astype(np.float32)
        X = stft(jnp.asarray(x), 512, 128)
        y = np.asarray(istft(X, 512, 128, 4000))
        np.testing.assert_allclose(y, x, atol=1e-4)

    def test_overfit_improves_si_snr(self):
        import jax
        import jax.numpy as jnp
        import optax

        from speaker_diarization_tpu.models.enhancer import (
            EnhancerConfig, MaskDenoiser, make_enhance_loss, si_snr,
        )

        rate = 8000
        clean = np.stack([_tone(rate, 1.0, 220, 0), _tone(rate, 1.0, 150, 1)])
        rng = np.random.default_rng(2)
        noise = rng.standard_normal(clean.shape).astype(np.float32)
        noise *= np.sqrt((clean**2).mean() / (noise**2).mean())  # 0 dB
        batch = dict(clean=jnp.asarray(clean), noisy=jnp.asarray(clean + noise))

        model = MaskDenoiser(cfg=EnhancerConfig(n_fft=256, hop=64, hidden=32, conv_channels=16, n_convs=2))
        params = model.init(jax.random.PRNGKey(0), batch["noisy"])
        loss_fn = make_enhance_loss(model)
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(p, o):
            (l, aux), g = jax.value_and_grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(0), True), has_aux=True)(p)
            up, o2 = tx.update(g, o)
            return optax.apply_updates(p, up), o2, aux["si_snr"]

        snr0 = float(si_snr(batch["noisy"], batch["clean"]).mean())
        snrs = []
        for _ in range(60):
            params, opt, s = step(params, opt)
            snrs.append(float(s))
        assert snrs[-1] > snr0 + 3.0, (snr0, snrs[::15])  # ≥3 dB learned gain

    def test_beats_spectral_gate_after_training(self):
        """The LEARNED denoiser outperforms the DSP spectral gate on
        held-out audio of the same family — the quality evidence the DSP
        stand-in lacked."""
        import jax
        import jax.numpy as jnp
        import optax

        from speaker_diarization_tpu.data.enhance import spectral_gate_denoise
        from speaker_diarization_tpu.models.enhancer import (
            EnhancerConfig, MaskDenoiser, make_enhance_loss, si_snr,
        )

        rate = 8000
        rng = np.random.default_rng(3)
        model = MaskDenoiser(cfg=EnhancerConfig(n_fft=256, hop=64, hidden=32, conv_channels=16, n_convs=2))
        loss_fn = make_enhance_loss(model)
        tx = optax.adam(3e-3)

        def make_batch(seed):
            r = np.random.default_rng(seed)
            clean = np.stack([_tone(rate, 1.0, f, seed * 7 + i) for i, f in enumerate(r.uniform(120, 300, 4))])
            noise = r.standard_normal(clean.shape).astype(np.float32)
            noise *= np.sqrt((clean**2).mean() / (noise**2).mean())
            return dict(clean=jnp.asarray(clean), noisy=jnp.asarray(clean + noise))

        params = model.init(jax.random.PRNGKey(0), make_batch(0)["noisy"])
        opt = tx.init(params)

        @jax.jit
        def step(p, o, batch):
            (l, aux), g = jax.value_and_grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(0), True), has_aux=True)(p)
            up, o2 = tx.update(g, o)
            return optax.apply_updates(p, up), o2

        for i in range(80):
            params, opt = step(params, opt, make_batch(i))

        held = make_batch(10_001)
        est = model.apply(params, held["noisy"])
        learned = float(si_snr(est, held["clean"]).mean())
        gate = np.mean([
            _si_snr_np(spectral_gate_denoise(np.asarray(held["noisy"][i]), rate), np.asarray(held["clean"][i]))
            for i in range(4)
        ])
        noisy = float(si_snr(held["noisy"], held["clean"]).mean())
        assert learned > noisy + 3.0, (noisy, learned)
        assert learned > gate, (gate, learned)

    def test_cli_train_export_and_hook(self, tmp_path):
        from speaker_diarization_tpu.cli.main import main
        from speaker_diarization_tpu.data.simulate import synthesize_noise_corpus, synthesize_speaker_corpus

        src = synthesize_speaker_corpus(str(tmp_path / "src"), n_speakers=2, utts_per_speaker=2, rate=8000, seed=0)
        noise = synthesize_noise_corpus(str(tmp_path / "noise"), rate=8000, seed=1)
        exp = tmp_path / "enh"
        rc = main([
            "train", "--family", "enhance", "--train-dir", src, "--noise-dir", noise,
            "--exp-dir", str(exp),
            "--set", "sample_rate=8000", "--set", "spk_dur=0.5", "--set", "batch_size=2",
            "--set", "num_steps=3", "--set", "schedule=const", "--set", "learning_rate=1e-4",
            "--set", "log_every=1", "--set", "valid_every=100",
        ])
        assert rc == 0
        out = tmp_path / "enh.npz"
        rc = main(["export-enhancer", "--exp-dir", str(exp), "--out", str(out)])
        assert rc == 0

        from speaker_diarization_tpu.data.enhance import get_enhancer

        fn = get_enhancer(f"neural:{out}")
        audio = _tone(8000, 0.5)
        y = fn(audio, 8000)
        assert y.shape == audio.shape and np.isfinite(y).all()
