"""Neural VAD (silero-vad equivalent): hysteresis semantics + trainability.

Reference contract: make_system_sad.py:32-57 (per-window probs →
get_speech_timestamps → segments, min-duration filter)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speaker_diarization_tpu.models.vad import (
    NeuralVAD,
    NeuralVADConfig,
    get_speech_timestamps,
    make_vad_labels,
    neural_sad,
)

RATE = 16000


class TestGetSpeechTimestamps:
    def test_basic_trigger_release(self):
        # 100 frames @10 ms: speech in [20,60)
        p = np.zeros(100)
        p[20:60] = 0.9
        segs = get_speech_timestamps(p, 0.01, threshold=0.5, pad_s=0.0)
        assert len(segs) == 1
        s, e = segs[0]
        assert s == pytest.approx(0.20, abs=0.02)
        assert e == pytest.approx(0.70, abs=0.11)  # release needs min_silence

    def test_min_speech_filter(self):
        p = np.zeros(100)
        p[10:12] = 0.9  # 20 ms — below min_speech_s=0.25
        assert get_speech_timestamps(p, 0.01) == []

    def test_short_dip_bridged(self):
        # a dip shorter than min_silence must not split the segment
        p = np.full(100, 0.9)
        p[40:44] = 0.0  # 40 ms dip < 100 ms min_silence
        segs = get_speech_timestamps(p, 0.01, pad_s=0.0)
        assert len(segs) == 1

    def test_long_gap_splits(self):
        p = np.zeros(200)
        p[10:60] = 0.9
        p[120:180] = 0.9
        segs = get_speech_timestamps(p, 0.01, pad_s=0.0)
        assert len(segs) == 2

    def test_hysteresis_neg_threshold(self):
        # probs hovering between neg_threshold and threshold keep the
        # segment open once triggered
        p = np.zeros(100)
        p[10:20] = 0.9
        p[20:80] = 0.45  # >= neg_threshold (0.35), < threshold (0.5)
        segs = get_speech_timestamps(p, 0.01, threshold=0.5, pad_s=0.0)
        assert len(segs) == 1
        assert segs[0][1] >= 0.80 - 1e-9


def _toy_batch(rng, B=8, secs=2):
    """Speech = amplitude-modulated noise bursts; silence = near-zero."""
    S = secs * RATE
    audio = np.zeros((B, S), np.float32)
    frame_shift_s = 0.01
    n_frames = 1 + (S - 160) // 160 if False else None
    from speaker_diarization_tpu.ops.features import count_frames

    T = count_frames(S, 160)
    labels = np.zeros((B, T), np.float32)
    for b in range(B):
        t = 0.0
        while t < secs - 0.3:
            dur = rng.uniform(0.3, 0.8)
            if rng.random() < 0.6:  # speech burst
                i0, i1 = int(t * RATE), int(min(secs, t + dur) * RATE)
                carrier = np.sin(2 * np.pi * rng.uniform(100, 300) * np.arange(i1 - i0) / RATE)
                audio[b, i0:i1] = (0.3 * carrier + 0.2 * rng.standard_normal(i1 - i0)).astype(np.float32)
                labels[b] += make_vad_labels([(t, t + dur)], T, frame_shift_s)
            t += dur
        audio[b] += 0.005 * rng.standard_normal(S).astype(np.float32)
    return audio, np.clip(labels, 0, 1)


class TestNeuralVAD:
    def test_shapes_and_causality(self):
        cfg = NeuralVADConfig()
        model = NeuralVAD(cfg=cfg)
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, RATE)).astype(np.float32) * 0.1)
        v = model.init(jax.random.PRNGKey(0), audio)
        out = model.apply(v, audio)
        from speaker_diarization_tpu.ops.features import count_frames

        assert out.shape == (2, count_frames(RATE, cfg.frame_shift))
        # causality: perturbing the future must not change early outputs
        audio2 = audio.at[:, 12000:].set(0.7)
        out2 = model.apply(v, audio2)
        np.testing.assert_allclose(out[:, :40], out2[:, :40], atol=2e-5)

    def test_trains_and_segments(self):
        rng = np.random.default_rng(1)
        cfg = NeuralVADConfig(conv_channels=(24,), lstm_hidden=32)
        model = NeuralVAD(cfg=cfg)
        audio, labels = _toy_batch(rng)
        v = model.init(jax.random.PRNGKey(0), jnp.asarray(audio))
        tx = optax.adam(3e-3)
        opt = tx.init(v["params"])

        @jax.jit
        def step(params, opt, a, y):
            def loss_fn(p):
                logits = model.apply({"params": p}, a)
                return optax.sigmoid_binary_cross_entropy(logits, y).mean()

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        params = v["params"]
        first = None
        for i in range(60):
            a, y = _toy_batch(rng)
            params, opt, loss = step(params, opt, jnp.asarray(a), jnp.asarray(y))
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.6, (first, float(loss))

        # accuracy on fresh data
        a, y = _toy_batch(rng)
        probs = np.asarray(jax.nn.sigmoid(model.apply({"params": params}, jnp.asarray(a))))
        acc = ((probs > 0.5) == (y > 0.5)).mean()
        assert acc > 0.85, acc

        # end-to-end: neural_sad recovers a planted speech region
        secs = 4
        audio = 0.004 * rng.standard_normal(secs * RATE).astype(np.float32)
        i0, i1 = int(1.0 * RATE), int(2.5 * RATE)
        audio[i0:i1] += (
            0.3 * np.sin(2 * np.pi * 200 * np.arange(i1 - i0) / RATE)
            + 0.2 * rng.standard_normal(i1 - i0)
        ).astype(np.float32)
        segs = neural_sad(audio, RATE, model, {"params": params}, chunk_s=2.0)
        assert segs, "no speech detected"
        covered = sum(min(e, 2.5) - max(s, 1.0) for s, e in segs if e > 1.0 and s < 2.5)
        assert covered > 1.0, segs
        spurious = sum(e - s for s, e in segs) - covered
        assert spurious < 0.8, segs


class TestVadCliFamily:
    def test_train_export_cluster(self, tmp_path):
        """train --family vad → export-vad → cluster --sad neural."""
        from speaker_diarization_tpu.cli.main import main
        from speaker_diarization_tpu.data.simulate import simulate_corpus

        d = simulate_corpus(str(tmp_path / "c"), n_mixtures=2, n_speakers=2,
                            seed=5, src_speakers=3, utts_per_speaker=4)
        exp = str(tmp_path / "exp")
        rc = main(["train", "--family", "vad", "--train-dir", d, "--exp-dir", exp,
                   "--set", "num_steps=25", "--set", "batch_size=4",
                   "--set", "chunk_frames=200", "--set", "schedule=const",
                   "--set", "learning_rate=0.003", "--set", "log_every=25"])
        assert rc == 0
        ck = str(tmp_path / "vad.msgpack")
        assert main(["export-vad", "--exp-dir", exp, "--out", ck]) == 0
        out = str(tmp_path / "hyp.rttm")
        rc = main(["cluster", "--data-dir", d, "--out", out, "--encoder", "spectrum",
                   "--sad", "neural", "--vad-ckpt", ck, "--rate", "8000",
                   "--num-spks", "2"])
        assert rc == 0
        from speaker_diarization_tpu.data.rttm import read_rttm_by_rec

        hyp = read_rttm_by_rec(out)
        assert hyp, "cluster produced no turns"
