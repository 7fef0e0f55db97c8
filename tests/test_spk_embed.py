"""Speaker-embedding pretraining (AAM-softmax) + encoder export pipeline.

The reference consumes externally trained modelscope/wespeaker encoders;
this family makes the encoder → enrollment → TS-VAD chain self-contained.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.cli.main import main
from speaker_diarization_tpu.models.spk_embed import (
    SpeakerClassifier,
    SpkEmbedConfig,
    load_encoder,
    save_encoder,
)

TINY = SpkEmbedConfig(n_classes=4, feat_dim=24, encoder_blocks=(1, 1), margin=0.2, scale=8.0)


class TestAAM:
    def test_margin_lowers_target_logit(self):
        model = SpeakerClassifier(cfg=TINY)
        fb = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 24)), jnp.float32)
        labels = jnp.asarray([1, 3])
        variables = model.init(jax.random.PRNGKey(0), fb, None, False)
        plain = model.apply(variables, fb, None, False)
        margined = model.apply(variables, fb, labels, False)
        plain, margined = np.asarray(plain), np.asarray(margined)
        for b, lab in enumerate([1, 3]):
            assert margined[b, lab] < plain[b, lab]  # cos(θ+m) < cos(θ)
            others = [c for c in range(4) if c != lab]
            np.testing.assert_allclose(margined[b, others], plain[b, others], rtol=1e-5)

    def test_embed_is_normalized(self):
        model = SpeakerClassifier(cfg=TINY)
        fb = jnp.asarray(np.random.default_rng(0).standard_normal((3, 50, 24)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), fb, None, False)
        e = model.apply(variables, fb, False, method=model.embed)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(e), axis=-1), 1.0, atol=1e-4)


class TestEncoderRoundtrip:
    def test_save_load_matches(self, tmp_path):
        model = SpeakerClassifier(cfg=TINY)
        fb = jnp.asarray(np.random.default_rng(0).standard_normal((2, 60, 24)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), fb, None, False)
        enc_vars = {
            "params": variables["params"]["speech_encoder"],
            "batch_stats": variables["batch_stats"]["speech_encoder"],
        }
        path = str(tmp_path / "enc.npz")
        save_encoder(path, TINY, jax.device_get(enc_vars))
        module, loaded = load_encoder(path)
        want = model.apply(variables, fb, False, method=model.embed)
        got = module.apply(loaded, fb, False, "embedding")
        got = got / np.linalg.norm(np.asarray(got), axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5)


class TestSpkCli:
    def test_train_export_extract(self, tmp_path):
        from speaker_diarization_tpu.data.simulate import synthesize_speaker_corpus
        from speaker_diarization_tpu.infer.embeddings import EmbeddingStore

        src = synthesize_speaker_corpus(
            str(tmp_path / "src"), n_speakers=4, utts_per_speaker=3, rate=8000, seed=0
        )
        exp = str(tmp_path / "exp")
        rc = main([
            "train", "--family", "spk", "--train-dir", src, "--exp-dir", exp,
            "--set", "sample_rate=8000", "--set", "n_mels=24", "--set", "spk_dur=1.0",
            "--set", "speech_encoder_type=campplus", "--set", "encoder_blocks=1,1",
            "--set", "batch_size=4", "--set", "num_steps=4", "--set", "schedule=const",
            "--set", "learning_rate=1e-3", "--set", "log_every=1", "--set", "valid_every=100",
        ])
        assert rc == 0
        import json

        losses = [
            json.loads(l)["loss"]
            for l in open(os.path.join(exp, "metrics.jsonl"))
            if "loss" in json.loads(l)
        ]
        assert losses and np.isfinite(losses).all()

        enc = str(tmp_path / "enc.npz")
        rc = main([
            "export-encoder", "--exp-dir", exp, "--out", enc,
            "--set", "n_mels=24", "--set", "speech_encoder_type=campplus",
            "--set", "encoder_blocks=1,1",
        ])
        assert rc == 0 and os.path.exists(enc)

        store_path = str(tmp_path / "embs.npz")
        rc = main([
            "extract-embeddings", "--data-dir", src, "--out", store_path,
            "--encoder-ckpt", enc, "--rate", "8000", "--window", "1.0", "--hop", "0.5",
        ])
        assert rc == 0
        store = EmbeddingStore.load(store_path)
        assert store.data
        m = next(iter(store.data.values()))
        assert m.ndim == 2 and np.isfinite(m).all()
