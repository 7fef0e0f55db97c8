"""FS-EEND: causality, label protocol, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.models.fs_eend import FSEENDModel, consistency_loss, fs_eend_labels
from speaker_diarization_tpu.train import Trainer, TrainerConfig
from speaker_diarization_tpu.train.tasks import make_fs_eend_loss

FE = FrontendConfig()
TINY = dict(d_model=32, enc_layers=1, dec_layers=1, n_heads=2, d_ff=64, dec_d_ff=64, dropout=0.0, conv_delay=3)


class TestLabels:
    def test_first_appearance_order_and_channels(self):
        labels = np.zeros((1, 10, 2), np.float32)
        labels[0, 5:8, 0] = 1  # speaker 0 appears later
        labels[0, 1:4, 1] = 1  # speaker 1 appears first
        out = np.asarray(fs_eend_labels(jnp.asarray(labels)))
        assert out.shape == (1, 10, 4)
        np.testing.assert_array_equal(out[0, :, 1], labels[0, :, 1])  # first-appearing → channel 1
        np.testing.assert_array_equal(out[0, :, 2], labels[0, :, 0])
        np.testing.assert_array_equal(out[0, :, 0], 1 - labels[0].max(-1))  # silence channel
        np.testing.assert_array_equal(out[0, :, 3], 0)  # pad channel

    def test_consistency_loss_zero_for_identical_maps(self):
        rng = np.random.default_rng(0)
        lab = (rng.random((1, 6, 3)) < 0.5).astype(np.float32)
        # emb == labels → cosine maps identical → loss 0
        loss = consistency_loss(jnp.asarray(lab), jnp.asarray(lab))
        assert float(loss) < 1e-10


class TestModel:
    def test_shapes_and_causality(self):
        model = FSEENDModel(n_speakers=2, frontend=FE, **TINY)
        rng = np.random.default_rng(0)
        T = 40
        audio = rng.standard_normal((1, FE.chunk_samples(T))).astype(np.float32) * 0.1
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(audio))
        logits, emb = model.apply(params, jnp.asarray(audio))
        assert logits.shape == (1, T, 4) and emb.shape == (1, T, 32)

        # causality at the feature level: perturb future features; outputs
        # before (t - conv_delay) must be unchanged
        feats = np.asarray(
            jnp.asarray(rng.standard_normal((1, T, FE.input_dim)).astype(np.float32))
        )
        model_f = FSEENDModel(n_speakers=2, frontend=None, **TINY)
        params_f = model_f.init(jax.random.PRNGKey(0), jnp.asarray(feats))
        y1, _ = model_f.apply(params_f, jnp.asarray(feats))
        feats2 = feats.copy()
        feats2[:, 30:] += 5.0
        y2, _ = model_f.apply(params_f, jnp.asarray(feats2))
        horizon = 30 - TINY["conv_delay"]
        np.testing.assert_allclose(np.asarray(y1)[:, :horizon], np.asarray(y2)[:, :horizon], atol=1e-4)
        assert not np.allclose(np.asarray(y1)[:, 30:], np.asarray(y2)[:, 30:])

    def test_training_smoke(self):
        model = FSEENDModel(n_speakers=2, frontend=FE, **{**TINY, "dropout": 0.1})
        rng = np.random.default_rng(1)
        B, T = 4, 30
        batch = dict(
            audio=rng.standard_normal((B, FE.chunk_samples(T))).astype(np.float32) * 0.1,
            labels=(rng.random((B, T, 2)) < 0.3).astype(np.float32),
            frame_mask=np.ones((B, T), np.float32),
        )
        trainer = Trainer(make_fs_eend_loss(model), TrainerConfig(schedule="const", learning_rate=1e-3))
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["audio"]))
        state = trainer.init_state(params)
        losses = []
        for _ in range(8):
            state, aux = trainer.train_step(state, batch)
            losses.append(float(aux["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # overfits a fixed batch
