"""SSND + Conformer tests: shapes, losses, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.conformer import ConformerEncoder
from speaker_diarization_tpu.models.ssnd import SSNDConfig, SSNDModel
from speaker_diarization_tpu.train import Trainer, TrainerConfig
from speaker_diarization_tpu.train.tasks import make_ssnd_loss

CFG = SSNDConfig(
    emb_dim=64, d_model=64, n_heads=2, d_ff=96, num_layers=1, max_speakers=3,
    vad_out_len=50, pos_emb_dim=64, max_seq_len=256, n_all_speakers=12,
    extractor_blocks=(2, 2),
)


class TestConformer:
    def test_shapes_and_mask(self):
        enc = ConformerEncoder(d_model=32, n_layers=2, n_heads=2, d_ff=64)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 30, 23)).astype(np.float32))
        v = enc.init(jax.random.PRNGKey(0), x)
        y, _ = enc.apply(v, x, mutable=["batch_stats"])
        assert y.shape == (2, 30, 32)
        m = np.ones((2, 30), np.float32)
        m[:, 20:] = 0
        y2, _ = enc.apply(v, x, jnp.asarray(m), mutable=["batch_stats"])
        assert np.asarray(y2)[:, 20:].sum() == 0


@pytest.fixture(scope="module")
def ssnd():
    model = SSNDModel(cfg=CFG)
    rng = np.random.default_rng(0)
    B = 2
    audio = jnp.asarray(rng.standard_normal((B, 32000)).astype(np.float32) * 0.1)  # 2 s
    aux = jnp.asarray(rng.standard_normal((B, 3, 64)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, aux)
    return model, variables, audio, aux, B


class TestSSNDModel:
    def test_forward_shapes(self, ssnd):
        model, variables, audio, aux, B = ssnd
        vad, emb = model.apply(variables, audio, aux)
        assert vad.shape == (B, 3, CFG.vad_out_len)
        assert emb.shape == (B, 3, CFG.emb_dim)
        assert np.isfinite(np.asarray(vad)).all() and np.isfinite(np.asarray(emb)).all()

    def test_arcface_margin_direction(self, ssnd):
        model, variables, *_ = ssnd
        rng = np.random.default_rng(1)
        emb = jnp.asarray(rng.standard_normal((4, CFG.emb_dim)).astype(np.float32))
        labels = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
        logits = np.asarray(model.apply(variables, emb, labels, method=model.arcface_logits))
        # margin lowers the target-class logit vs plain cosine·scale
        W = np.asarray(variables["params"]["E_all"])
        Wn = W / np.linalg.norm(W, axis=-1, keepdims=True)
        en = np.asarray(emb) / np.linalg.norm(np.asarray(emb), axis=-1, keepdims=True)
        plain = np.clip(en @ Wn.T, -0.9999, 0.9999) * CFG.arcface_scale
        for i, l in enumerate([0, 1, 2, 3]):
            assert logits[i, l] < plain[i, l] + 1e-4
            others = [j for j in range(CFG.n_all_speakers) if j != l]
            np.testing.assert_allclose(logits[i, others], plain[i, others], atol=1e-3)

    def test_training_smoke_overfit(self, ssnd):
        model, variables, audio, aux, B = ssnd
        rng = np.random.default_rng(2)
        batch = dict(
            audio=np.asarray(audio),
            aux_embs=np.asarray(aux),
            labels=(rng.random((B, 3, CFG.vad_out_len)) < 0.3).astype(np.float32),
            spk_gids=np.array([[0, 1, -1], [2, 3, -1]], np.int32),
        )
        trainer = Trainer(
            make_ssnd_loss(model), TrainerConfig(schedule="const", learning_rate=1e-3), has_mutable=True
        )
        state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        losses = []
        for _ in range(6):
            state, auxd = trainer.train_step(state, batch)
            losses.append(float(auxd["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
