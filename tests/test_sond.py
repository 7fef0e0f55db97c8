"""SOND: powerset class count parity, shapes, training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.sond import SONDConfig, SONDModel, make_sond_loss
from speaker_diarization_tpu.ops import powerset as P
from speaker_diarization_tpu.train import Trainer, TrainerConfig

TINY = SONDConfig(
    max_speakers=4, max_set_size=2, feat_dim=24, spk_emb_dim=32, d_model=32,
    n_heads=2, cd_layers=1, fsmn_layers=2, fsmn_lorder=3, fsmn_rorder=3,
    encoder_m_channels=8, encoder_blocks=(1, 1, 1, 1),
)


class TestPowersetParity:
    def test_reference_pse_label_count(self):
        # reference SOND: 2517 PSE labels for ≤4 concurrent of 16 speakers
        assert P.n_powerset_classes(16, 4) == 2517


class TestSONDModel:
    @pytest.fixture(scope="class")
    def setup(self):
        model = SONDModel(cfg=TINY)
        rng = np.random.default_rng(0)
        B, T100 = 2, 64
        fbank = jnp.asarray(rng.standard_normal((B, T100, 24)).astype(np.float32))
        spk = jnp.asarray(rng.standard_normal((B, 4, 32)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), fbank, spk)
        return model, variables, fbank, spk, B, T100

    def test_shapes(self, setup):
        model, variables, fbank, spk, B, T100 = setup
        logits = model.apply(variables, fbank, spk)
        assert logits.shape == (B, T100 // 8, TINY.n_classes)
        assert TINY.n_classes == 1 + 4 + 6
        assert np.isfinite(np.asarray(logits)).all()

    def test_training_smoke(self, setup):
        model, variables, fbank, spk, B, T100 = setup
        rng = np.random.default_rng(1)
        Tf = T100 // 8
        labels = (rng.random((B, Tf, 4)) < 0.25).astype(np.float32)
        batch = dict(fbank=np.asarray(fbank), spk_embs=np.asarray(spk), labels=labels)
        trainer = Trainer(make_sond_loss(model), TrainerConfig(schedule="const", learning_rate=1e-3), has_mutable=True)
        state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        losses = []
        for _ in range(6):
            state, aux = trainer.train_step(state, batch)
            losses.append(float(aux["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
