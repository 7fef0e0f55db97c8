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


class TestSONDFidelity:
    """Round-3 fidelity: speaker ConvEncoder (conv_encoder.py:19), SANM CD
    attention (attention.py:311), by-construction frame/label alignment."""

    def test_speaker_conv_encoder_zero_profiles_stay_zero(self):
        from speaker_diarization_tpu.models.sond import SpeakerConvEncoder

        enc = SpeakerConvEncoder(32, n_layers=3)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 4, 16)).astype(np.float32)
        x[:, 2:] = 0.0  # absent profiles
        p = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(enc.apply(p, jnp.asarray(x)))
        assert y.shape == (2, 4, 32)
        np.testing.assert_array_equal(y[:, 2:], 0.0)
        assert np.abs(y[:, :2]).sum() > 0

    def test_sanm_layer_has_fsmn_memory(self):
        from speaker_diarization_tpu.models.sond import SANMLayer

        layer = SANMLayer(n_heads=2, d_ff=64, kernel=5, dropout=0.0)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 10, 32)).astype(np.float32))
        p = layer.init(jax.random.PRNGKey(0), x)
        assert "fsmn" in p["params"], list(p["params"])
        assert p["params"]["fsmn"]["kernel"].shape == (5, 1, 32)  # depthwise
        assert "qkv" in p["params"]  # fused qkv projection (SANM signature)
        y = layer.apply(p, x)
        assert y.shape == x.shape

    def test_loss_rejects_misaligned_labels(self):
        from speaker_diarization_tpu.models.sond import SONDConfig, SONDModel, make_sond_loss

        cfg = SONDConfig(max_speakers=4, max_set_size=2, feat_dim=24, spk_emb_dim=16,
                         d_model=32, n_heads=2, cd_layers=1, fsmn_layers=1,
                         encoder_m_channels=8, encoder_blocks=(1, 1, 1, 1))
        model = SONDModel(cfg=cfg)
        rng = np.random.default_rng(0)
        fbank = jnp.asarray(rng.standard_normal((1, 83, 24)).astype(np.float32))  # ceil(83/8)=11
        embs = jnp.asarray(rng.standard_normal((1, 4, 16)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), fbank, embs)
        loss = make_sond_loss(model)
        labels = jnp.zeros((1, 10, 4))  # 10 != 11
        with pytest.raises(ValueError, match="mismatch"):
            loss(v["params"], {"batch_stats": v["batch_stats"]},
                 dict(fbank=fbank, spk_embs=embs, labels=labels), jax.random.PRNGKey(0), False)

    def test_audio_loss_aligns_by_construction(self):
        from speaker_diarization_tpu.models.sond import SONDConfig, SONDModel
        from speaker_diarization_tpu.train.tasks import make_sond_loss_from_audio

        cfg = SONDConfig(max_speakers=4, max_set_size=2, feat_dim=24, spk_emb_dim=16,
                         d_model=32, n_heads=2, cd_layers=1, fsmn_layers=1,
                         encoder_m_channels=8, encoder_blocks=(1, 1, 1, 1))
        model = SONDModel(cfg=cfg)
        rng = np.random.default_rng(0)
        rate, secs = 8000, 3.0  # fbank 298 frames — NOT divisible by 8
        audio = rng.standard_normal((1, int(rate * secs))).astype(np.float32) * 0.1
        embs = rng.standard_normal((1, 4, 16)).astype(np.float32)
        labels25 = (rng.random((1, int(secs * 25), 4)) < 0.3).astype(np.float32)
        from speaker_diarization_tpu.ops.features import kaldi_fbank_auto

        fb = kaldi_fbank_auto(jnp.asarray(audio), num_mel_bins=24, sample_rate=rate)
        v = model.init(jax.random.PRNGKey(0), fb, jnp.asarray(embs))
        loss_fn = make_sond_loss_from_audio(model, sample_rate=rate)
        out = loss_fn(v["params"], {"batch_stats": v["batch_stats"]},
                      dict(audio=jnp.asarray(audio), target_embs=jnp.asarray(embs),
                           labels=jnp.asarray(labels25)),
                      jax.random.PRNGKey(0), False)
        assert np.isfinite(float(out[0]))
