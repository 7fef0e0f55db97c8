"""Speaker-encoder zoo + powerset encoding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.speaker_encoders import ECAPA_TDNN, ResNet34, build_speaker_encoder
from speaker_diarization_tpu.ops import powerset as P


class TestPowerset:
    def test_mapping_shape_and_order(self):
        A = P.powerset_mapping(4, 2)
        assert A.shape == (1 + 4 + 6, 4)
        np.testing.assert_array_equal(A[0], [0, 0, 0, 0])
        np.testing.assert_array_equal(A[1], [1, 0, 0, 0])
        np.testing.assert_array_equal(A[5], [1, 1, 0, 0])

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        labels = (rng.random((2, 20, 4)) < 0.25).astype(np.float32)
        # clip to ≤2 simultaneous for exact roundtrip
        for b in range(2):
            for t in range(20):
                on = np.nonzero(labels[b, t])[0]
                labels[b, t, on[2:]] = 0
        idx = P.multilabel_to_powerset(jnp.asarray(labels), 4, 2)
        back = P.powerset_to_multilabel(idx, 4, 2)
        np.testing.assert_array_equal(np.asarray(back), labels)

    def test_pit_ce_perfect(self):
        rng = np.random.default_rng(1)
        labels = np.zeros((1, 12, 3), np.float32)
        labels[0, 2:6, 0] = 1
        labels[0, 4:9, 1] = 1
        # logits that put all mass on the correct class but with channels
        # permuted (speaker 0↔1): PIT must recover it
        perm_labels = labels[:, :, [1, 0, 2]]
        idx = np.asarray(P.multilabel_to_powerset(jnp.asarray(perm_labels), 3, 2))
        C = P.n_powerset_classes(3, 2)
        logits = np.full((1, 12, C), -20.0, np.float32)
        for t in range(12):
            logits[0, t, idx[0, t]] = 20.0
        loss, tgt = P.powerset_pit_ce(jnp.asarray(logits), jnp.asarray(labels), 3, 2)
        assert float(loss) < 1e-3
        np.testing.assert_array_equal(np.asarray(tgt), idx)

    def test_label_smoothing_and_mask(self):
        rng = np.random.default_rng(2)
        C = P.n_powerset_classes(2, 2)
        logits = jnp.asarray(rng.standard_normal((2, 10, C)).astype(np.float32))
        labels = jnp.asarray((rng.random((2, 10, 2)) < 0.4).astype(np.float32))
        mask = jnp.asarray(np.ones((2, 10), np.float32).copy())
        l1, _ = P.powerset_pit_ce(logits, labels, 2, 2, frame_mask=mask, label_smoothing=0.1)
        assert np.isfinite(float(l1))


class TestEncoders:
    def test_ecapa_modes(self):
        m = ECAPA_TDNN(channels=64, feat_dim=24, embed_dim=32)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 24)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, False, "embedding")
        emb = m.apply(v, x, False, "embedding")
        frames = m.apply(v, x, False, "frames")
        assert emb.shape == (2, 32)
        assert frames.shape == (2, 50, 1536)
        assert np.isfinite(np.asarray(emb)).all()

    def test_resnet34_modes(self):
        m = ResNet34(feat_dim=24, embed_dim=32, m_channels=8)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 24)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, False, "embedding")
        emb = m.apply(v, x, False, "embedding")
        frames = m.apply(v, x, False, "frames")
        assert emb.shape == (2, 32)
        assert frames.shape[0] == 2 and frames.shape[1] == 8  # T/8
        assert np.isfinite(np.asarray(frames)).all()

    def test_simam_resnet34_modes(self):
        from speaker_diarization_tpu.models.speaker_encoders import SimAMResNet34, simam

        m = SimAMResNet34(feat_dim=24, embed_dim=32, m_channels=8)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 64, 24)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, False, "embedding")
        emb = m.apply(v, x, False, "embedding")
        frames = m.apply(v, x, False, "frames")
        assert emb.shape == (2, 32)
        # frames dim = 8m · F/8 (reference D=5120 for m=64, F=80)
        assert frames.shape == (2, 8, 8 * 8 * (24 // 8))
        assert np.isfinite(np.asarray(emb)).all()

        # SimAM semantics vs the reference formula on a raw array
        y = np.random.default_rng(3).standard_normal((1, 5, 4, 3)).astype(np.float32)
        out = np.asarray(simam(jnp.asarray(y)))
        n = 5 * 4 - 1
        d = (y - y.mean(axis=(1, 2), keepdims=True)) ** 2
        vvar = d.sum(axis=(1, 2), keepdims=True) / n
        e_inv = d / (4 * (vvar + 1e-4)) + 0.5
        np.testing.assert_allclose(out, y / (1 + np.exp(-e_inv)), rtol=1e-5)

    def test_tsvad_simam_encoder_forward(self):
        from speaker_diarization_tpu.models.tsvad import TSVADConfig, TSVADModel

        cfg = TSVADConfig(
            speech_encoder_type="simam_resnet34",
            transformer_ffn_embed_dim=256,
            num_transformer_layer=1,
            dropout=0.0,
            feat_dim=40,
        )
        model = TSVADModel(cfg=cfg)
        B = 1
        audio = jnp.asarray(np.random.default_rng(4).standard_normal((B, 16000)).astype(np.float32) * 0.05)
        embs = jnp.asarray(np.random.default_rng(5).standard_normal((B, 4, 192)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), audio, embs, 25)
        logits = model.apply(v, audio, embs, 25)
        assert logits.shape == (B, 25, 4)
        assert np.isfinite(np.asarray(logits)).all()

    def test_zoo_factory(self):
        m = build_speaker_encoder("ecapa_tdnn", channels=64, feat_dim=24, embed_dim=16)
        assert isinstance(m, ECAPA_TDNN)
        m2 = build_speaker_encoder("campplus", block_layers=(2, 2), block_dilations=(1, 2))
        from speaker_diarization_tpu.models import CAMPPlus

        assert isinstance(m2, CAMPPlus)
