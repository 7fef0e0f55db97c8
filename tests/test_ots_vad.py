"""OTS-VAD: self-enrollment semantics + online loop smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.ots_vad import OTSVADConfig, OTSVADModel

CFG = OTSVADConfig(
    num_speakers=3, d_model=48, conformer_layers=1, n_heads=2, d_ff=64,
    lstm_hidden=32, encoder_m_channels=8, encoder_blocks=(1, 1, 1, 1), dropout=0.0,
)


@pytest.fixture(scope="module")
def model_vars():
    model = OTSVADModel(cfg=CFG)
    rng = np.random.default_rng(0)
    B = 2
    left = jnp.asarray(rng.standard_normal((B, 16000)).astype(np.float32) * 0.1)
    right = jnp.asarray(rng.standard_normal((B, 16000)).astype(np.float32) * 0.1)
    Tl = 12  # ≈ 98 fbank frames / 8
    y_left = jnp.asarray((rng.random((B, 3, Tl)) < 0.4).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, y_left)
    return model, variables, left, right, y_left, B


class TestOTSVAD:
    def test_forward_shapes(self, model_vars):
        model, variables, left, right, y_left, B = model_vars
        logits = model.apply(variables, left, right, y_left)
        assert logits.shape[0] == B and logits.shape[1] == 3
        assert np.isfinite(np.asarray(logits)).all()

    def test_masked_target_embeddings(self):
        emb = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 3, 4))  # (1, T=3, D=4)
        labels = jnp.asarray(np.array([[[1, 0, 1], [0, 0, 0]]], np.float32))  # (1, S=2, T=3)
        out = np.asarray(OTSVADModel.masked_target_embeddings(emb, labels))
        np.testing.assert_allclose(out[0, 0], (emb[0, 0] + emb[0, 2]) / 2)
        np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)  # silent → zero

    def test_online_loop(self, model_vars):
        model, variables, left, right, y_left, B = model_vars
        state = model.apply(variables, B, method=model.online_init)
        for blk in (left, right):
            logits, state = model.apply(variables, blk, state, method=model.online_step)
            assert np.isfinite(np.asarray(logits)).all()
        assert float(jnp.sum(state["counts"])) >= 0
