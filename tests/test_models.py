"""Model unit tests: shapes, masking, jit/grad, EDA behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models import EENDModel, EendEdaModel
from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.models.transformer import (
    TransformerEncoder,
    make_causal_mask,
    make_chunk_mask,
)

pytestmark = pytest.mark.quick

TINY = dict(d_model=32, n_layers=2, n_heads=2, d_ff=64, dropout=0.0)
FE = FrontendConfig()


def _audio(B=2, T=100, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, FE.chunk_samples(T))).astype(np.float32) * 0.1)


class TestTransformerEncoder:
    def test_shapes_and_mask(self):
        enc = TransformerEncoder(**TINY)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 50, 23)).astype(np.float32))
        params = enc.init(jax.random.PRNGKey(0), x)
        y = enc.apply(params, x)
        assert y.shape == (2, 50, 32)

    def test_padding_mask_isolates(self):
        # padded frames must not change valid-frame outputs
        enc = TransformerEncoder(**TINY)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 40, 23)).astype(np.float32)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        m = np.ones((1, 40), np.float32)
        m[:, 30:] = 0
        y1 = enc.apply(params, jnp.asarray(x), frame_mask=jnp.asarray(m))
        x2 = x.copy()
        x2[:, 30:] = 123.0  # garbage in padding
        y2 = enc.apply(params, jnp.asarray(x2), frame_mask=jnp.asarray(m))
        np.testing.assert_allclose(np.asarray(y1[:, :30]), np.asarray(y2[:, :30]), atol=1e-5)

    def test_causal_mask_is_causal(self):
        enc = TransformerEncoder(**TINY)
        rng = np.random.default_rng(2)
        x = rng.standard_normal((1, 30, 23)).astype(np.float32)
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
        cm = make_causal_mask(30)
        y1 = enc.apply(params, jnp.asarray(x), attn_mask=cm)
        x2 = x.copy()
        x2[:, 20:] += 5.0  # future perturbation
        y2 = enc.apply(params, jnp.asarray(x2), attn_mask=cm)
        np.testing.assert_allclose(np.asarray(y1[:, :20]), np.asarray(y2[:, :20]), atol=1e-5)

    def test_chunk_mask(self):
        cm = np.asarray(make_chunk_mask(8, 4, num_left_chunks=0))[0, 0]
        assert cm[0, 3] and not cm[0, 4]
        assert cm[5, 4] and not cm[5, 3] and not cm[5, 0]


class TestEEND:
    def test_forward_from_audio(self):
        model = EENDModel(n_speakers=2, frontend=FE, **TINY)
        x = _audio()
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (2, 100, 2)
        assert y.dtype == jnp.float32

    def test_forward_from_features(self):
        model = EENDModel(n_speakers=3, frontend=None, **TINY)
        feats = jnp.asarray(np.random.default_rng(0).standard_normal((2, 60, 345)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), feats)
        y = model.apply(params, feats)
        assert y.shape == (2, 60, 3)

    def test_bf16_compute(self):
        model = EENDModel(n_speakers=2, frontend=FE, dtype=jnp.bfloat16, **{k: v for k, v in TINY.items() if k != "dropout"})
        x = _audio()
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x, deterministic=True)
        assert y.dtype == jnp.float32  # head casts logits back
        assert np.isfinite(np.asarray(y)).all()


class TestEDA:
    def test_forward_and_infer(self):
        model = EendEdaModel(n_speakers=2, max_attractors=5, frontend=FE, **TINY)
        x = _audio()
        params = model.init(jax.random.PRNGKey(0), x)
        logits, exist = model.apply(params, x)
        assert logits.shape == (2, 100, 2) and exist.shape == (2, 3)
        logits_a, probs = model.apply(params, x, method=model.infer)
        assert logits_a.shape == (2, 100, 5) and probs.shape == (2, 5)
        assert ((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1)).all()

    def test_time_shuffle_changes_attractors_not_shapes(self):
        model = EendEdaModel(n_speakers=2, frontend=FE, **TINY)
        x = _audio(B=1)
        params = model.init(jax.random.PRNGKey(0), x)
        order = jnp.asarray(np.random.default_rng(0).permutation(100)[None, :])
        l1, _ = model.apply(params, x, order=order)
        assert l1.shape == (1, 100, 2)

    def test_grad_flows(self):
        model = EendEdaModel(n_speakers=2, frontend=FE, **TINY)
        x = _audio(B=1)
        params = model.init(jax.random.PRNGKey(0), x)

        def loss(p):
            logits, exist = model.apply(p, x)
            return jnp.mean(logits ** 2) + jnp.mean(exist ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0
