"""Mamba-2 SSD scan and backends.

Oracle: per-step recurrence (ops/ssd.py::ssd_sequential) — the semantics of
mamba_ssm's mamba_chunk_scan_combined (reference ts_vad2/mamba.py:150-233).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.ops.ssd import ssd_chunked, ssd_sequential


def _rand_inputs(rng, B=2, T=97, H=4, P=8, G=2, N=16):
    x = jnp.asarray(rng.standard_normal((B, T, H, P)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.5, (B, T, H)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 4.0, (H,)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, T, G, N)), jnp.float32)
    D = jnp.asarray(rng.standard_normal((H,)), jnp.float32)
    return x, dt, A, Bm, Cm, D


def test_ssd_chunked_matches_sequential():
    rng = np.random.default_rng(0)
    args = _rand_inputs(rng)
    ref = ssd_sequential(*args)
    for chunk in (16, 64, 128):  # non-dividing, typical, > T
        out = ssd_chunked(*args, chunk=chunk)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_ssd_grads_match_sequential():
    rng = np.random.default_rng(1)
    x, dt, A, Bm, Cm, D = _rand_inputs(rng, T=40)

    def loss(fn, x, dt, Bm, Cm):
        return jnp.sum(jnp.tanh(fn(x, dt, A, Bm, Cm, D)))

    g1 = jax.grad(lambda *a: loss(ssd_chunked, *a), argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)
    g2 = jax.grad(lambda *a: loss(ssd_sequential, *a), argnums=(0, 1, 2, 3))(x, dt, Bm, Cm)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_ssd_causality():
    rng = np.random.default_rng(2)
    x, dt, A, Bm, Cm, D = _rand_inputs(rng, B=1, T=50)
    y1 = ssd_chunked(x, dt, A, Bm, Cm, D, chunk=16)
    x2 = x.at[:, 30:].set(123.0)  # perturb the future
    y2 = ssd_chunked(x2, dt, A, Bm, Cm, D, chunk=16)
    np.testing.assert_allclose(y1[:, :30], y2[:, :30], rtol=1e-5, atol=1e-5)
    assert not np.allclose(y1[:, 30:], y2[:, 30:])


def test_mamba2_block_shapes_and_grad():
    from speaker_diarization_tpu.models.mamba import BiMamba2Block

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 37, 64)), jnp.float32)
    for merge in ("concat", "add"):
        blk = BiMamba2Block(d_model=64, n_layer=1, d_state=16, headdim=32, merge=merge)
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)
        assert y.shape == x.shape
        g = jax.grad(lambda p: jnp.sum(blk.apply(p, x) ** 2))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(l).all() for l in leaves)
        assert any(np.abs(l).max() > 0 for l in leaves)


@pytest.mark.parametrize("single,multi", [("mamba2", "mamba2"), ("conformer", "lstm")])
def test_tsvad_new_backends(single, multi):
    from speaker_diarization_tpu.models import TSVADConfig, TSVADModel

    cfg = TSVADConfig(
        transformer_embed_dim=64,
        transformer_ffn_embed_dim=128,
        num_transformer_layer=1,
        encoder_block_layers=(2, 2, 2),
        single_backend_type=single,
        multi_backend_type=multi,
        d_state=16,
    )
    # headdim must divide expand*d_model=128
    model = TSVADModel(cfg=cfg)
    rng = np.random.default_rng(4)
    B, secs = 2, 1
    T = secs * cfg.label_rate
    audio = jnp.asarray(rng.standard_normal((B, secs * cfg.sample_rate)) * 0.1, jnp.float32)
    embs = jnp.asarray(rng.standard_normal((B, cfg.max_num_speaker, cfg.speaker_embed_dim)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), audio, embs, T)
    out = model.apply(variables, audio, embs, T, train=False)
    assert out.shape == (B, T, cfg.max_num_speaker)
    assert np.isfinite(np.asarray(out)).all()
