"""Mamba backend: associative-scan correctness, causality, TS-VAD integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.mamba import BiMambaBlock, MambaLayer
from speaker_diarization_tpu.ops.mamba_scan import selective_scan, selective_scan_sequential


class TestSelectiveScan:
    def test_parallel_matches_sequential(self):
        rng = np.random.default_rng(0)
        B, T, D, N = 2, 37, 8, 4
        x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
        delta = jnp.asarray(rng.uniform(0.01, 0.5, (B, T, D)).astype(np.float32))
        A = -jnp.asarray(rng.uniform(0.1, 2.0, (D, N)).astype(np.float32))
        Bm = jnp.asarray(rng.standard_normal((B, T, N)).astype(np.float32))
        C = jnp.asarray(rng.standard_normal((B, T, N)).astype(np.float32))
        Dp = jnp.asarray(rng.standard_normal((D,)).astype(np.float32))
        y_par = selective_scan(x, delta, A, Bm, C, Dp)
        y_seq = selective_scan_sequential(x, delta, A, Bm, C, Dp)
        np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_seq), atol=1e-4, rtol=1e-4)

    def test_decaying_memory(self):
        # impulse at t=0 decays monotonically under negative A
        B, T, D, N = 1, 20, 1, 1
        x = jnp.zeros((B, T, D)).at[0, 0, 0].set(1.0)
        delta = jnp.ones((B, T, D)) * 0.5
        A = -jnp.ones((D, N))
        Bm = jnp.ones((B, T, N))
        C = jnp.ones((B, T, N))
        Dp = jnp.zeros((D,))
        y = np.asarray(selective_scan(x, delta, A, Bm, C, Dp))[0, :, 0]
        assert y[0] > 0
        assert np.all(np.diff(y[:10]) < 0)
        assert y[10] < y[0] * 0.1


class TestMambaLayer:
    def test_causal(self):
        layer = MambaLayer(d_model=16, d_state=4, expand=2)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((1, 30, 16)).astype(np.float32)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y1 = np.asarray(layer.apply(params, jnp.asarray(x)))
        x2 = x.copy()
        x2[:, 20:] += 3.0
        y2 = np.asarray(layer.apply(params, jnp.asarray(x2)))
        np.testing.assert_allclose(y1[:, :20], y2[:, :20], atol=1e-5)
        assert not np.allclose(y1[:, 20:], y2[:, 20:])

    def test_bimamba_not_causal_but_shaped(self):
        blk = BiMambaBlock(d_model=16, n_layer=2, d_state=4)
        rng = np.random.default_rng(2)
        x = rng.standard_normal((2, 25, 16)).astype(np.float32)
        params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = np.asarray(blk.apply(params, jnp.asarray(x)))
        assert y.shape == (2, 25, 16)
        # backward direction: future change must affect past outputs
        x2 = x.copy()
        x2[:, 20:] += 3.0
        y2 = np.asarray(blk.apply(params, jnp.asarray(x2)))
        assert not np.allclose(y[:, :20], y2[:, :20])


class TestTSVADMambaBackend:
    def test_forward_and_grad(self):
        from speaker_diarization_tpu.models import TSVADConfig, TSVADModel
        from speaker_diarization_tpu.ops.losses import standard_bce

        cfg = TSVADConfig(
            transformer_ffn_embed_dim=128, num_transformer_layer=1, encoder_block_layers=(2, 2),
            single_backend_type="mamba", multi_backend_type="mamba_add", d_state=8, expand=2,
        )
        model = TSVADModel(cfg=cfg)
        rng = np.random.default_rng(0)
        B, T = 2, 25
        audio = jnp.asarray(rng.standard_normal((B, 16000)).astype(np.float32) * 0.1)
        embs = jnp.asarray(rng.standard_normal((B, 4, 192)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), audio, embs, T)
        logits = model.apply(variables, audio, embs, T)
        assert logits.shape == (B, T, 4)
        labels = jnp.asarray((rng.random((B, T, 4)) < 0.3).astype(np.float32))

        def loss(p):
            lg = model.apply({"params": p, "batch_stats": variables["batch_stats"]}, audio, embs, T)
            return standard_bce(lg, labels)

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0


class TestPallasSelectiveScan:
    """Fused Pallas kernel vs the associative/sequential oracles
    (interpret mode on CPU; compiled on TPU)."""

    def _rand(self, B=2, T=37, D=128, N=8, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((B, T, D)).astype(np.float32)
        delta = np.abs(rng.standard_normal((B, T, D))).astype(np.float32) * 0.1
        A = -np.abs(rng.standard_normal((D, N))).astype(np.float32)
        Bm = rng.standard_normal((B, T, N)).astype(np.float32)
        C = rng.standard_normal((B, T, N)).astype(np.float32)
        Dp = rng.standard_normal(D).astype(np.float32)
        return x, delta, A, Bm, C, Dp

    def test_matches_oracle_multichunk(self):
        from speaker_diarization_tpu.kernels.selective_scan_pallas import selective_scan_pallas
        from speaker_diarization_tpu.ops.mamba_scan import selective_scan_sequential

        args = self._rand(T=37)  # 37 = 4 chunks of 16 with padding tail
        want = np.asarray(selective_scan_sequential(*map(jnp.asarray, args)))
        got = np.asarray(selective_scan_pallas(*map(jnp.asarray, args), chunk=16, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_single_chunk_exact(self):
        from speaker_diarization_tpu.kernels.selective_scan_pallas import selective_scan_pallas
        from speaker_diarization_tpu.ops.mamba_scan import selective_scan_sequential

        args = self._rand(T=16, seed=1)
        want = np.asarray(selective_scan_sequential(*map(jnp.asarray, args)))
        got = np.asarray(selective_scan_pallas(*map(jnp.asarray, args), chunk=64, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def test_fused_gradients_match(self):
        """Hand-written Pallas backward vs jax.grad of the associative scan
        — ALL six inputs, multi-chunk path (auto-interpret on CPU)."""
        from speaker_diarization_tpu.kernels.selective_scan_pallas import selective_scan_fused
        from speaker_diarization_tpu.ops.mamba_scan import selective_scan

        args = tuple(map(jnp.asarray, self._rand(T=20, D=64, seed=2)))

        def loss_fused(*a):
            return jnp.sum(selective_scan_fused(*a) ** 2)

        def loss_ref(*a):
            return jnp.sum(selective_scan(*a) ** 2)

        g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
        for name, gf, gr in zip("x delta A B C D".split(), g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=3e-4, err_msg=name
            )

    def test_fused_gradients_multichunk_carry(self):
        """Backward dh carry across chunk boundaries (T spanning 5 chunks of
        8 with a padded tail)."""
        import importlib

        ssp = importlib.import_module(
            "speaker_diarization_tpu.kernels.selective_scan_pallas"
        )
        from speaker_diarization_tpu.ops.mamba_scan import selective_scan

        args = tuple(map(jnp.asarray, self._rand(T=37, D=128, N=8, seed=4)))
        orig = ssp._pad_args
        # force tiny chunks so the reverse-grid carry is exercised
        ssp._pad_args = lambda x, d, b, c, chunk: orig(x, d, b, c, chunk=8)
        try:
            g_fused = jax.grad(lambda *a: jnp.sum(ssp.selective_scan_fused(*a) ** 2),
                               argnums=tuple(range(6)))(*args)
        finally:
            ssp._pad_args = orig
        g_ref = jax.grad(lambda *a: jnp.sum(selective_scan(*a) ** 2),
                         argnums=tuple(range(6)))(*args)
        for name, gf, gr in zip("x delta A B C D".split(), g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gr), atol=3e-4, rtol=3e-4, err_msg=name
            )
