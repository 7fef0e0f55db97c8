"""EEND-M2F: Hungarian matcher, set criterion, model smoke + overfit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.models.eend_m2f import (
    EENDM2FModel,
    M2FConfig,
    m2f_criterion,
    m2f_predict_activity,
)
from speaker_diarization_tpu.ops.hungarian import dice_loss, hungarian_assign

FE = FrontendConfig()
# flat variant: encoder at (subsampled) frontend rate, no conv backbone
CFG = M2FConfig(
    num_queries=6, d_model=48, n_heads=2, d_ff=64, enc_layers=1, dec_layers=2,
    dropout=0.0, use_backbone=False,
)
# reference-fidelity variant (backbone.py:7 + pixel_decoder.py:3): ×10
# depthwise subsample → conformer → ×10 transposed-conv upsample
FE_RAW = FrontendConfig(subsampling=1, context_size=0)
CFG_BB = M2FConfig(
    num_queries=6, d_model=48, n_heads=2, d_ff=64, enc_layers=1, dec_layers=2,
    dropout=0.0, use_backbone=True, encoder_type="conformer", conv_kernel=7,
)


class TestHungarian:
    def test_assignment(self):
        cost = np.array([[[1.0, 0.0, 5.0], [0.0, 1.0, 5.0]]], np.float32)  # (1, 2, 3)
        a = np.asarray(hungarian_assign(jnp.asarray(cost)))
        np.testing.assert_array_equal(a[0], [1, 0])

    def test_under_jit(self):
        @jax.jit
        def f(c):
            return hungarian_assign(c)

        cost = jnp.asarray(np.random.default_rng(0).random((3, 4, 6)).astype(np.float32))
        a = np.asarray(f(cost))
        assert a.shape == (3, 4)
        for b in range(3):
            assert len(set(a[b].tolist())) == 4  # one-to-one

    def test_oracle_fuzz(self):
        """JV solver vs the scipy oracle on random / tied / rectangular /
        sentinel-padded matrices: total assignment cost must match the
        float64 optimum (ADVICE r3: regression guard for the lax-loop
        solver)."""
        from scipy.optimize import linear_sum_assignment

        rng = np.random.default_rng(42)
        cases = []
        for N, M in [(1, 1), (2, 3), (4, 4), (5, 8), (8, 8), (3, 16)]:
            cases.append(rng.random((2, N, M)).astype(np.float32) * 10)
            # tied integer costs
            cases.append(rng.integers(0, 4, size=(2, N, M)).astype(np.float32))
        # constant-sentinel padded columns (the M2F matcher regime)
        c = rng.random((2, 3, 8)).astype(np.float32)
        c[:, :, 4:] = 1e6
        cases.append(c)
        for cost in cases:
            a = np.asarray(hungarian_assign(jnp.asarray(cost)))
            for b in range(cost.shape[0]):
                r, col = linear_sum_assignment(cost[b].astype(np.float64))
                opt = cost[b][r, col].sum()
                got = cost[b][np.arange(cost.shape[1]), a[b]].sum()
                assert len(set(a[b].tolist())) == cost.shape[1]
                np.testing.assert_allclose(got, opt, rtol=1e-5, atol=1e-4)

    def test_dice(self):
        t = jnp.asarray(np.array([[1, 1, 0, 0]], np.float32))
        perfect = jnp.asarray(np.array([[20.0, 20.0, -20.0, -20.0]], np.float32))
        assert float(dice_loss(perfect, t)[0]) < 1e-3
        worst = -perfect
        # eps smoothing bounds the worst case below 1 (here 1 - 1/(4+1) = 0.8)
        assert float(dice_loss(worst, t)[0]) > 0.6


@pytest.fixture(scope="module")
def m2f():
    model = EENDM2FModel(cfg=CFG, frontend=FE)
    rng = np.random.default_rng(0)
    B, T = 2, 50
    audio = jnp.asarray(rng.standard_normal((B, FE.chunk_samples(T))).astype(np.float32) * 0.1)
    params = model.init(jax.random.PRNGKey(0), audio)
    return model, params, audio, B, T


class TestModel:
    def test_output_shapes(self, m2f):
        model, params, audio, B, T = m2f
        out = model.apply(params, audio)
        assert out["mask_logits"].shape == (B, CFG.num_queries, T)
        assert out["class_logits"].shape == (B, CFG.num_queries)
        assert len(out["aux_mask_logits"]) == CFG.dec_layers - 1

    def test_criterion_and_overfit(self, m2f):
        model, params, audio, B, T = m2f
        rng = np.random.default_rng(1)
        labels = np.zeros((B, 3, T), np.float32)
        labels[:, 0, 5:25] = 1
        labels[:, 1, 20:40] = 1
        # third row empty (padding speaker)

        import optax

        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                out = model.apply(p, audio, train=False)
                loss, aux = m2f_criterion(out, jnp.asarray(labels), CFG)
                return loss, aux

            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            up, opt_state2 = tx.update(g, opt_state)
            return optax.apply_updates(params, up), opt_state2, loss

        losses = []
        p = params
        for _ in range(25):
            p, opt_state, loss = step(p, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < 0.7 * losses[0], losses[::6]

        out = model.apply(p, audio)
        act, keep = m2f_predict_activity(out, class_threshold=0.5)
        assert act.shape == (B, CFG.num_queries, T)
        # after overfitting, ~2 queries should be kept per sample
        assert 1 <= int(np.asarray(keep).sum(axis=-1).max()) <= CFG.num_queries


class TestBackboneModel:
    """True backbone: encoder at ×10 rate, masks at frame rate."""

    @pytest.fixture(scope="class")
    def m2f_bb(self):
        model = EENDM2FModel(cfg=CFG_BB, frontend=FE_RAW)
        rng = np.random.default_rng(0)
        B, T = 2, 200  # 100 Hz frames
        audio = jnp.asarray(rng.standard_normal((B, FE_RAW.chunk_samples(T))).astype(np.float32) * 0.1)
        params = model.init(jax.random.PRNGKey(0), audio)
        return model, params, audio, B, T

    def test_masks_at_frame_rate_encoder_at_tenth(self, m2f_bb):
        model, params, audio, B, T = m2f_bb
        out = model.apply(params, audio)
        assert out["mask_logits"].shape == (B, CFG_BB.num_queries, T)
        assert out["class_logits"].shape == (B, CFG_BB.num_queries)
        # the subsampler param shapes prove the ×10 path exists
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        names = {"/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat}
        assert any("subsampler/depthwise" in n for n in names), sorted(names)[:10]
        assert any("pixel_decoder/up5" in n for n in names)

    def test_subsample_shape_contract(self):
        # depthwise k15 s10 pad3: T' = floor((T + 6 - 15)/10) + 1
        from speaker_diarization_tpu.models.eend_m2f import DepthwiseSeparableSubsample10

        m = DepthwiseSeparableSubsample10(16)
        x = jnp.zeros((1, 500, 23))
        p = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(p, x)
        assert y.shape == (1, 50, 16)

    def test_overfit(self, m2f_bb):
        model, params, audio, B, T = m2f_bb
        labels = np.zeros((B, 3, T), np.float32)
        labels[:, 0, 20:100] = 1
        labels[:, 1, 80:160] = 1

        import optax

        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                out = model.apply(p, audio, train=False)
                loss, _ = m2f_criterion(out, jnp.asarray(labels), CFG_BB)
                return loss

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state2 = tx.update(g, opt_state)
            return optax.apply_updates(params, up), opt_state2, loss

        losses = []
        p = params
        for _ in range(30):
            p, opt_state, loss = step(p, opt_state)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < 0.7 * losses[0], losses[::6]


class TestFastInstMatcher:
    """matcher='fastinst': the location cost forces a query whose peak
    confidence sits inside a target's active region to win that target."""

    def test_location_cost_steers_assignment(self):
        cfg = M2FConfig(
            num_queries=4, d_model=16, n_heads=2, d_ff=32, enc_layers=1, dec_layers=1,
            dropout=0.0, use_backbone=False, matcher="fastinst",
            class_weight=0.0, mask_weight=0.0, dice_weight=0.0,
        )
        T, S, Q = 40, 2, 4
        labels = np.zeros((1, S, T), np.float32)
        labels[0, 0, :20] = 1
        labels[0, 1, 20:] = 1
        # queries 0/1 peak inside speaker 1's region, 2/3 inside speaker 0's
        mask_logits = np.full((1, Q, T), -5.0, np.float32)
        mask_logits[0, 0, 30] = 5.0
        mask_logits[0, 1, 35] = 5.0
        mask_logits[0, 2, 5] = 5.0
        mask_logits[0, 3, 10] = 5.0
        outputs = dict(
            mask_logits=jnp.asarray(mask_logits),
            class_logits=jnp.zeros((1, Q)),
            aux_mask_logits=[], aux_class_logits=[],
        )
        # with zero class/mask/dice weights the location cost decides alone:
        # speaker 0 must match query 2 or 3, speaker 1 must match 0 or 1
        from speaker_diarization_tpu.ops.hungarian import hungarian_assign

        loss, aux = m2f_criterion(outputs, jnp.asarray(labels), cfg)
        assert np.isfinite(float(loss))
        # reconstruct the assignment the criterion used via the same cost
        p = jax.nn.sigmoid(outputs["mask_logits"])
        loc = np.argmax(mask_logits, axis=-1)
        inside = labels[0][:, loc[0]].T  # (Q, S)
        cost = cfg.location_weight * (1.0 - inside)[None]
        assign = np.asarray(hungarian_assign(jnp.asarray(cost).transpose(0, 2, 1)))[0]
        assert assign[0] in (2, 3)  # speaker 0 ← a query peaking in [0, 20)
        assert assign[1] in (0, 1)  # speaker 1 ← a query peaking in [20, 40)

    def test_fastinst_trains(self):
        cfg = M2FConfig(
            num_queries=6, d_model=32, n_heads=2, d_ff=64, enc_layers=1, dec_layers=1,
            dropout=0.0, use_backbone=False, matcher="fastinst",
        )
        model = EENDM2FModel(cfg=cfg, frontend=None)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 30, 23)).astype(np.float32))
        labels = jnp.asarray((rng.random((2, 3, 30)) < 0.3).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)

        def loss_fn(p):
            out = model.apply(p, x)
            return m2f_criterion(out, labels, cfg)[0]

        loss, g = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
