"""DiariZen-trainer parity features: AutoClip percentile gradient clipping,
NaN-batch skipping, early stopping (reference trainer_single_opt.py:34-40,
60-61, 147)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.train.trainer import (
    Trainer,
    TrainerConfig,
    auto_clip_by_percentile,
)


class TestAutoClip:
    def test_matches_numpy_percentile(self):
        q, H = 50.0, 8
        tx = auto_clip_by_percentile(q, history_size=H)
        params = {"w": jnp.zeros(3)}
        state = tx.init(params)
        norms = [3.0, 1.0, 4.0, 1.5, 9.0, 2.6, 5.0, 3.5, 8.0, 7.0]
        hist = []
        for g in norms:
            grads = {"w": jnp.array([g, 0.0, 0.0])}
            updates, state = tx.update(grads, state)
            hist.append(g)
            window = hist[-H:] if len(hist) <= H else None
            # ring buffer: once full, it holds the last H in ring order —
            # percentile is order-independent, so compare against the set
            ring = hist if len(hist) <= H else hist[-H:]
            # our ring overwrites oldest, so contents = last H values
            clip = np.percentile(ring, q)
            expected_scale = min(1.0, clip / g)
            got = float(updates["w"][0]) / g
            assert got == pytest.approx(expected_scale, rel=1e-5), (g, ring)

    def test_never_amplifies(self):
        tx = auto_clip_by_percentile(90.0, history_size=4)
        state = tx.init({"w": jnp.zeros(1)})
        for g in [0.1, 10.0, 0.1]:
            updates, state = tx.update({"w": jnp.array([g])}, state)
            assert abs(float(updates["w"][0])) <= g + 1e-6


def _quadratic_trainer(**cfg_kwargs):
    def loss_fn(params, batch, rng, train):
        loss = jnp.sum((params["w"] - batch["target"]) ** 2) * batch["scale"]
        return loss, {}

    cfg = TrainerConfig(schedule="const", learning_rate=0.1, optimizer="sgd",
                        grad_clip_norm=None, **cfg_kwargs)
    return Trainer(loss_fn, cfg)


class TestSkipNonfinite:
    def test_nan_batch_leaves_params_untouched(self):
        tr = _quadratic_trainer(skip_nonfinite=True)
        state = tr.init_state({"w": jnp.array([1.0, 2.0])})
        good = {"target": np.zeros(2, np.float32), "scale": np.float32(1.0)}
        bad = {"target": np.zeros(2, np.float32), "scale": np.float32(np.nan)}
        state, _ = tr.train_step(state, good)
        w_before = np.asarray(state.params["w"]).copy()
        state, aux = tr.train_step(state, bad)
        np.testing.assert_array_equal(np.asarray(state.params["w"]), w_before)
        assert not np.isfinite(float(aux["loss"]))
        # training continues normally afterwards
        state, aux = tr.train_step(state, good)
        assert np.isfinite(float(aux["loss"]))
        assert not np.array_equal(np.asarray(state.params["w"]), w_before)

    def test_without_flag_nan_propagates(self):
        tr = _quadratic_trainer(skip_nonfinite=False)
        state = tr.init_state({"w": jnp.array([1.0])})
        bad = {"target": np.zeros(1, np.float32), "scale": np.float32(np.nan)}
        state, _ = tr.train_step(state, bad)
        assert not np.isfinite(float(np.asarray(state.params["w"])[0]))


class TestEarlyStop:
    def test_stops_on_plateau(self, tmp_path):
        from speaker_diarization_tpu.train.loop import run_training

        tr = _quadratic_trainer()
        state = tr.init_state({"w": jnp.array([5.0])})
        good = {"target": np.zeros(1, np.float32), "scale": np.float32(0.0)}  # zero grads

        def make_train_iter(epoch):
            return iter([good] * 50)

        def make_valid_iter():
            return iter([good])  # constant valid loss → plateau

        state = run_training(
            tr, state, make_train_iter, num_steps=1000,
            make_valid_iter=make_valid_iter, valid_every=10,
            log_every=1000, early_stop_patience=3,
        )
        # first validation sets best; 3 more non-improving → stop at step 40
        assert int(np.asarray(state.step)) == 40


class TestPrefetchIterator:
    def test_order_and_exhaustion(self):
        from speaker_diarization_tpu.train.loop import prefetch_iterator

        out = list(prefetch_iterator(iter(range(17)), depth=3))
        assert out == list(range(17))

    def test_exception_propagates(self):
        from speaker_diarization_tpu.train.loop import prefetch_iterator

        def gen():
            yield 1
            raise ValueError("boom")

        it = prefetch_iterator(gen(), depth=2)
        assert next(it) == 1
        import pytest as _pytest

        with _pytest.raises(ValueError, match="boom"):
            list(it)
