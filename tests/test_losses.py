"""PIT loss tests: vectorized TPU formulation vs brute-force oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from speaker_diarization_tpu.ops import losses as L
from speaker_diarization_tpu.ops import metrics as M

pytestmark = pytest.mark.quick


def _case(B=3, T=20, C=3, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 2
    labels = (rng.random((B, T, C)) < 0.3).astype(np.float32)
    return logits, labels


class TestPitLoss:
    @pytest.mark.parametrize("C", [2, 3, 4])
    def test_matches_bruteforce(self, C):
        logits, labels = _case(B=4, T=25, C=C, seed=C)
        loss, labels_perm, perm = L.pit_loss(jnp.asarray(logits), jnp.asarray(labels))
        # oracle: sum over batch of per-sample min mean-CE * T / total frames
        tot, perms = 0.0, []
        for b in range(logits.shape[0]):
            l, p = L.pit_loss_bruteforce_reference(logits[b], labels[b])
            tot += l
            perms.append(p)
        expect = tot / (logits.shape[0] * logits.shape[1])
        np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
        for b, p in enumerate(perms):
            np.testing.assert_array_equal(np.asarray(perm)[b], np.asarray(p))

    def test_permuted_labels_consistent(self):
        logits, labels = _case(seed=7)
        _, labels_perm, perm = L.pit_loss(jnp.asarray(logits), jnp.asarray(labels))
        lp, pm = np.asarray(labels_perm), np.asarray(perm)
        for b in range(3):
            np.testing.assert_array_equal(lp[b], labels[b][:, pm[b]])

    def test_perfect_prediction_lowest(self):
        _, labels = _case(seed=3)
        logits = (labels * 2 - 1) * 20.0  # near-perfect confidence
        loss, _, perm = L.pit_loss(jnp.asarray(logits), jnp.asarray(labels))
        assert float(loss) < 1e-6
        np.testing.assert_array_equal(np.asarray(perm), np.tile(np.arange(3), (3, 1)))

    def test_finds_permutation(self):
        _, labels = _case(B=1, seed=4)
        swapped = labels[..., [1, 2, 0]]
        logits = (swapped * 2 - 1) * 20.0
        loss, labels_perm, _ = L.pit_loss(jnp.asarray(logits), jnp.asarray(labels))
        assert float(loss) < 1e-6
        np.testing.assert_array_equal(np.asarray(labels_perm)[0], swapped[0])

    def test_frame_mask(self):
        logits, labels = _case(B=2, T=30, seed=5)
        mask = np.ones((2, 30), np.float32)
        mask[:, 20:] = 0
        loss_m, _, _ = L.pit_loss(jnp.asarray(logits), jnp.asarray(labels), frame_mask=jnp.asarray(mask))
        loss_t, _, _ = L.pit_loss(jnp.asarray(logits[:, :20]), jnp.asarray(labels[:, :20]))
        np.testing.assert_allclose(float(loss_m), float(loss_t), rtol=1e-5)

    def test_spk_mask_restricts_perms(self):
        # sample with 2 real speakers out of C=3: channel 2 padded (zeros)
        rng = np.random.default_rng(6)
        labels = np.zeros((1, 10, 3), np.float32)
        labels[0, :, :2] = (rng.random((10, 2)) < 0.5).astype(np.float32)
        # predictions match labels but with first two channels swapped
        swapped = labels[..., [1, 0, 2]]
        logits = (swapped * 2 - 1) * 20.0
        spk_mask = np.array([[1, 1, 0]], np.float32)
        loss, _, perm = L.pit_loss(jnp.asarray(logits), jnp.asarray(labels), spk_mask=jnp.asarray(spk_mask))
        # best perm must keep channel 2 mapped to channel 2 (identity on padding)
        assert np.asarray(perm)[0, 2] == 2
        assert float(loss) < 1e-2  # padded channel trained to silence => tiny

    def test_jit_and_grad(self):
        import jax

        logits, labels = _case(seed=8)
        fn = jax.jit(lambda y, t: L.pit_loss(y, t)[0])
        g = jax.grad(fn)(jnp.asarray(logits), jnp.asarray(labels))
        assert np.isfinite(np.asarray(g)).all()
        assert g.shape == logits.shape


class TestAttractorLoss:
    def test_targets(self):
        # B=2, C=3 → logits over 4 attractors
        logits = jnp.asarray(np.full((2, 4), 10.0, np.float32))
        spk = jnp.asarray(np.array([[1, 1, 0], [1, 1, 1]], np.float32))
        # sample 0: targets 1,1,0 on first 3; sample 1: 1,1,1,0
        loss = L.attractor_existence_loss(logits, spk)
        # all-positive logits: correct positions ~0 loss, the "0" targets cost ~10
        assert 2 * 10.0 / 7 * 0.95 < float(loss) < 2 * 10.0 / 7 * 1.05


class TestStandardBce:
    def test_matches_manual(self):
        logits, labels = _case(B=2, T=8, C=2, seed=9)
        loss = L.standard_bce(jnp.asarray(logits), jnp.asarray(labels))
        p = 1 / (1 + np.exp(-logits.astype(np.float64)))
        manual = -(labels * np.log(p) + (1 - labels) * np.log(1 - p)).mean()
        np.testing.assert_allclose(float(loss), manual, rtol=1e-5)


class TestMetrics:
    def test_perfect(self):
        _, labels = _case(seed=10)
        logits = (labels * 2 - 1) * 10
        stats = M.diarization_error_stats(jnp.asarray(logits), jnp.asarray(labels))
        assert int(stats["diarization_error"]) == 0
        assert float(M.der_from_stats(stats)) == 0.0

    def test_counts_match_reference_semantics(self):
        rng = np.random.default_rng(11)
        logits = rng.standard_normal((2, 50, 3)).astype(np.float32)
        labels = (rng.random((2, 50, 3)) < 0.3).astype(np.float32)
        stats = M.diarization_error_stats(jnp.asarray(logits), jnp.asarray(labels))
        # reference per-sample computation (eend/loss.py:70-103)
        dec = (1 / (1 + np.exp(-logits)) > 0.5).astype(int)
        lab = labels.astype(int)
        n_ref, n_sys = lab.sum(-1), dec.sum(-1)
        assert int(stats["speech_scored"]) == int((n_ref > 0).sum())
        assert int(stats["speaker_miss"]) == int(np.maximum(n_ref - n_sys, 0).sum())
        assert int(stats["speaker_falarm"]) == int(np.maximum(n_sys - n_ref, 0).sum())
        n_map = ((lab == 1) & (dec == 1)).sum(-1)
        assert int(stats["speaker_error"]) == int((np.minimum(n_ref, n_sys) - n_map).sum())
