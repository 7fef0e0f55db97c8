"""Native HDBSCAN*: correctness on variable-density data where flat DBSCAN
(the old fallback) fails, and integration through density_cluster."""

import numpy as np
import pytest

from speaker_diarization_tpu.infer.hdbscan_native import hdbscan_cluster

pytestmark = pytest.mark.quick


def _ari(a, b):
    """Adjusted Rand index (tiny self-contained implementation)."""
    a = np.asarray(a)
    b = np.asarray(b)
    n = len(a)
    ua, ub = np.unique(a), np.unique(b)
    C = np.zeros((len(ua), len(ub)), np.int64)
    for i, x in enumerate(ua):
        for j, y in enumerate(ub):
            C[i, j] = int(((a == x) & (b == y)).sum())
    comb = lambda x: x * (x - 1) // 2  # noqa: E731
    sum_ij = comb(C).sum()
    sum_a = comb(C.sum(1)).sum()
    sum_b = comb(C.sum(0)).sum()
    exp = sum_a * sum_b / comb(n)
    mx = (sum_a + sum_b) / 2
    return (sum_ij - exp) / (mx - exp) if mx != exp else 1.0


def _variable_density_data(seed=0):
    """Three Gaussian clusters with ~10× different scales + uniform noise —
    no single DBSCAN eps separates them."""
    rng = np.random.default_rng(seed)
    tight1 = rng.normal([0, 0], 0.05, (60, 2))
    tight2 = rng.normal([1.0, 1.0], 0.05, (60, 2))
    loose = rng.normal([8.0, -6.0], 1.2, (80, 2))
    noise = rng.uniform([-5, -12], [14, 6], (20, 2))
    X = np.concatenate([tight1, tight2, loose, noise])
    y = np.concatenate([np.zeros(60), np.ones(60), np.full(80, 2), np.full(20, -1)])
    return X, y


class TestHdbscanNative:
    def test_simple_blobs(self):
        rng = np.random.default_rng(1)
        X = np.concatenate([rng.normal(0, 0.1, (40, 3)), rng.normal(3, 0.1, (40, 3))])
        labels = hdbscan_cluster(X, min_cluster_size=5)
        assert len(np.unique(labels[labels >= 0])) == 2
        assert _ari(labels, np.repeat([0, 1], 40)) > 0.95

    def test_variable_density_beats_flat_dbscan(self):
        X, y = _variable_density_data()
        labels = hdbscan_cluster(X, min_cluster_size=10)
        core = y >= 0
        ari_h = _ari(labels[core], y[core])
        assert ari_h > 0.9, ari_h

        # the old fallback (single-eps DBSCAN, same heuristic as before)
        from sklearn.cluster import DBSCAN

        d = np.median(np.linalg.norm(X - X.mean(0), axis=1)) * 0.5 + 1e-9
        flat = DBSCAN(eps=d, min_samples=10).fit_predict(X)
        ari_d = _ari(flat[core], y[core])
        assert ari_d < 0.75, ari_d  # merges the tight pair into one cluster
        assert ari_h > ari_d + 0.2

    def test_noise_gets_minus_one(self):
        X, y = _variable_density_data(2)
        labels = hdbscan_cluster(X, min_cluster_size=10)
        assert (labels == -1).any()

    def test_degenerate_sizes(self):
        assert hdbscan_cluster(np.zeros((0, 2))).shape == (0,)
        assert (hdbscan_cluster(np.random.default_rng(0).normal(size=(3, 2)), 4) == 0).all()


class TestDensityClusterIntegration:
    def test_density_cluster_uses_reference_algorithm(self):
        """density_cluster (PCA front, no UMAP in this env) now runs real
        HDBSCAN*: variable-density speaker embeddings separate correctly."""
        from speaker_diarization_tpu.infer.clustering import density_cluster

        rng = np.random.default_rng(3)
        d = 32
        c1 = rng.normal(0, 1, d)
        c2 = rng.normal(0, 1, d)
        c3 = rng.normal(0, 1, d)
        X = np.concatenate([
            c1 + rng.normal(0, 0.01, (50, d)),
            c2 + rng.normal(0, 0.01, (50, d)),
            c3 + rng.normal(0, 0.40, (60, d)),  # much looser cluster
        ])
        labels = density_cluster(X, min_cluster_size=10)
        y = np.repeat([0, 1, 2], [50, 50, 60])
        # outliers are reassigned to nearest centroid inside density_cluster
        assert _ari(labels, y) > 0.85, _ari(labels, y)
