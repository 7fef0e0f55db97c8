"""Native UMAP: the reference reduction (umap_clusterer.py's umap.UMAP
metric="cosine" step) implemented without the external package.

Checks the algorithm's pieces against their defining equations (smooth-kNN
calibration target, fuzzy-set symmetry, the (a, b) curve fit that umap-learn
computes with scipy) and the end behavior the pipeline relies on: cluster
structure surviving the reduction and the reduction amplifying separation on
a nonlinear manifold where PCA (the old fallback) does not.
"""

import numpy as np
import pytest

from speaker_diarization_tpu.infer.umap_native import (
    fit_ab,
    fuzzy_simplicial_set,
    smooth_knn,
    umap_embed,
)

pytestmark = pytest.mark.quick


def test_fit_ab_matches_umap_learn_reference_values():
    # umap-learn's find_ab_params(spread=1.0, min_dist=0.1) ≈ (1.577, 0.895)
    a, b = fit_ab(min_dist=0.1, spread=1.0)
    assert abs(a - 1.577) < 0.05
    assert abs(b - 0.895) < 0.03
    # min_dist=0.0 reference ≈ (1.929, 0.792)
    a0, b0 = fit_ab(min_dist=0.0, spread=1.0)
    assert abs(a0 - 1.929) < 0.07
    assert abs(b0 - 0.792) < 0.03


def test_smooth_knn_hits_log2k_target():
    rng = np.random.default_rng(0)
    knn_d = np.sort(rng.random((30, 10)) + 0.05, axis=1)
    rho, sigma = smooth_knn(knn_d)
    target = np.log2(10)
    for i in range(len(knn_d)):
        val = np.exp(-np.maximum(knn_d[i] - rho[i], 0.0) / sigma[i]).sum()
        assert abs(val - target) < 1e-3
    # rho is the nearest-neighbor distance (local connectivity 1)
    np.testing.assert_allclose(rho, knn_d[:, 0])


def test_fuzzy_simplicial_set_is_symmetric_probability():
    rng = np.random.default_rng(1)
    X = rng.standard_normal((40, 8))
    P = fuzzy_simplicial_set(X, n_neighbors=10)
    np.testing.assert_allclose(P, P.T, atol=1e-12)
    assert P.min() >= 0.0 and P.max() <= 1.0 + 1e-12
    # every point keeps its nearest neighbor at full membership
    assert (P.max(axis=1) > 0.99).all()


def _clusters(seed=0, n_per=30, dim=32):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((3, dim)) * 3.0
    X = np.concatenate([c + 0.3 * rng.standard_normal((n_per, dim)) for c in centers])
    y = np.repeat(np.arange(3), n_per)
    return X, y


def test_cluster_structure_survives_reduction():
    X, y = _clusters()
    Z = umap_embed(X, n_components=4, n_neighbors=10, n_epochs=150, seed=0)
    assert Z.shape == (len(X), 4)
    # within/between separation must be amplified, and k-means on Z must
    # recover the partition exactly
    from scipy.cluster.vq import kmeans2

    _, labels = kmeans2(Z, 3, minit="++", seed=2)
    # perfect purity up to permutation
    for c in range(3):
        vals, counts = np.unique(labels[y == c], return_counts=True)
        assert counts.max() == (y == c).sum()


def test_deterministic_for_fixed_seed():
    X, _ = _clusters(seed=3)
    Z1 = umap_embed(X, n_components=3, n_epochs=50, seed=7)
    Z2 = umap_embed(X, n_components=3, n_epochs=50, seed=7)
    np.testing.assert_array_equal(Z1, Z2)


def test_nonlinear_manifold_beats_pca():
    """Two interleaved half-moons lifted into 16-D by a random linear map +
    curvature terms: UMAP separates them for density clustering, PCA leaves
    them interleaved (the old fallback's failure mode)."""
    rng = np.random.default_rng(5)
    n = 80
    t = rng.random(n) * np.pi
    m1 = np.stack([np.cos(t), np.sin(t)], axis=1)
    m2 = np.stack([1.0 - np.cos(t), 0.35 - np.sin(t)], axis=1)
    X2 = np.concatenate([m1, m2]) + 0.04 * rng.standard_normal((2 * n, 2))
    y = np.repeat([0, 1], n)
    lift = rng.standard_normal((5, 16))
    feats = np.stack(
        [X2[:, 0], X2[:, 1], X2[:, 0] ** 2, X2[:, 1] ** 2, X2[:, 0] * X2[:, 1]], axis=1
    )
    X = feats @ lift + 0.01 * rng.standard_normal((2 * n, 16))

    from speaker_diarization_tpu.infer.hdbscan_native import hdbscan_cluster

    def purity(labels):
        ok = 0
        for c in np.unique(labels):
            if c < 0:
                continue
            vals, counts = np.unique(y[labels == c], return_counts=True)
            ok += counts.max()
        return ok / len(y)

    Zu = umap_embed(X, n_components=2, n_neighbors=12, metric="euclidean", n_epochs=200, seed=0)
    lab_u = hdbscan_cluster(Zu, min_cluster_size=20)
    # UMAP clusters are pure (a moon may split into arcs, but arcs never mix
    # moons); PCA leaves the manifolds interleaved and HDBSCAN mixes them
    assert purity(lab_u) > 0.97

    from sklearn.decomposition import PCA

    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    Zp = PCA(n_components=2).fit_transform(Xn)
    lab_p = hdbscan_cluster(Zp, min_cluster_size=20)
    assert purity(lab_p) < 0.8  # the old fallback's failure, by measurement


def test_density_cluster_runs_native_path_in_this_env():
    # umap isn't installed here, so density_cluster exercises umap_native
    try:
        import umap  # noqa: F401

        pytest.skip("external umap present; fallback not exercised")
    except ImportError:
        pass
    from speaker_diarization_tpu.infer.clustering import density_cluster

    X, y = _clusters(seed=9, n_per=20)
    labels = density_cluster(X, n_components=4, min_cluster_size=5)
    assert len(labels) == len(X)
    for c in range(3):
        vals, counts = np.unique(labels[y == c], return_counts=True)
        assert counts.max() == (y == c).sum()
