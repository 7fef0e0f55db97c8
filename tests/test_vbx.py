"""VBx Bayesian-HMM resegmentation: model recovery + PLDA estimation."""

import numpy as np

from speaker_diarization_tpu.infer.vbx import (
    Plda,
    estimate_plda,
    forward_backward_log,
    vbx,
    vbx_resegment,
)


def _synthetic_sequence(rng, n_spk=3, T=240, D=16, n_informative=8, seg=40):
    """Embeddings from the VBx generative model with a block speaker path."""
    phi = np.zeros(D)
    phi[:n_informative] = rng.uniform(4.0, 9.0, n_informative)
    z = rng.standard_normal((n_spk, D)) * np.sqrt(phi)
    path = np.array([(t // seg) % n_spk for t in range(T)])
    X = z[path] + rng.standard_normal((T, D))
    return X, path, phi


class TestForwardBackward:
    def test_matches_brute_force_two_state(self):
        rng = np.random.default_rng(0)
        T, S = 6, 2
        log_p = rng.standard_normal((T, S))
        tr = np.array([[0.8, 0.2], [0.3, 0.7]])
        pi = np.array([0.6, 0.4])
        gamma, ll, _, _ = forward_backward_log(log_p, np.log(tr), np.log(pi))
        # brute force over all 2^6 paths
        from itertools import product

        probs = np.zeros((T, S))
        total = 0.0
        for path in product(range(S), repeat=T):
            p = pi[path[0]] * np.exp(log_p[0, path[0]])
            for t in range(1, T):
                p *= tr[path[t - 1], path[t]] * np.exp(log_p[t, path[t]])
            total += p
            for t in range(T):
                probs[t, path[t]] += p
        np.testing.assert_allclose(np.exp(ll), total, rtol=1e-10)
        np.testing.assert_allclose(gamma, probs / total, atol=1e-10)


class TestVbx:
    def test_recovers_speaker_path(self):
        rng = np.random.default_rng(1)
        X, path, phi = _synthetic_sequence(rng)
        res = vbx(X, phi, loop_prob=0.95, max_speakers=6, max_iters=25, seed=2)
        # map each true speaker to the dominant inferred label; accuracy > 95%
        acc = 0
        for s in range(3):
            vals, counts = np.unique(res.labels[path == s], return_counts=True)
            acc += counts.max()
        assert acc / len(path) > 0.95
        # redundant speakers collapse: at most 3 labels carry mass
        assert (res.pi > 0.05).sum() <= 3
        assert res.elbos[-1] >= res.elbos[0]

    def test_resegment_fixes_noisy_init(self):
        rng = np.random.default_rng(3)
        X, path, phi = _synthetic_sequence(rng, n_spk=2, T=160, seg=40)
        # corrupt 25% of an oracle init
        noisy = path.copy()
        flip = rng.choice(len(path), size=len(path) // 4, replace=False)
        noisy[flip] = 1 - noisy[flip]
        plda = Plda(mu=np.zeros(X.shape[1]), tr=np.eye(X.shape[1]), psi=phi)
        labels, res = vbx_resegment(X, noisy, plda, loop_prob=0.95, fa=1.0, fb=1.0)
        err_before = (noisy != path).mean()
        err_after = min((labels != path).mean(), (labels == path).mean())  # label perm
        assert err_after < 0.05 < err_before

    def test_estimate_plda_whitens(self):
        rng = np.random.default_rng(4)
        D, n_spk, per = 12, 20, 30
        between = rng.uniform(1.0, 5.0, D)
        means = rng.standard_normal((n_spk, D)) * np.sqrt(between)
        A = rng.standard_normal((D, D)) * 0.3 + np.eye(D)  # within-class shaping
        X = np.concatenate([means[s] + rng.standard_normal((per, D)) @ A.T for s in range(n_spk)])
        y = np.repeat(np.arange(n_spk), per)
        plda = estimate_plda(X, y)
        Xt = plda.transform(X)
        # within-class covariance in the transformed space ≈ identity
        W = np.zeros((D, D))
        for s in range(n_spk):
            xc = Xt[y == s] - Xt[y == s].mean(axis=0)
            W += xc.T @ xc
        W /= len(X)
        np.testing.assert_allclose(W, np.eye(D), atol=0.25)
        assert (np.diff(plda.psi) <= 1e-9).all()  # descending
