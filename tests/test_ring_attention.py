"""Ring attention: exactness vs full attention on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.parallel import make_mesh
from speaker_diarization_tpu.parallel.ring_attention import ring_self_attention


def full_attention(q, k, v):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (q.shape[-1] ** -0.5)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


class TestRingAttention:
    @pytest.mark.parametrize("T", [64, 128])
    def test_matches_full_attention(self, T):
        mesh = make_mesh(n_data=8)
        rng = np.random.default_rng(0)
        B, H, D = 2, 4, 16
        q = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, T, H, D)).astype(np.float32))
        ref = np.asarray(full_attention(q, k, v))
        out = np.asarray(ring_self_attention(q, k, v, mesh))
        np.testing.assert_allclose(out, ref, atol=5e-5)

    def test_jit_and_grad(self):
        mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((1, 32, 2, 8)).astype(np.float32))

        @jax.jit
        def loss(q):
            out = ring_self_attention(q, q, q, mesh)
            return jnp.sum(out**2)

        g = jax.grad(loss)(q)
        assert g.shape == q.shape
        assert np.isfinite(np.asarray(g)).all()
        # numerical gradient check on one element
        eps = 1e-3
        q2 = q.at[0, 5, 1, 3].add(eps)
        fd = (float(loss(q2)) - float(loss(q))) / eps
        np.testing.assert_allclose(float(g[0, 5, 1, 3]), fd, rtol=0.05)
