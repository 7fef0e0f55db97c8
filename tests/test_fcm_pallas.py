"""FCM whole-head Pallas kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.kernels.fcm_pallas import (
    fcm_pallas,
    fcm_xla_folded,
    prepare_fcm_params,
)
from speaker_diarization_tpu.models.campplus import FCM


@pytest.fixture(scope="module")
def fcm_setup():
    rng = np.random.default_rng(0)
    fb = jnp.asarray(rng.standard_normal((2, 200, 80)).astype(np.float32))
    fcm = FCM(dtype=jnp.float32)
    vars_ = fcm.init(jax.random.PRNGKey(0), fb, False)
    ref = fcm.apply(vars_, fb, False)
    return fb, vars_, ref


class TestFCMPallas:
    def test_f32_parity_exact(self, fcm_setup):
        fb, vars_, ref = fcm_setup
        flat = prepare_fcm_params(vars_["params"], vars_["batch_stats"], dtype=jnp.float32)
        out = fcm_pallas(fb, tuple(flat), dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_bf16_parity(self, fcm_setup):
        fb, vars_, ref = fcm_setup
        flat = prepare_fcm_params(vars_["params"], vars_["batch_stats"])
        out = fcm_pallas(fb, tuple(flat), dtype=jnp.bfloat16, interpret=True)
        # bf16 rounding of weights+activations; same order as the bf16 XLA path
        assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.05

    def test_xla_folded_f32_parity(self, fcm_setup):
        """The production TPU path (tap-folded XLA form) matches the module."""
        fb, vars_, ref = fcm_setup
        flat = prepare_fcm_params(vars_["params"], vars_["batch_stats"], dtype=jnp.float32)
        out = fcm_xla_folded(fb, tuple(flat), dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_xla_folded_bf16_parity(self, fcm_setup):
        fb, vars_, ref = fcm_setup
        flat = prepare_fcm_params(vars_["params"], vars_["batch_stats"])
        out = fcm_xla_folded(fb, tuple(flat), dtype=jnp.bfloat16)
        assert float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref))) < 0.05

    def test_under_enclosing_jit(self, fcm_setup):
        """prepare_fcm_params must trace (weights arrive as jit tracers in
        the fused TS-VAD inference path)."""
        fb, vars_, ref = fcm_setup

        @jax.jit
        def run(fb, params, stats):
            flat = prepare_fcm_params(params, stats, dtype=jnp.float32)
            return fcm_pallas(fb, tuple(flat), dtype=jnp.float32, interpret=True)

        out = run(fb, vars_["params"], vars_["batch_stats"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)
