"""Parity: fused CAM++ inference path vs the standard flax modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.kernels.cam_block_fused import (
    cam_dense_block_infer,
    campplus_frames_fused,
    prepare_block_params,
)
from speaker_diarization_tpu.models.campplus import CAMDenseTDNNBlock, CAMPPlus

pytestmark = pytest.mark.quick


class TestFusedBlock:
    @pytest.mark.parametrize("dilation", [1, 2])
    def test_block_matches_flax(self, dilation):
        B, T, C0, L = 2, 200, 64, 3
        block = CAMDenseTDNNBlock(
            num_layers=L, out_channels=32, bn_channels=128,
            kernel_size=3, dilation=dilation,
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, T, C0)).astype(np.float32))
        variables = block.init(jax.random.PRNGKey(0), x, False)
        # non-trivial running stats
        stats = jax.tree_util.tree_map(
            lambda v: v + 0.1 * jnp.arange(v.shape[-1], dtype=v.dtype) / v.shape[-1],
            variables["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": stats}
        ref = block.apply(variables, x, False)
        bp = prepare_block_params(variables["params"], variables["batch_stats"], L, C0, C0 + L * 32)
        got = cam_dense_block_infer(x, bp, dilation, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)

    def test_whole_encoder_matches(self):
        model = CAMPPlus(block_layers=(2, 3), block_dilations=(1, 2))
        rng = np.random.default_rng(1)
        fb = jnp.asarray(rng.standard_normal((2, 200, 80)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), fb, False, "frames")
        ref = model.apply(variables, fb, False, "frames")
        got = campplus_frames_fused(model, variables, fb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-3)

    def test_bf16_close(self):
        model = CAMPPlus(block_layers=(2, 2), block_dilations=(1, 2), dtype=jnp.bfloat16)
        rng = np.random.default_rng(2)
        fb = jnp.asarray(rng.standard_normal((2, 200, 80)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), fb, False, "frames")
        ref = np.asarray(model.apply(variables, fb, False, "frames")).astype(np.float32)
        got = np.asarray(campplus_frames_fused(model, variables, fb)).astype(np.float32)
        # bf16 paths reorder reductions; activations are O(1)
        assert np.mean(np.abs(got - ref)) < 5e-2, np.mean(np.abs(got - ref))


class TestPallasBlock:
    def test_interpret_parity(self):
        """Single-kernel Pallas block (interpret mode on CPU) vs flax."""
        from speaker_diarization_tpu.kernels.cam_block_pallas import cam_dense_block_pallas

        B, T, C0, L, dil = 8, 200, 64, 3, 2
        block = CAMDenseTDNNBlock(
            num_layers=L, out_channels=32, bn_channels=128, kernel_size=3, dilation=dil
        )
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((B, T, C0)).astype(np.float32))
        v = block.init(jax.random.PRNGKey(0), x, False)
        stats = jax.tree_util.tree_map(lambda t: t + 0.1, v["batch_stats"])
        v = {"params": v["params"], "batch_stats": stats}
        ref = block.apply(v, x, False)
        bp = prepare_block_params(v["params"], v["batch_stats"], L, C0, C0 + L * 32)
        got = cam_dense_block_pallas(x, bp, dil, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)

    def test_ragged_batch_falls_back(self):
        from speaker_diarization_tpu.kernels.cam_block_pallas import cam_dense_block_pallas

        B, T, C0, L = 3, 200, 64, 2  # B % 4 != 0 → XLA fallback
        block = CAMDenseTDNNBlock(num_layers=L, out_channels=32, bn_channels=128, kernel_size=3, dilation=1)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((B, T, C0)).astype(np.float32))
        v = block.init(jax.random.PRNGKey(0), x, False)
        bp = prepare_block_params(v["params"], v["batch_stats"], L, C0, C0 + L * 32)
        ref = block.apply(v, x, False)
        got = cam_dense_block_pallas(x, bp, 1, dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)


class TestBlockSplit:
    def test_split_chain_equals_single_kernel(self):
        """SDT_BLOCK_SPLIT=1 splits a block's layer chain into two pallas
        calls (VMEM-driven batch-tile planning); the chained result must
        equal both the XLA reference and the unsplit kernel."""
        import os

        import flax.linen  # noqa: F401
        import jax
        import jax.numpy as jnp
        import numpy as np

        from speaker_diarization_tpu.kernels.cam_block_fused import (
            cam_dense_block_infer, prepare_block_params,
        )
        from speaker_diarization_tpu.kernels.cam_block_pallas import cam_dense_block_pallas
        from speaker_diarization_tpu.models.campplus import CAMDenseTDNNBlock

        rng = np.random.default_rng(0)
        B, T, c0, L = 4, 200, 64, 8
        c_max = c0 + 32 * L
        blk = CAMDenseTDNNBlock(num_layers=L, out_channels=32, bn_channels=128, kernel_size=3, dilation=2)
        x = jnp.asarray(rng.standard_normal((B, T, c0)).astype(np.float32))
        vars_ = blk.init(jax.random.PRNGKey(0), x, False)
        bp = prepare_block_params(vars_["params"], vars_["batch_stats"], L, c0, c_max)
        ref = cam_dense_block_infer(x, bp, 2, dtype=jnp.float32)
        os.environ["SDT_BLOCK_SPLIT"] = "1"
        try:
            split = cam_dense_block_pallas(x, bp, 2, dtype=jnp.float32, interpret=True)
        finally:
            del os.environ["SDT_BLOCK_SPLIT"]
        np.testing.assert_allclose(np.asarray(split), np.asarray(ref), atol=2e-4)
