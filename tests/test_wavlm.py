"""WavLM flax: numerical parity with the reference torch implementation."""

import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference/egs/alimeeting/ts_vad2"


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DIR, "wavlm.py")), reason="reference not mounted")
class TestWavLMParity:
    @pytest.fixture(scope="class")
    def pair(self):
        import importlib.util

        import torch

        if REF_DIR not in sys.path:
            sys.path.insert(0, REF_DIR)  # wavlm.py imports `modules`
        spec = importlib.util.spec_from_file_location("ref_wavlm", os.path.join(REF_DIR, "wavlm.py"))
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        torch.manual_seed(0)
        cfg = ref.WavLMConfig(
            dict(
                encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
                encoder_attention_heads=4, relative_position_embedding=True, num_buckets=32,
                max_distance=80, gru_rel_pos=True, dropout=0.0, attention_dropout=0.0,
                activation_dropout=0.0, encoder_layerdrop=0.0, dropout_input=0.0,
                dropout_features=0.0, conv_pos=16, conv_pos_groups=4,
            )
        )
        tm = ref.WavLM(cfg)
        tm.eval()

        from speaker_diarization_tpu.models.wavlm import WavLMFlaxConfig, WavLMModel
        from speaker_diarization_tpu.utils.torch_convert import wavlm_torch_to_flax

        fcfg = WavLMFlaxConfig(
            encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
            encoder_attention_heads=4, num_buckets=32, max_distance=80, conv_pos=16, conv_pos_groups=4,
        )
        fm = WavLMModel(cfg=fcfg)
        params = wavlm_torch_to_flax({k: v for k, v in tm.state_dict().items()})
        return tm, fm, params

    def test_extract_features_matches(self, pair):
        import jax.numpy as jnp
        import torch

        tm, fm, params = pair
        x = np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32) * 0.1
        with torch.no_grad():
            (t_out, t_layers), _ = tm.extract_features(torch.from_numpy(x), output_layer=2, ret_layer_results=True)
        f_out, f_layers = fm.apply({"params": params}, jnp.asarray(x), 2, True, method=fm.extract_features)
        np.testing.assert_allclose(np.asarray(f_out), t_out.numpy(), atol=1e-4)
        assert len(f_layers) == len(t_layers) == 3
        for tl, fl in zip(t_layers, f_layers):
            np.testing.assert_allclose(np.asarray(fl), tl[0].transpose(0, 1).numpy(), atol=1e-4)

    def test_frame_rate(self, pair):
        import jax.numpy as jnp

        _, fm, params = pair
        x = np.zeros((1, 16000), np.float32)
        out = fm.apply({"params": params}, jnp.asarray(x), method=fm.extract_features)
        # 1 s of 16 kHz audio → ~49 frames at 50 Hz (conv edge trimming)
        assert 48 <= out.shape[1] <= 50
