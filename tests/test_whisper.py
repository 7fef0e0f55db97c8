"""Whisper encoder: parity vs transformers torch WhisperEncoder."""

import numpy as np
import pytest


class TestWhisperEncoderParity:
    @pytest.fixture(scope="class")
    def pair(self):
        import torch
        from transformers import WhisperConfig
        from transformers.models.whisper.modeling_whisper import WhisperEncoder as TorchWhisperEncoder

        torch.manual_seed(0)
        tcfg = WhisperConfig(
            num_mel_bins=24, d_model=64, encoder_layers=2, encoder_attention_heads=4,
            encoder_ffn_dim=128, max_source_positions=200,
        )
        tm = TorchWhisperEncoder(tcfg)
        tm.eval()

        from speaker_diarization_tpu.models.whisper_encoder import WhisperEncoder, WhisperEncoderConfig
        from speaker_diarization_tpu.utils.torch_convert import whisper_torch_to_flax

        fm = WhisperEncoder(cfg=WhisperEncoderConfig(n_mels=24, n_ctx=200, d_model=64, n_heads=4, n_layers=2, d_ff=128))
        params = whisper_torch_to_flax({k: v for k, v in tm.state_dict().items()})
        return tm, fm, params

    def test_matches_transformers(self, pair):
        import jax
        import jax.numpy as jnp
        import torch

        tm, fm, params = pair
        rng = np.random.default_rng(0)
        mel = rng.standard_normal((2, 400, 24)).astype(np.float32)  # (B, T100, mels)
        with torch.no_grad():
            t_out = tm(torch.from_numpy(mel.transpose(0, 2, 1))).last_hidden_state.numpy()
        f_out = np.asarray(fm.apply({"params": params}, jnp.asarray(mel)))
        assert f_out.shape == t_out.shape == (2, 200, 64)
        np.testing.assert_allclose(f_out, t_out, atol=1e-4)

    def test_audio_frontend_runs(self, pair):
        import jax
        import jax.numpy as jnp

        _, fm, params = pair
        audio = jnp.asarray(np.random.default_rng(1).standard_normal((1, 64000)).astype(np.float32) * 0.1)
        out = fm.apply({"params": params}, audio)
        assert out.shape[0] == 1 and out.shape[2] == 64
        assert np.isfinite(np.asarray(out)).all()
