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


class TestWhisperLayerConcat:
    """Multi-layer concat feature (reference whisper_encoder.py:236-243):
    outputs of blocks layer_st..layer_ed concatenated, then ln_post2."""

    def test_concat_matches_transformers_hidden_states(self):
        import torch
        import jax.numpy as jnp
        from transformers import WhisperConfig
        from transformers.models.whisper.modeling_whisper import WhisperEncoder as TorchWhisperEncoder

        from speaker_diarization_tpu.models.whisper_encoder import WhisperEncoder, WhisperEncoderConfig
        from speaker_diarization_tpu.utils.torch_convert import whisper_torch_to_flax

        torch.manual_seed(0)
        tcfg = WhisperConfig(
            num_mel_bins=24, d_model=64, encoder_layers=4, encoder_attention_heads=4,
            encoder_ffn_dim=128, max_source_positions=200,
        )
        tm = TorchWhisperEncoder(tcfg)
        tm.eval()
        # HF's hidden_states[-1] is post-final-LayerNorm, so stop at the
        # second-to-last block where hidden_states[i+1] is the raw block output
        st, ed = 0, 2
        fm = WhisperEncoder(
            cfg=WhisperEncoderConfig(n_mels=24, n_ctx=200, d_model=64, n_heads=4, n_layers=4, d_ff=128),
            layer_st=st, layer_ed=ed, layer_concat_ln=False,
        )
        params = whisper_torch_to_flax({k: v for k, v in tm.state_dict().items()})
        mel = np.random.default_rng(0).standard_normal((2, 400, 24)).astype(np.float32)
        with torch.no_grad():
            hs = tm(torch.from_numpy(mel.transpose(0, 2, 1)), output_hidden_states=True).hidden_states
        # hidden_states[i+1] is the output of block i
        t_cat = np.concatenate([hs[i + 1].numpy() for i in range(st, ed + 1)], axis=-1)
        f_cat = np.asarray(fm.apply({"params": params}, jnp.asarray(mel)))
        assert f_cat.shape == t_cat.shape == (2, 200, 64 * 3)
        np.testing.assert_allclose(f_cat, t_cat, atol=1e-4)

    def test_ln_variant_is_layernorm_of_concat(self):
        import jax
        import jax.numpy as jnp

        from speaker_diarization_tpu.models.whisper_encoder import WhisperEncoder, WhisperEncoderConfig

        cfg = WhisperEncoderConfig(n_mels=24, n_ctx=50, d_model=32, n_heads=2, n_layers=3, d_ff=64)
        mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 100, 24)).astype(np.float32))
        raw = WhisperEncoder(cfg=cfg, layer_st=0, layer_ed=2, layer_concat_ln=False)
        p = raw.init(jax.random.PRNGKey(0), mel)["params"]
        cat = np.asarray(raw.apply({"params": p}, mel))
        ln = WhisperEncoder(cfg=cfg, layer_st=0, layer_ed=2, layer_concat_ln=True)
        p_ln = jax.tree_util.tree_map(lambda x: x, dict(p))
        p_ln["ln_post2"] = {"scale": jnp.ones((cat.shape[-1],)), "bias": jnp.zeros((cat.shape[-1],))}
        out = np.asarray(ln.apply({"params": p_ln}, mel))
        mu = cat.mean(-1, keepdims=True)
        var = cat.var(-1, keepdims=True)
        np.testing.assert_allclose(out, (cat - mu) / np.sqrt(var + 1e-5), atol=2e-5)
