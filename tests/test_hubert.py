"""HuBERT/wav2vec2 support: transformers parity through the WavLM trunk
(relative_position_embedding=False — the architecture minus gated rel bias)."""

import numpy as np
import pytest


class TestHubertParity:
    def test_matches_transformers(self):
        import jax
        import jax.numpy as jnp
        import torch
        from transformers import HubertConfig
        from transformers.models.hubert.modeling_hubert import HubertModel

        torch.manual_seed(0)
        tc = HubertConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
            conv_dim=[32] * 7, do_stable_layer_norm=False, feat_extract_norm="group",
            hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            feat_proj_dropout=0.0, layerdrop=0.0, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
        )
        tm = HubertModel(tc)
        tm.eval()

        from speaker_diarization_tpu.models.wavlm import WavLMFlaxConfig, WavLMModel
        from speaker_diarization_tpu.utils.torch_convert import hubert_torch_to_flax

        conv_layers = tuple((32, k, s) for k, s in zip([10, 3, 3, 3, 3, 2, 2], [5, 2, 2, 2, 2, 2, 2]))
        fm = WavLMModel(
            cfg=WavLMFlaxConfig(
                encoder_layers=2, encoder_embed_dim=64, encoder_ffn_embed_dim=128,
                encoder_attention_heads=4, conv_feature_layers=conv_layers,
                conv_pos=16, conv_pos_groups=4,
                relative_position_embedding=False, gru_rel_pos=False,
            )
        )
        params = hubert_torch_to_flax({k: v for k, v in tm.state_dict().items()})
        x = np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32) * 0.1
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x)).last_hidden_state.numpy()
        f_out = np.asarray(fm.apply({"params": params}, jnp.asarray(x), method=fm.extract_features))
        np.testing.assert_allclose(f_out, t_out, atol=1e-4)
