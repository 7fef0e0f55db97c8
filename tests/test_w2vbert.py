"""w2v-BERT encoder: parity vs transformers oracle + TS-VAD integration."""

import numpy as np
import pytest


class TestW2vBertParity:
    @pytest.fixture(scope="class")
    def pair(self):
        import torch
        from transformers import Wav2Vec2BertConfig
        from transformers.models.wav2vec2_bert.modeling_wav2vec2_bert import Wav2Vec2BertModel

        torch.manual_seed(0)
        tc = Wav2Vec2BertConfig(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, feature_projection_input_dim=160,
            position_embeddings_type="relative_key", conv_depthwise_kernel_size=31,
            hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
            conformer_conv_dropout=0.0, hidden_act="swish", add_adapter=False,
        )
        tm = Wav2Vec2BertModel(tc)
        tm.eval()

        from speaker_diarization_tpu.models.w2vbert import W2vBertConfig, W2vBertModel
        from speaker_diarization_tpu.utils.torch_convert import w2vbert_torch_to_flax

        fm = W2vBertModel(cfg=W2vBertConfig(hidden_size=64, num_layers=2, num_heads=4, intermediate_size=128))
        params = w2vbert_torch_to_flax({k: v for k, v in tm.state_dict().items()})
        return tm, fm, params

    def test_matches_transformers(self, pair):
        import jax.numpy as jnp
        import torch

        tm, fm, params = pair
        x = np.random.default_rng(0).standard_normal((2, 50, 160)).astype(np.float32)
        with torch.no_grad():
            t_out = tm(torch.from_numpy(x)).last_hidden_state.numpy()
        f_out = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(f_out, t_out, atol=1e-4)

    def test_fbank_pairing(self):
        import jax.numpy as jnp

        from speaker_diarization_tpu.models.w2vbert import fbank_to_w2vbert_features

        fb = jnp.asarray(np.arange(2 * 7 * 4, dtype=np.float32).reshape(2, 7, 4))
        out = np.asarray(fbank_to_w2vbert_features(fb))
        assert out.shape == (2, 3, 8)
        np.testing.assert_array_equal(out[0, 0], np.arange(8))  # frames 0+1 concat


class TestTSVADW2vBert:
    def test_forward(self):
        import jax
        import jax.numpy as jnp

        from speaker_diarization_tpu.models import TSVADConfig, TSVADModel

        cfg = TSVADConfig(
            speech_encoder_type="w2vbert", w2vbert_layers=1, w2vbert_dim=64,
            transformer_ffn_embed_dim=128, num_transformer_layer=1,
        )
        model = TSVADModel(cfg=cfg)
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
        embs = jnp.asarray(rng.standard_normal((2, 4, 192)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), audio, embs, 50)
        logits = model.apply(v, audio, embs, 50)
        assert logits.shape == (2, 50, 4)
        assert np.isfinite(np.asarray(logits)).all()
