"""w2v-BERT 2.0 conformer encoder (flax) — the reference's best-DER encoder.

Reference: TS-VAD `speech_encoder_type=w2v-bert2` (model.py:418-448,
831-841): 80-dim fbank reshaped (T, 160) at 50 Hz → feature projection →
conformer layers. Architecture per the transformers
`Wav2Vec2BertModel` (the oracle in tests/test_w2vbert.py): macaron FFN
halves (swish), self-attention with 'relative_key' Shaw-style distance
embeddings (clamped [-left_max, right_max]), causal depthwise conv module
with GLU and per-channel LayerNorm, post final LayerNorm.

Pretrained facebook/w2v-bert-2.0 checkpoints load via
utils/torch_convert.w2vbert_torch_to_flax.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class W2vBertConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    feature_input_dim: int = 160  # 2 × 80 fbank bins
    conv_kernel: int = 31
    left_max_pos: int = 64
    right_max_pos: int = 8


def swish(x):
    return x * jax.nn.sigmoid(x)


class W2vBertFFN(nn.Module):
    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="intermediate_dense")(x)
        h = swish(h)
        return nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="output_dense")(h)


class W2vBertAttention(nn.Module):
    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None):
        c = self.cfg
        B, T, D = x.shape
        H = c.num_heads
        hd = D // H
        q = nn.Dense(D, dtype=self.dtype, name="linear_q")(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = nn.Dense(D, dtype=self.dtype, name="linear_k")(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = nn.Dense(D, dtype=self.dtype, name="linear_v")(x).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(hd)
        # Shaw-style relative-key bias
        n_emb = c.left_max_pos + c.right_max_pos + 1
        dist_emb = self.param("distance_embedding", nn.initializers.normal(0.02), (n_emb, hd))
        dist = np.clip(np.arange(T)[None, :] - np.arange(T)[:, None], -c.left_max_pos, c.right_max_pos)
        pe = jnp.asarray(dist_emb)[jnp.asarray(dist + c.left_max_pos)]  # (T, T, hd)
        rel = jnp.einsum("bhld,lrd->bhlr", q, pe.astype(q.dtype))
        scores = scores + rel / np.sqrt(hd)
        if padding_mask is not None:
            scores = jnp.where(padding_mask[:, None, None, :], jnp.finfo(scores.dtype).min, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="linear_out")(out)


class W2vBertConvModule(nn.Module):
    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        D = c.hidden_size
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        h = nn.Conv(2 * D, (1,), use_bias=False, dtype=self.dtype, name="pointwise_conv1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU over channels
        h = jnp.pad(h, ((0, 0), (c.conv_kernel - 1, 0), (0, 0)))  # causal
        h = nn.Conv(D, (c.conv_kernel,), padding="VALID", feature_group_count=D, use_bias=False, dtype=self.dtype, name="depthwise_conv")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="depthwise_layer_norm")(h)
        h = swish(h)
        return nn.Conv(D, (1,), use_bias=False, dtype=self.dtype, name="pointwise_conv2")(h)


class W2vBertLayer(nn.Module):
    cfg: W2vBertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ffn1_layer_norm")(x)
        x = x + 0.5 * W2vBertFFN(self.cfg, dtype=self.dtype, name="ffn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")(x)
        x = x + W2vBertAttention(self.cfg, dtype=self.dtype, name="self_attn")(h, padding_mask)
        x = x + W2vBertConvModule(self.cfg, dtype=self.dtype, name="conv_module")(x)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ffn2_layer_norm")(x)
        x = x + 0.5 * W2vBertFFN(self.cfg, dtype=self.dtype, name="ffn2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)


class W2vBertModel(nn.Module):
    cfg: W2vBertConfig = W2vBertConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, padding_mask=None, output_layer: int | None = None):
        """features (B, T50, feature_input_dim) — 80-d fbank pairs — →
        hidden states (B, T50, hidden_size)."""
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="fp_layer_norm")(features.astype(self.dtype))
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fp_projection")(h)
        n = output_layer if output_layer is not None else self.cfg.num_layers
        for i in range(n):
            h = W2vBertLayer(self.cfg, dtype=self.dtype, name=f"layer_{i}")(h, padding_mask)
        return h


def fbank_to_w2vbert_features(fbank: jnp.ndarray) -> jnp.ndarray:
    """(B, T100, 80) fbank → (B, T100//2, 160) paired features
    (reference model.py:831-834 reshape)."""
    B, T, Fd = fbank.shape
    T2 = T // 2
    return fbank[:, : 2 * T2].reshape(B, T2, 2 * Fd)
