"""WavLM SSL speech encoder (flax), with gated relative position bias.

Reference: `egs/alimeeting/ts_vad2/wavlm.py` + `modules.py` (fairseq-style,
torch): 7-layer conv waveform extractor (20 ms frames @50 Hz) → projection →
conv positional embedding (k=128, 16 groups, weight-normed) → 12 post-norm
transformer layers with T5-bucket relative attention bias computed once
(layer 0's embedding) and per-layer GRU-style gating (WavLM's
`gru_rel_pos`). `extract_features(..., ret_layer_results=True)` returns all
layer outputs for the TS-VAD weight-sum variant (model.py:517).

Pretrained WavLM-Base+ checkpoints load through
utils/torch_convert.wavlm_torch_to_flax (weight-norm folded at conversion);
numerical parity vs the reference torch module is tested in
tests/test_wavlm.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WavLMFlaxConfig:
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_embed_dim: int = 3072
    encoder_attention_heads: int = 12
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 2, 2), (512, 2, 2),
    )
    conv_pos: int = 128
    conv_pos_groups: int = 16
    relative_position_embedding: bool = True
    num_buckets: int = 320
    max_distance: int = 800
    gru_rel_pos: bool = True
    normalize: bool = False  # Base+: False; Large: True
    dropout: float = 0.1


def relative_position_bucket(relative_positions: np.ndarray, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5 bidirectional bucketing (modules.py:417-447), host-side (static T)."""
    nb = num_buckets // 2
    out = (relative_positions > 0).astype(np.int64) * nb
    rp = np.abs(relative_positions)
    max_exact = nb // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact) / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(is_small, rp, large)


class ConvFeatureExtractor(nn.Module):
    layers: Tuple[Tuple[int, int, int], ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, N) waveform → (B, T50, 512)
        h = x[:, :, None]
        for i, (dim, k, stride) in enumerate(self.layers):
            h = nn.Conv(dim, (k,), strides=(stride,), padding="VALID", use_bias=False, dtype=self.dtype, name=f"conv_{i}")(h)
            if i == 0:
                # 'default' extractor mode: GroupNorm with d groups on layer 0
                h = nn.GroupNorm(num_groups=dim, epsilon=1e-5, dtype=self.dtype, name="gn0")(h)
            h = nn.gelu(h, approximate=False)
        return h


class WavLMAttention(nn.Module):
    """Self-attention with shared rel-pos bias + per-layer GRU gating."""

    n_heads: int
    gru_rel_pos: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_bias=None, padding_mask=None):
        B, T, D = x.shape
        H = self.n_heads
        hd = D // H
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k)
        if pos_bias is not None:
            bias = pos_bias[None]  # (1, H, T, T)
            if self.gru_rel_pos:
                grep_a = self.param("grep_a", nn.initializers.ones, (1, H, 1, 1))
                # NOTE: the reference computes the gate from the RAW layer
                # input reshaped per head (modules.py:533-543), not from the
                # projected query
                xq = x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # (B, H, T, hd)
                g = nn.Dense(8, dtype=self.dtype, name="grep_linear")(xq)
                g = g.reshape(B, H, T, 2, 4).sum(-1)
                gate = jax.nn.sigmoid(g)
                gate_a, gate_b = gate[..., 0:1], gate[..., 1:2]
                gate_a_1 = gate_a * (gate_b * grep_a - 1.0) + 2.0  # (B, H, T, 1)
                bias = gate_a_1 * bias
            logits = logits + bias
        if padding_mask is not None:
            neg = jnp.finfo(logits.dtype).min
            logits = jnp.where(padding_mask[:, None, None, :], neg, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class WavLMEncoderLayer(nn.Module):
    cfg: WavLMFlaxConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos_bias=None, padding_mask=None):
        # post-norm (layer_norm_first=False, the Base+ setting)
        h = WavLMAttention(self.cfg.encoder_attention_heads, self.cfg.gru_rel_pos, dtype=self.dtype, name="self_attn")(
            x, pos_bias, padding_mask
        )
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_layer_norm")(x + h)
        h = nn.Dense(self.cfg.encoder_ffn_embed_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.encoder_embed_dim, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x + h)


class WavLMModel(nn.Module):
    cfg: WavLMFlaxConfig = WavLMFlaxConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.feature_extractor = ConvFeatureExtractor(c.conv_feature_layers, dtype=self.dtype)
        self.layer_norm_feats = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")
        self.post_extract_proj = nn.Dense(c.encoder_embed_dim, dtype=self.dtype)
        # conv positional embedding (weight-norm folded into the kernel at
        # conversion time)
        self.pos_conv = nn.Conv(
            c.encoder_embed_dim, (c.conv_pos,), padding=[(c.conv_pos // 2, c.conv_pos // 2)],
            feature_group_count=c.conv_pos_groups, dtype=self.dtype, name="pos_conv",
        )
        self.encoder_layer_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.encoder_layers_mods = [
            WavLMEncoderLayer(c, dtype=self.dtype, name=f"layer_{i}") for i in range(c.encoder_layers)
        ]
        if c.relative_position_embedding:
            self.rel_bias_emb = self.param(
                "relative_attention_bias", nn.initializers.xavier_normal(), (c.num_buckets, c.encoder_attention_heads)
            )

    def _pos_bias(self, T: int):
        if not self.cfg.relative_position_embedding:
            return None
        buckets = relative_position_bucket(
            np.arange(T)[None, :] - np.arange(T)[:, None], self.cfg.num_buckets, self.cfg.max_distance
        )
        return jnp.asarray(self.rel_bias_emb)[jnp.asarray(buckets)].transpose(2, 0, 1)  # (H, T, T)

    def extract_features(
        self,
        source: jnp.ndarray,
        output_layer: Optional[int] = None,
        ret_layer_results: bool = False,
        padding_mask: Optional[jnp.ndarray] = None,
    ):
        """source (B, N) waveform → (B, T50, D); optionally all layer outputs
        (reference WavLM.extract_features, wavlm.py:359-434)."""
        c = self.cfg
        if c.normalize:
            mu = jnp.mean(source, axis=-1, keepdims=True)
            sd = jnp.std(source, axis=-1, keepdims=True)
            source = (source - mu) / (sd + 1e-5)
        feats = self.feature_extractor(source.astype(self.dtype))  # (B, T, 512)
        feats = self.layer_norm_feats(feats)
        x = self.post_extract_proj(feats)

        # conv positional embedding (SamePad: drop the trailing frame for
        # even kernels)
        pc = self.pos_conv(x)
        if c.conv_pos % 2 == 0:
            pc = pc[:, : x.shape[1]]
        x = x + nn.gelu(pc, approximate=False)
        x = self.encoder_layer_norm(x)

        pos_bias = self._pos_bias(x.shape[1])
        n_layers = output_layer if output_layer is not None else c.encoder_layers
        layer_results: List[jnp.ndarray] = [x]
        for layer in self.encoder_layers_mods[:n_layers]:
            x = layer(x, pos_bias, padding_mask)
            layer_results.append(x)
        if ret_layer_results:
            return x, layer_results
        return x

    def __call__(self, source, padding_mask=None):
        return self.extract_features(source, padding_mask=padding_mask)
