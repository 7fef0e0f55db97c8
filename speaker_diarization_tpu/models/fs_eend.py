"""FS-EEND: frame-streaming online EEND with masked attractor decoder.

Reference: `/root/reference/speaker_diarization/fs_eend/fs_eend.py:22-135`
(OnlineTransformerDADiarization) + `model.py:55-99` (label protocol):

- causal (delay-masked) transformer encoder over log-mel features;
- 1-D conv with `conv_delay` look-ahead, L2-normalized frame embeddings;
- attractor decoder: per-frame per-channel attractor tensor (B, T, C, D)
  initialized from [emb ‖ channel-index PE] and refined by fusion layers —
  causal self-attention along time (per channel) then self-attention across
  channels (per frame), post-norm;
- attractors L2-normalized; logits = emb · attractorᵀ per frame;
- channels: [silence, spk1..spkS (first-appearance order), non-speech pad].

Because every op is causal (with bounded look-ahead), offline masked
forward == frame-streaming output; no cache machinery is needed for
correctness, only for latency-optimized decode.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import features as F
from ..ops.losses import l2_normalize
from .eend import FrontendConfig
from .transformer import (
    TransformerEncoder,
    make_causal_mask,
    sinusoidal_position_encoding,
)


class FusionLayer(nn.Module):
    """Time-causal attention per channel + channel attention per frame + FF."""

    n_heads: int
    d_ff: int
    dropout: float = 0.1
    mask_delay: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, T, C, D = x.shape
        # time attention (per channel), causal with look-ahead mask_delay
        xt = x.transpose(0, 2, 1, 3).reshape(B * C, T, D)
        tmask = make_causal_mask(T, self.mask_delay)
        at = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout, dtype=self.dtype, name="time_attn"
        )(xt, xt, mask=tmask, deterministic=deterministic)
        xt = nn.LayerNorm(dtype=self.dtype, name="norm_t")(xt + nn.Dropout(self.dropout)(at, deterministic=deterministic))
        # channel attention (per frame), unmasked
        xc = xt.reshape(B, C, T, D).transpose(0, 2, 1, 3).reshape(B * T, C, D)
        ac = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout, dtype=self.dtype, name="spk_attn"
        )(xc, xc, deterministic=deterministic)
        xc = nn.LayerNorm(dtype=self.dtype, name="norm_c")(xc + nn.Dropout(self.dropout)(ac, deterministic=deterministic))
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ff1")(xc)
        h = nn.Dropout(self.dropout)(nn.relu(h), deterministic=deterministic)
        h = nn.Dense(D, dtype=self.dtype, name="ff2")(h)
        xc = nn.LayerNorm(dtype=self.dtype, name="norm_ff")(xc + nn.Dropout(self.dropout)(h, deterministic=deterministic))
        return xc.reshape(B, T, C, D)


class FSEENDModel(nn.Module):
    n_speakers: int = 2  # real speaker capacity; channels = n_speakers + 2
    d_model: int = 256
    enc_layers: int = 4
    dec_layers: int = 2
    n_heads: int = 4
    d_ff: int = 2048
    dec_d_ff: int = 512
    dropout: float = 0.1
    conv_delay: int = 9
    mask_delay: int = 0
    frontend: Optional[FrontendConfig] = FrontendConfig()
    dtype: jnp.dtype = jnp.float32

    @property
    def n_channels(self) -> int:
        return self.n_speakers + 2

    def setup(self):
        self.encoder = TransformerEncoder(
            d_model=self.d_model, n_layers=self.enc_layers, n_heads=self.n_heads,
            d_ff=self.d_ff, dropout=self.dropout, dtype=self.dtype,
        )
        self.lookahead_conv = nn.Conv(
            self.d_model, (2 * self.conv_delay + 1,), padding=[(self.conv_delay, self.conv_delay)],
            dtype=self.dtype, name="lookahead_conv",
        )
        self.convert = nn.Dense(self.d_model, dtype=self.dtype)
        self.fusion = [
            FusionLayer(
                n_heads=self.n_heads, d_ff=self.dec_d_ff, dropout=self.dropout,
                mask_delay=self.mask_delay, dtype=self.dtype, name=f"fusion_{i}",
            )
            for i in range(self.dec_layers)
        ]

    def __call__(self, x, frame_mask=None, deterministic: bool = True):
        """x: (B, samples) audio or (B, T, feat). → logits (B, T, n_channels),
        consistency embeddings (B, T, D)."""
        if self.frontend is not None and x.ndim == 2:
            fe = self.frontend
            x = F.eend_frontend_jax(
                x, x.shape[-1], fe.frame_size, fe.frame_shift, fe.sample_rate,
                fe.n_mels, fe.context_size, fe.subsampling, fe.mean_norm,
            )
        T = x.shape[1]
        cm = make_causal_mask(T, self.mask_delay)
        emb = self.encoder(x.astype(self.dtype), frame_mask=frame_mask, attn_mask=cm, deterministic=deterministic)
        emb = self.lookahead_conv(emb)
        emb = l2_normalize(emb)

        C = self.n_channels
        pe = jnp.asarray(sinusoidal_position_encoding(C, self.d_model), emb.dtype)  # (C, D)
        B = emb.shape[0]
        emb_b = jnp.broadcast_to(emb[:, :, None, :], (B, T, C, self.d_model))
        pe_b = jnp.broadcast_to(pe[None, None], (B, T, C, self.d_model))
        att = self.convert(jnp.concatenate([emb_b, pe_b], axis=-1))
        for layer in self.fusion:
            att = layer(att, deterministic)
        att = l2_normalize(att)

        logits = jnp.einsum("btd,btcd->btc", emb, att).astype(jnp.float32)
        if frame_mask is not None:
            logits = logits * frame_mask[..., None]
        return logits, emb.astype(jnp.float32)


def fs_eend_labels(labels: jnp.ndarray, frame_mask: jnp.ndarray | None = None):
    """Reference label protocol (fs_eend/model.py:62-79): channels sorted by
    first appearance, then [silence ‖ speakers ‖ zero-pad] → (B, T, S+2)."""
    B, T, S = labels.shape
    idx = jnp.arange(1, T + 1, dtype=jnp.float32)[None, :, None]
    first = jnp.where(labels > 0, idx * labels, jnp.inf).min(axis=1)  # (B, S)
    order = jnp.argsort(first, axis=-1)
    sorted_labels = jnp.take_along_axis(labels, order[:, None, :], axis=-1)
    silence = 1.0 - sorted_labels.max(axis=-1, keepdims=True)
    if frame_mask is not None:
        silence = silence * frame_mask[..., None]
    zero = jnp.zeros((B, T, 1), labels.dtype)
    return jnp.concatenate([silence, sorted_labels, zero], axis=-1)


def consistency_loss(emb: jnp.ndarray, channel_labels: jnp.ndarray, frame_mask=None) -> jnp.ndarray:
    """MSE between frame-embedding cosine map and label cosine map
    (reference fs_eend.py:57-70)."""
    en = l2_normalize(emb, eps=1e-6)
    amap = jnp.einsum("btd,bsd->bts", en, en)
    ln = l2_normalize(channel_labels, eps=1e-6)
    lmap = jnp.einsum("btc,bsc->bts", ln, ln)
    e = (amap - lmap) ** 2
    if frame_mask is not None:
        m = frame_mask[:, :, None] * frame_mask[:, None, :]
        return jnp.sum(e * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(e)
