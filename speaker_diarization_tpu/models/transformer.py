"""Transformer encoder stack (flax.linen), the shared trunk of the EEND family.

Architecturally equivalent to the reference encoder
(`/root/reference/speaker_diarization/eend_eda/models.py:26-125` — input
linear + LayerNorm → post-norm torch TransformerEncoderLayers → head), but
TPU-first: batched static shapes, bf16 compute dtype with f32 params,
explicit attention masks for padding/causal/chunk-streaming, and optional
`jax.checkpoint` rematerialization per layer.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_position_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Standard sine/cosine positional table (reference models.py:129-155)."""
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def make_padding_mask(frame_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) validity → (B, 1, T, T) attention mask (True = attend)."""
    m = frame_mask.astype(bool)
    return (m[:, None, :, None] & m[:, None, None, :])


def make_causal_mask(T: int, delay: int = 0) -> jnp.ndarray:
    """(1, 1, T, T) causal mask with optional look-ahead `delay` frames."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    return (j <= i + delay)[None, None]


def make_chunk_mask(T: int, chunk_size: int, num_left_chunks: int = -1) -> jnp.ndarray:
    """WeNet-style chunk attention mask (reference ts_vad2_streaming/mask.py:137).

    Frames may attend within their chunk and to `num_left_chunks` previous
    chunks (-1 = all history). Returns (1, 1, T, T) boolean.
    """
    idx = jnp.arange(T)
    chunk_of = idx // chunk_size
    ci = chunk_of[:, None]
    cj = chunk_of[None, :]
    ok = cj <= ci
    if num_left_chunks >= 0:
        ok = ok & (cj >= ci - num_left_chunks)
    return ok[None, None]


class FeedForward(nn.Module):
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_model = x.shape[-1]
        h = nn.Dense(self.d_ff, dtype=self.dtype)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(d_model, dtype=self.dtype)(h)


class TransformerEncoderLayer(nn.Module):
    """Post-norm encoder layer (torch nn.TransformerEncoderLayer semantics).

    Besides the full-sequence `__call__`, `streaming()` runs the same
    parameters in cache-attention form (Q = current chunk, KV = cached
    window ‖ chunk) for chunk-by-chunk decoding.
    """

    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # names match the previous nn.compact auto-naming for checkpoint
        # stability
        self.attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dropout_rate=self.dropout,
            dtype=self.dtype,
            name="MultiHeadDotProductAttention_0",
        )
        self.ln1 = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_0")
        self.ff = FeedForward(self.d_ff, self.dropout, self.dtype, name="FeedForward_0")
        self.ln2 = nn.LayerNorm(dtype=self.dtype, name="LayerNorm_1")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = self.attn(x, x, mask=mask, deterministic=deterministic)
        x = self.ln1(x + self.drop(attn, deterministic=deterministic))
        ff = self.ff(x, deterministic)
        x = self.ln2(x + self.drop(ff, deterministic=deterministic))
        return x

    def streaming(self, x_q, x_kv, mask=None):
        """Chunk decode: queries = x_q (B, C, D), keys/values = x_kv
        (B, L+C, D); mask (B, 1, C, L+C) marks valid KV columns."""
        attn = self.attn(x_q, x_kv, mask=mask, deterministic=True)
        x = self.ln1(x_q + attn)
        ff = self.ff(x, True)
        return self.ln2(x + ff)


class TransformerEncoder(nn.Module):
    """Input projection + LayerNorm + N post-norm self-attention layers.

    No positional encoding by default (EEND finding: permutation-free frames
    work better; reference has_pos=False default). `remat=True` wraps each
    layer in jax.checkpoint to trade FLOPs for HBM.
    """

    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    d_ff: int = 2048
    dropout: float = 0.1
    has_pos: bool = False
    max_len: int = 8192
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frame_mask=None, attn_mask=None, deterministic: bool = True):
        """(B, T, in_dim) → (B, T, d_model).

        frame_mask: (B, T) 1=valid; attn_mask: extra (1|B, 1, T, T) boolean
        (e.g. causal/chunk) combined with the padding mask.
        """
        mask = None
        if frame_mask is not None:
            mask = make_padding_mask(frame_mask)
        if attn_mask is not None:
            mask = attn_mask if mask is None else (mask & attn_mask)

        h = nn.Dense(self.d_model, dtype=self.dtype, name="input_proj")(x)
        h = nn.LayerNorm(dtype=self.dtype, name="input_norm")(h)
        if self.has_pos:
            pe = jnp.asarray(sinusoidal_position_encoding(self.max_len, self.d_model), dtype=h.dtype)
            h = h + pe[None, : h.shape[1]]

        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(2,))
        for i in range(self.n_layers):
            h = layer_cls(
                n_heads=self.n_heads, d_ff=self.d_ff, dropout=self.dropout, dtype=self.dtype, name=f"layer_{i}"
            )(h, mask, deterministic)
        if frame_mask is not None:
            h = h * frame_mask[..., None].astype(h.dtype)
        return h
