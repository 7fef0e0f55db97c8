"""Conformer encoder blocks (macaron FF + MHSA + conv module).

Used by SSND (reference ssnd_model.py:173 SSNDConformerEncoder) and as the
EEND-EDA encoder_type='conformer' option (eend_eda/models.py:495-504, which
wraps torchaudio's Conformer). Standard structure per block:
½FF → MHSA (+abs-pos) → depthwise conv module (GLU, BN, swish) → ½FF → LN.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .transformer import sinusoidal_position_encoding


class ConformerConvModule(nn.Module):
    """conv_norm='batch' mirrors torchaudio's BatchNorm1d (stateful:
    batch_stats collection, trainer needs has_mutable). conv_norm='group'
    is the stateless GroupNorm alternative — identical train/eval graphs,
    no mutable collections, the right choice for loss paths without
    batch_stats plumbing."""

    kernel_size: int = 15
    dropout: float = 0.1
    conv_norm: str = "batch"  # batch | group
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(2 * d, dtype=self.dtype, name="pw1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(d, (self.kernel_size,), padding=[(pad, pad)], feature_group_count=d, dtype=self.dtype, name="dw")(h)
        if self.conv_norm == "batch":
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn")(h)
        else:
            h = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="gn")(h)
        h = h * nn.sigmoid(h)  # swish
        h = nn.Dense(d, dtype=self.dtype, name="pw2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=not train)


class ConformerBlock(nn.Module):
    n_heads: int = 4
    d_ff: int = 1024
    conv_kernel: int = 15
    dropout: float = 0.1
    conv_norm: str = "batch"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        d = x.shape[-1]

        def ff(x, name):
            h = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln")(x)
            h = nn.Dense(self.d_ff, dtype=self.dtype, name=f"{name}_1")(h)
            h = h * nn.sigmoid(h)
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
            h = nn.Dense(d, dtype=self.dtype, name=f"{name}_2")(h)
            return nn.Dropout(self.dropout)(h, deterministic=not train)

        x = x + 0.5 * ff(x, "ff1")
        h = nn.LayerNorm(dtype=self.dtype, name="mhsa_ln")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout, dtype=self.dtype, name="mhsa"
        )(h, h, mask=mask, deterministic=not train)
        x = x + nn.Dropout(self.dropout)(h, deterministic=not train)
        x = x + ConformerConvModule(self.conv_kernel, self.dropout, self.conv_norm, self.dtype, name="conv")(x, train)
        x = x + 0.5 * ff(x, "ff2")
        return nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)


class ConformerEncoder(nn.Module):
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    d_ff: int = 1024
    conv_kernel: int = 15
    dropout: float = 0.1
    conv_norm: str = "batch"
    has_pos: bool = True
    max_len: int = 8192
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, frame_mask=None, train: bool = False):
        from .transformer import make_padding_mask

        h = nn.Dense(self.d_model, dtype=self.dtype, name="input_proj")(x)
        if self.has_pos:
            pe = jnp.asarray(sinusoidal_position_encoding(self.max_len, self.d_model), h.dtype)
            h = h + pe[None, : h.shape[1]]
        mask = make_padding_mask(frame_mask) if frame_mask is not None else None
        for i in range(self.n_layers):
            h = ConformerBlock(
                n_heads=self.n_heads, d_ff=self.d_ff, conv_kernel=self.conv_kernel,
                dropout=self.dropout, conv_norm=self.conv_norm, dtype=self.dtype, name=f"block_{i}",
            )(h, mask, train)
        if frame_mask is not None:
            h = h * frame_mask[..., None].astype(h.dtype)
        return h
