"""Whisper audio encoder (flax) + whisper-style log-mel front-end.

Reference: `egs/alimeeting/ts_vad2/whisper_encoder.py` (OpenAI Whisper
AudioEncoder used as a TS-VAD speech encoder): log-mel (80×, 10 ms hop) →
conv k3 + GELU → conv k3 stride 2 + GELU → +sinusoidal positions → N
pre-norm residual attention blocks (k-proj without bias) → final LN;
frame rate 50 Hz. Conversion from official/transformers checkpoints via
utils/torch_convert.whisper_torch_to_flax; parity tested against the
transformers torch implementation in tests/test_whisper.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import features as F


@dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    n_ctx: int = 1500  # max frames after conv stride 2 (30 s)
    d_model: int = 512  # base
    n_heads: int = 8
    n_layers: int = 6
    d_ff: int = 2048


def whisper_log_mel(audio: jnp.ndarray, n_mels: int = 80, sample_rate: int = 16000) -> jnp.ndarray:
    """Whisper's log-mel: stft(400/160, hann) → slaney mel → log10 with
    dynamic-range clamp → (x + 4) / 4 normalization. (B, N) → (B, T, n_mels)."""
    n_frames = F.count_frames(audio.shape[-1], 160)
    frames = F.frame_signal_jax(audio.astype(jnp.float32), 400, 160, n_frames)
    pspec = F.power_spectrum_jax(frames, 400)
    mel = jnp.asarray(F.mel_filterbank(sample_rate, 512, n_mels))
    m = jnp.matmul(pspec, mel.T, precision=jax.lax.Precision.HIGHEST)
    logspec = jnp.log10(jnp.maximum(m, 1e-10))
    logspec = jnp.maximum(logspec, jnp.max(logspec, axis=(-2, -1), keepdims=True) - 8.0)
    return (logspec + 4.0) / 4.0


class WhisperAttention(nn.Module):
    n_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, D = x.shape
        H = self.n_heads
        hd = D // H
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3) * (hd ** -0.25)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3) * (hd ** -0.25)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(jnp.einsum("bhtd,bhsd->bhts", q, k), axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", w, v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class WhisperEncoderBlock(nn.Module):
    cfg: WhisperEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="attn_ln")(x)
        x = x + WhisperAttention(self.cfg.n_heads, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_ln")(x)
        h = nn.Dense(self.cfg.d_ff, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.cfg.d_model, dtype=self.dtype, name="fc2")(h)


class WhisperEncoder(nn.Module):
    """When layer_st/layer_ed are set, returns the reference's multi-layer
    feature: hidden states of blocks layer_st..layer_ed (inclusive, the
    OUTPUT of each block as in ts_vad2/whisper_encoder.py:236-240)
    concatenated along features and
    LayerNorm'd (ln_post2) — output dim d_model·(layer_ed-layer_st+1).
    Set layer_concat_ln=False to skip ln_post2 (parity testing vs HF
    hidden_states)."""

    cfg: WhisperEncoderConfig = WhisperEncoderConfig()
    layer_st: int = -1  # first block whose hidden state is collected
    layer_ed: int = -1  # last block (inclusive); both -1 → plain final output
    layer_concat_ln: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_or_audio):
        """mel (B, T100, n_mels) or audio (B, N) → (B, T50, d_model)
        — or (B, T50, d_model·n_collected) in layer-concat mode."""
        c = self.cfg
        if mel_or_audio.ndim == 2:
            mel = whisper_log_mel(mel_or_audio, c.n_mels)
        else:
            mel = mel_or_audio
        h = nn.Conv(c.d_model, (3,), padding=1, dtype=self.dtype, name="conv1")(mel.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(c.d_model, (3,), strides=(2,), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.gelu(h, approximate=False)
        from .transformer import sinusoidal_position_encoding

        pe = self.param(
            "embed_positions",
            lambda k: jnp.asarray(sinusoidal_position_encoding(c.n_ctx, c.d_model)),
        )
        h = h + pe[None, : h.shape[1]].astype(h.dtype)
        collect = self.layer_st >= 0 and self.layer_ed >= self.layer_st
        collected = []
        for i in range(c.n_layers):
            h = WhisperEncoderBlock(c, dtype=self.dtype, name=f"block_{i}")(h)
            if collect and self.layer_st <= i <= self.layer_ed:
                collected.append(h)  # output of block i
        if collect:
            if self.layer_ed >= c.n_layers:
                raise ValueError(f"layer_ed {self.layer_ed} >= n_layers {c.n_layers}")
            cat = jnp.concatenate(collected, axis=-1)
            if self.layer_concat_ln:
                cat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post2")(cat)
            return cat
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(h)
