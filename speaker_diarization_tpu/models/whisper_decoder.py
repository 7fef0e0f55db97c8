"""Whisper text decoder (flax) + greedy conditioned generation.

Reference: `egs/mlc_slm/dicow/` — Diarization-Conditioned Whisper produces
speaker-attributed *text*: the DiCoW-conditioned encoder states (one stream
per speaker, built from the STNO masks) drive a standard Whisper decoder.
This module is the decoder half: token + learned-position embeddings → N
pre-LN blocks (causal self-attention, cross-attention over encoder states,
GELU MLP) → final LayerNorm → logits through the tied token embedding.

Conversion from transformers WhisperDecoder checkpoints via
utils/torch_convert.whisper_decoder_torch_to_flax; numerics parity-tested
against the torch implementation in tests/test_whisper_decoder.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WhisperDecoderConfig:
    vocab_size: int = 51865
    d_model: int = 512
    n_heads: int = 8
    n_layers: int = 6
    d_ff: int = 2048
    max_positions: int = 448


class _Attention(nn.Module):
    """Whisper attention: k-proj without bias, 1/sqrt(d) split as d**-0.25
    on q and k (same as the encoder's WhisperAttention)."""

    n_heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv=None, kv_mask=None):
        mem = x if kv is None else kv
        B, T, D = x.shape
        S = mem.shape[1]
        H = self.n_heads
        hd = D // H
        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(D, use_bias=False, dtype=self.dtype, name="k_proj")(mem)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(mem)
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3) * (hd**-0.25)
        k = k.reshape(B, S, H, hd).transpose(0, 2, 1, 3) * (hd**-0.25)
        v = v.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        w = jnp.einsum("bhtd,bhsd->bhts", q, k)
        if self.causal and kv is None:
            mask = jnp.tril(jnp.ones((T, S), bool))
            w = jnp.where(mask[None, None], w, -1e9)
        if kv_mask is not None:
            w = jnp.where(kv_mask[:, None, None, :], w, -1e9)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", w, v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class WhisperDecoderBlock(nn.Module):
    cfg: WhisperDecoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, enc, enc_mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="self_attn_ln")(x)
        x = x + _Attention(self.cfg.n_heads, causal=True, dtype=self.dtype, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="cross_attn_ln")(x)
        x = x + _Attention(self.cfg.n_heads, dtype=self.dtype, name="cross_attn")(h, kv=enc, kv_mask=enc_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_ln")(x)
        h = nn.Dense(self.cfg.d_ff, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.cfg.d_model, dtype=self.dtype, name="fc2")(h)


class WhisperDecoder(nn.Module):
    cfg: WhisperDecoderConfig = WhisperDecoderConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, enc, enc_mask=None, position_offset: int = 0):
        """tokens (B, U) int32, enc (B, T, D) encoder states →
        logits (B, U, vocab) through the tied token embedding."""
        c = self.cfg
        embed = nn.Embed(c.vocab_size, c.d_model, dtype=self.dtype, name="embed_tokens")
        pos = self.param(
            "embed_positions", nn.initializers.normal(0.02), (c.max_positions, c.d_model)
        )
        U = tokens.shape[1]
        h = embed(tokens) + pos[None, position_offset : position_offset + U].astype(self.dtype)
        for i in range(c.n_layers):
            h = WhisperDecoderBlock(c, dtype=self.dtype, name=f"block_{i}")(h, enc, enc_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(h)
        return embed.attend(h.astype(jnp.float32)).astype(jnp.float32)


def greedy_decode(
    decoder: WhisperDecoder,
    params,
    enc: jnp.ndarray,
    start_tokens: np.ndarray,
    max_new_tokens: int,
    eos_id: int,
) -> np.ndarray:
    """Greedy conditioned generation: re-scores the growing prefix each step
    (toy scale; a KV-cache ring decode is the production path for long
    transcripts). Returns (B, U_start + max_new_tokens) token ids, padded
    with eos after it is emitted."""
    tokens = np.asarray(start_tokens, np.int32)
    B = tokens.shape[0]
    done = np.zeros((B,), bool)

    @jax.jit
    def step(toks, enc):
        logits = decoder.apply({"params": params}, toks, enc)
        return jnp.argmax(logits[:, -1], axis=-1)

    for _ in range(max_new_tokens):
        nxt = np.asarray(step(jnp.asarray(tokens), enc))
        nxt = np.where(done, eos_id, nxt)
        tokens = np.concatenate([tokens, nxt[:, None].astype(np.int32)], axis=1)
        done |= nxt == eos_id
        if done.all():
            break
    return tokens
