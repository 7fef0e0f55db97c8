"""Streaming TS-VAD: dynamic-chunk training + cache-based chunk decode.

Reference: `egs/alimeeting/ts_vad2_streaming/model.py` (WeNet-style):
fbank → Conv2d ×4 subsampling front-end → per-speaker [target ‖ frame]
single backend → downmix → multi backend, trained with chunked attention
masks (`mask.py:137 add_optional_chunk_mask`, static_chunk_size 64) and
decoded chunk-by-chunk with per-layer attention caches
(`forward_chunk_by_chunk`, model.py:368-462).

TPU-first streaming design: instead of torch KV-cache tensors threaded
through python loops, each layer caches its *input* window; streaming
attention is Q = current chunk over KV = [cache ‖ chunk] using the exact
same projection weights as training, so
  full forward with chunk mask == concatenated streaming chunk outputs
(validated in tests/test_streaming.py). The chunk loop is a lax.scan-able
jitted step with static shapes (fixed cache length = left_chunks · chunk).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import features as F
from .transformer import FeedForward, make_chunk_mask, sinusoidal_position_encoding


@dataclass(frozen=True)
class StreamingTSVADConfig:
    max_num_speaker: int = 4
    speaker_embed_dim: int = 192
    d_model: int = 384
    d_ff: int = 1536
    n_heads: int = 4
    n_layers: int = 2
    dropout: float = 0.1
    sample_rate: int = 16000
    label_rate: int = 25
    feat_dim: int = 80
    chunk_size: int = 16  # frames @25 Hz per attention chunk (0.64 s)
    num_left_chunks: int = 4  # history window in chunks


class Conv2dSubsampling4(nn.Module):
    """fbank (B, T100, F) → (B, T100//4, d_model): two stride-2 2-D convs
    (reference ts_vad2_streaming/model.py:1289 Subsampling4)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, Fd = x.shape
        h = x[..., None]  # (B, T, F, 1)
        h = nn.relu(nn.Conv(self.d_model // 4, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv1")(h))
        h = nn.relu(nn.Conv(self.d_model // 4, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype, name="conv2")(h))
        B2, T4, F4, C = h.shape
        h = h.reshape(B2, T4, F4 * C)
        return nn.Dense(self.d_model, dtype=self.dtype, name="out")(h)


class KVEncoderLayer(nn.Module):
    """Post-norm encoder layer with explicit Q/K/V projections so streaming
    decode can cache the *projected* keys/values per layer (the reference's
    WeNet `att_cache`, ts_vad2_streaming/model.py:368-462) instead of
    re-projecting the whole cached window every chunk — saves 2·L·D² FLOPs
    per layer per step."""

    d_model: int
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        h, dh = self.n_heads, self.d_model // self.n_heads
        self.q_proj = nn.DenseGeneral((h, dh), dtype=self.dtype, name="query")
        self.k_proj = nn.DenseGeneral((h, dh), dtype=self.dtype, name="key")
        self.v_proj = nn.DenseGeneral((h, dh), dtype=self.dtype, name="value")
        self.out = nn.DenseGeneral(self.d_model, axis=(-2, -1), dtype=self.dtype, name="out")
        self.ln1 = nn.LayerNorm(dtype=self.dtype)
        self.ff = FeedForward(self.d_ff, self.dropout, self.dtype)
        self.ln2 = nn.LayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def _attend(self, q, k, v, mask, deterministic):
        # q (B, Tq, H, Dh); k/v (B, Tk, H, Dh); mask (B|1, 1, Tq, Tk) bool
        dh = q.shape[-1]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(dh).astype(q.dtype)
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        w = self.drop(w, deterministic=deterministic)
        return self.out(jnp.einsum("bhqk,bkhd->bqhd", w, v))

    def __call__(self, x, mask=None, deterministic: bool = True):
        attn = self._attend(
            self.q_proj(x), self.k_proj(x), self.v_proj(x), mask, deterministic
        )
        x = self.ln1(x + self.drop(attn, deterministic=deterministic))
        ff = self.ff(x, deterministic)
        return self.ln2(x + self.drop(ff, deterministic=deterministic))

    def streaming(self, x_q, k_cache, v_cache, mask):
        """Decode one chunk against cached keys/values.

        x_q (B, C, D); k_cache/v_cache (B, L, H, Dh); mask (B, 1, C, L+C).
        Returns (out (B, C, D), k_new (B, C, H, Dh), v_new)."""
        q = self.q_proj(x_q)
        k_new, v_new = self.k_proj(x_q), self.v_proj(x_q)
        k = jnp.concatenate([k_cache, k_new], axis=1)
        v = jnp.concatenate([v_cache, v_new], axis=1)
        attn = self._attend(q, k, v, mask, deterministic=True)
        x = self.ln1(x_q + attn)
        ff = self.ff(x, True)
        return self.ln2(x + ff), k_new, v_new


class StreamingLayerStack(nn.Module):
    """Transformer stack usable both full-sequence (with chunk mask) and
    chunk-streaming (per-layer KV caches)."""

    d_model: int
    n_layers: int
    n_heads: int
    d_ff: int
    dropout: float
    max_len: int = 8192
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            KVEncoderLayer(
                d_model=self.d_model, n_heads=self.n_heads, d_ff=self.d_ff,
                dropout=self.dropout, dtype=self.dtype, name=f"layer_{i}"
            )
            for i in range(self.n_layers)
        ]
        self.pe = sinusoidal_position_encoding(self.max_len, self.d_model)

    def __call__(self, x, chunk_size: int = 0, num_left_chunks: int = -1, deterministic: bool = True):
        """Full-sequence forward; chunk_size>0 applies the chunked mask."""
        T = x.shape[1]
        x = x + jnp.asarray(self.pe, x.dtype)[None, :T]
        mask = make_chunk_mask(T, chunk_size, num_left_chunks) if chunk_size > 0 else None
        for layer in self.layers:
            x = layer(x, mask, deterministic)
        return x

    def init_cache(self, batch: int, cache_len: int) -> Tuple:
        """Per-layer (k, v) caches (B, cache_len, H, Dh), zeros."""
        h, dh = self.n_heads, self.d_model // self.n_heads
        return tuple(
            (
                jnp.zeros((batch, cache_len, h, dh), self.dtype),
                jnp.zeros((batch, cache_len, h, dh), self.dtype),
            )
            for _ in self.layers
        )

    def streaming_step(self, x_chunk, caches, pos: int | jnp.ndarray, cache_valid: jnp.ndarray):
        """One chunk through all layers with per-layer KV caches.

        x_chunk: (B, C, D); caches: tuple of ((B, L, H, Dh), (B, L, H, Dh));
        pos: absolute frame offset of the chunk; cache_valid: () int —
        number of valid cached frames (grows to L).
        Returns (out_chunk, new_caches).
        """
        B, C, D = x_chunk.shape
        L = caches[0][0].shape[1]
        pe = jnp.asarray(self.pe, x_chunk.dtype)
        x = x_chunk + jax.lax.dynamic_slice(pe, (pos, 0), (C, D))[None]
        # attention mask over [cache ‖ chunk]: cache cols valid iff index >=
        # L - cache_valid; chunk is causal-free (full intra-chunk attention,
        # matching the chunk mask used at training)
        col = jnp.arange(L + C)
        kv_valid = (col >= (L - cache_valid)) | (col >= L)
        mask = jnp.broadcast_to(kv_valid[None, None, None, :], (B, 1, C, L + C))
        new_caches = []
        for layer, (kc, vc) in zip(self.layers, caches):
            out, k_new, v_new = layer.streaming(x, kc, vc, mask)
            new_caches.append(
                (
                    jnp.concatenate([kc, k_new], axis=1)[:, -L:],
                    jnp.concatenate([vc, v_new], axis=1)[:, -L:],
                )
            )
            x = out
        return x, tuple(new_caches)


class StreamingTSVADModel(nn.Module):
    """Streaming TS-VAD (own front-end; CAM++-free, reference parity)."""

    cfg: StreamingTSVADConfig = StreamingTSVADConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.frontend = Conv2dSubsampling4(c.d_model, dtype=self.dtype)
        self.front_proj = nn.Dense(c.speaker_embed_dim, dtype=self.dtype)
        self.proj = nn.Dense(c.d_model, dtype=self.dtype) if c.speaker_embed_dim * 2 != c.d_model else None
        self.single_backend = StreamingLayerStack(
            d_model=c.d_model, n_layers=c.n_layers, n_heads=c.n_heads, d_ff=c.d_ff,
            dropout=c.dropout, dtype=self.dtype,
        )
        self.backend_down = nn.Dense(c.d_model, dtype=self.dtype)
        self.multi_backend = StreamingLayerStack(
            d_model=c.d_model, n_layers=c.n_layers, n_heads=c.n_heads, d_ff=c.d_ff,
            dropout=c.dropout, dtype=self.dtype,
        )
        self.fc = nn.Dense(c.max_num_speaker, dtype=self.dtype)
        self.drop = nn.Dropout(c.dropout)

    def encode_frames(self, audio_or_fbank):
        """audio (B, N) or fbank (B, T100, F) → (B, T25, spk_dim)."""
        c = self.cfg
        if audio_or_fbank.ndim == 2:
            fbank = F.kaldi_fbank_auto(audio_or_fbank, sample_rate=c.sample_rate, num_mel_bins=c.feat_dim, mean_norm=True)
        else:
            fbank = audio_or_fbank
        h = self.frontend(fbank.astype(self.dtype))
        return self.front_proj(h)

    def _fuse(self, mix, target_embs, train):
        c = self.cfg
        B, T, D = mix.shape
        S = c.max_num_speaker
        ts = self.drop(target_embs.astype(self.dtype), deterministic=not train)
        ts = jnp.broadcast_to(ts[:, :, None, :], (B, S, T, D))
        mixs = jnp.broadcast_to(mix[:, None], (B, S, T, D))
        cat = jnp.concatenate([ts, mixs], axis=-1)
        if self.proj is not None:
            cat = self.proj(cat)
        return cat  # (B, S, T, d_model)

    def __call__(self, audio_or_fbank, target_embs, n_label_frames: int, train: bool = False, dynamic_chunk_rng=None):
        """Full-sequence forward with chunked attention (training/offline)."""
        c = self.cfg
        mix = self.encode_frames(audio_or_fbank)
        mix = mix[:, :n_label_frames]
        if mix.shape[1] < n_label_frames:
            mix = jnp.pad(mix, ((0, 0), (0, n_label_frames - mix.shape[1]), (0, 0)))
        cat = self._fuse(mix, target_embs, train)
        B, S, T, D = cat.shape
        chunk = c.chunk_size
        x = cat.reshape(B * S, T, D)
        x = self.single_backend(x, chunk_size=chunk, num_left_chunks=c.num_left_chunks, deterministic=not train)
        x = x.reshape(B, S, T, D).transpose(0, 2, 1, 3).reshape(B, T, S * D)
        x = self.backend_down(x)
        x = self.multi_backend(x, chunk_size=chunk, num_left_chunks=c.num_left_chunks, deterministic=not train)
        return self.fc(x).astype(jnp.float32)

    def streaming_state(self, batch: int):
        """Initial decode state: per-backend caches + frame position."""
        c = self.cfg
        L = c.chunk_size * c.num_left_chunks
        return dict(
            single=self.single_backend.init_cache(batch * c.max_num_speaker, L),
            multi=self.multi_backend.init_cache(batch, L),
            pos=jnp.zeros((), jnp.int32),
            valid=jnp.zeros((), jnp.int32),
        )

    def streaming_step(self, fbank_chunk, target_embs, state):
        """One chunk: fbank (B, 4·chunk_size, feat) → logits (B, chunk_size, S)
        + new state.

        NOTE: the subsampling convs see zero padding at chunk edges instead
        of neighbor frames, so chunk-boundary frames can differ slightly
        from the offline forward (the backends are exactly equivalent — see
        streaming_step_mix)."""
        mix = self.encode_frames(fbank_chunk)  # (B, chunk, D)
        return self.streaming_step_mix(mix, target_embs, state)

    def streaming_step_mix(self, mix, target_embs, state):
        """Backends-only streaming step on precomputed 25 Hz mix features."""
        c = self.cfg
        chunkT = mix.shape[1]
        cat = self._fuse(mix, target_embs, train=False)
        B, S, T, D = cat.shape
        x = cat.reshape(B * S, T, D)
        x, new_single = self.single_backend.streaming_step(x, state["single"], state["pos"], state["valid"])
        x = x.reshape(B, S, T, D).transpose(0, 2, 1, 3).reshape(B, T, S * D)
        x = self.backend_down(x)
        x, new_multi = self.multi_backend.streaming_step(x, state["multi"], state["pos"], state["valid"])
        logits = self.fc(x).astype(jnp.float32)
        L = c.chunk_size * c.num_left_chunks
        new_state = dict(
            single=new_single,
            multi=new_multi,
            pos=state["pos"] + chunkT,
            valid=jnp.minimum(state["valid"] + chunkT, L),
        )
        return logits, new_state
