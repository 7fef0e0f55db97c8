"""EEND: end-to-end neural diarization with a fixed speaker capacity.

Reference: `/root/reference/speaker_diarization/eend/` (TransformerModel in
eend_eda/models.py:26 + PIT-BCE in eend/loss.py:20). This version runs the
log-mel front-end on device (one fused matmul chain) and the PIT loss fully
vectorized; the chunk of raw audio goes in, per-frame per-speaker logits
come out.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops import features as F
from .transformer import TransformerEncoder


@dataclass(frozen=True)
class FrontendConfig:
    """On-device log-mel front-end settings (8 kHz mini_librispeech defaults:
    conf/eend_eda/*.yaml — frame 200/shift 80, logmel23_mn, context 7, ss 10)."""

    sample_rate: int = 8000
    frame_size: int = 200
    frame_shift: int = 80
    n_mels: int = 23
    context_size: int = 7
    subsampling: int = 10
    mean_norm: bool = True

    @property
    def input_dim(self) -> int:
        return self.n_mels * (2 * self.context_size + 1)

    def n_frames(self, n_samples: int) -> int:
        full = F.count_frames(n_samples, self.frame_shift)
        return (full + self.subsampling - 1) // self.subsampling

    def chunk_samples(self, n_sub_frames: int) -> int:
        """Samples for a chunk of n_sub_frames subsampled frames."""
        return n_sub_frames * self.subsampling * self.frame_shift


class EENDModel(nn.Module):
    """Transformer EEND: audio (or features) → per-speaker frame logits."""

    n_speakers: int = 2
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    d_ff: int = 2048
    dropout: float = 0.1
    frontend: Optional[FrontendConfig] = FrontendConfig()
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TransformerEncoder(
            d_model=self.d_model,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            d_ff=self.d_ff,
            dropout=self.dropout,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.head = nn.Dense(self.n_speakers, dtype=self.dtype)

    def embed(self, x, frame_mask=None, deterministic: bool = True):
        """Features or raw audio → frame embeddings (B, T, d_model)."""
        if self.frontend is not None and x.ndim == 2:
            fe = self.frontend
            x = F.eend_frontend_jax(
                x,
                x.shape[-1],
                fe.frame_size,
                fe.frame_shift,
                fe.sample_rate,
                fe.n_mels,
                fe.context_size,
                fe.subsampling,
                fe.mean_norm,
            )
        x = x.astype(self.dtype)
        return self.encoder(x, frame_mask=frame_mask, deterministic=deterministic)

    def __call__(self, x, frame_mask=None, deterministic: bool = True):
        """x: (B, n_samples) raw audio or (B, T, input_dim) features.

        Returns logits (B, T, n_speakers) in float32.
        """
        emb = self.embed(x, frame_mask, deterministic)
        return self.head(emb).astype(jnp.float32)
