"""EEND-VC: chunked EEND that also emits per-chunk speaker vectors.

Reference: `/root/reference/speaker_diarization/eend_vector_cluster/
models_vector_cluster.py:194-370`. Per chunk the model outputs per-frame
per-channel logits plus one embedding per channel: frame-level channel
vectors are L2-normalized, weighted by the channel's sigmoid posterior,
summed over time and re-normalized. Training adds a distance-softmax loss
against a global speaker-embedding table (learned alpha/beta scaling);
inference clusters chunk vectors across the recording with
cannot-link-constrained AHC (infer/eend_vc.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import features as F
from ..ops.losses import l2_normalize
from .eend import FrontendConfig
from .transformer import TransformerEncoder


class EENDVCModel(nn.Module):
    n_speakers: int = 3  # channels per chunk
    vec_dim: int = 256
    all_n_speakers: int = 0  # global speaker-table rows (training only)
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
            d_model=self.d_model, n_layers=self.n_layers, n_heads=self.n_heads,
            d_ff=self.d_ff, dropout=self.dropout, remat=self.remat, dtype=self.dtype,
        )
        self.head = nn.Dense(self.n_speakers, dtype=self.dtype)
        # one vector head per channel (reference: linear0..linearS-1)
        self.vec_heads = [nn.Dense(self.vec_dim, dtype=self.dtype, name=f"vec_head_{i}") for i in range(self.n_speakers)]
        if self.all_n_speakers > 0:
            self.spk_table = nn.Embed(self.all_n_speakers, self.vec_dim)
            self.alpha = self.param("alpha", lambda k: jnp.asarray(1.0))
            self.beta = self.param("beta", lambda k: jnp.asarray(1.0))

    def embed_frames(self, x, frame_mask=None, deterministic=True):
        if self.frontend is not None and x.ndim == 2:
            fe = self.frontend
            x = F.eend_frontend_jax(
                x, x.shape[-1], fe.frame_size, fe.frame_shift, fe.sample_rate,
                fe.n_mels, fe.context_size, fe.subsampling, fe.mean_norm,
            )
        return self.encoder(x.astype(self.dtype), frame_mask=frame_mask, deterministic=deterministic)

    def __call__(self, x, frame_mask=None, deterministic: bool = True):
        """→ (logits (B, T, S), chunk speaker vectors (B, S, D) L2-normalized)."""
        emb = self.embed_frames(x, frame_mask, deterministic)
        logits = self.head(emb).astype(jnp.float32)
        if frame_mask is not None:
            logits = logits * frame_mask[..., None]
        z = jax.nn.sigmoid(logits)  # (B, T, S)
        if frame_mask is not None:
            z = z * frame_mask[..., None]
        vecs = []
        for i, h in enumerate(self.vec_heads):
            v = h(emb).astype(jnp.float32)  # (B, T, D)
            v = l2_normalize(v)
            w = z[..., i : i + 1]
            s = jnp.sum(v * w, axis=1)  # (B, D)
            s = l2_normalize(s)
            vecs.append(s)
        return logits, jnp.stack(vecs, axis=1)

    def init_all(self, x):
        """Init-time entry touching every parameter (incl. the speaker table,
        which __call__ alone never uses)."""
        logits, vecs = self(x)
        if self.all_n_speakers > 0:
            _ = self.spk_distance_logits(vecs)
        return logits, vecs

    def spk_distance_logits(self, vecs: jnp.ndarray) -> jnp.ndarray:
        """-(alpha·dist² + beta) against the normalized global table.

        vecs: (..., D) → logits (..., all_n_speakers) for log-softmax CE
        (reference spk_loss, models_vector_cluster.py:159-192).
        """
        table = self.spk_table.embedding
        table = l2_normalize(table)
        d2 = jnp.sum((vecs[..., None, :] - table) ** 2, axis=-1)
        alpha = jnp.maximum(self.alpha, 1e-8)
        return -(alpha * d2 + self.beta)
