"""OTS-VAD: online target-speaker VAD without enrollment embeddings.

Reference: `/root/reference/egs/alimeeting/ots_vad/model.py` — front-end
frame embeddings (ResNet34 + stats + projection); target embeddings are
*self-generated*: masked means of the previous block's frame embeddings
under that block's labels (training) or predictions (inference); a
per-speaker conformer + BiLSTM backend scores the next block.

Inference keeps running (sum, count) accumulators per speaker so the
self-enrollment sharpens block by block — a lax.scan-able online loop.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import features as F
from .conformer import ConformerBlock
from .speaker_encoders import ResNet34


@dataclass(frozen=True)
class OTSVADConfig:
    num_speakers: int = 4
    d_model: int = 256
    conformer_layers: int = 2
    n_heads: int = 4
    d_ff: int = 512
    lstm_hidden: int = 256
    feat_dim: int = 80
    sample_rate: int = 16000
    encoder_m_channels: int = 32
    encoder_blocks: tuple = (3, 4, 6, 3)
    dropout: float = 0.1


class OTSVADModel(nn.Module):
    cfg: OTSVADConfig = OTSVADConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.frontend = ResNet34(
            feat_dim=c.feat_dim, m_channels=c.encoder_m_channels, num_blocks=c.encoder_blocks, dtype=self.dtype
        )
        self.front_proj = nn.Dense(c.d_model, dtype=self.dtype)
        self.conformers = [
            ConformerBlock(n_heads=c.n_heads, d_ff=c.d_ff, dropout=c.dropout, dtype=self.dtype, name=f"conf_{i}")
            for i in range(c.conformer_layers)
        ]
        self.back_in = nn.Dense(c.d_model, dtype=self.dtype)
        self.lstm_fwd = nn.RNN(nn.OptimizedLSTMCell(c.lstm_hidden, dtype=self.dtype), name="lstm_fwd")
        self.lstm_bwd = nn.RNN(nn.OptimizedLSTMCell(c.lstm_hidden, dtype=self.dtype), name="lstm_bwd")
        self.fc1 = nn.Dense(c.d_model, dtype=self.dtype)
        self.fc2 = nn.Dense(1, dtype=self.dtype)

    def embed_frames(self, audio_or_fbank, train: bool = False):
        """audio (B, N) / fbank (B, T100, F) → frame embeddings (B, T100/8, D)."""
        c = self.cfg
        if audio_or_fbank.ndim == 2:
            fbank = F.kaldi_fbank_auto(audio_or_fbank, sample_rate=c.sample_rate, num_mel_bins=c.feat_dim, mean_norm=True)
        else:
            fbank = audio_or_fbank
        h = self.frontend(fbank.astype(self.dtype), train=train, mode="frames")
        return self.front_proj(h)

    @staticmethod
    def masked_target_embeddings(frame_emb, labels, eps: float = 1e-8):
        """(B, T, D), (B, S, T) activity → (B, S, D) masked means."""
        sums = jnp.einsum("bst,btd->bsd", labels, frame_emb)
        counts = jnp.sum(labels, axis=-1, keepdims=True)
        return sums / (counts + eps)

    def backend(self, frame_emb, target_emb, train: bool = False):
        """(B, T, D) + (B, S, D) → per-speaker logits (B, S, T)."""
        c = self.cfg
        B, T, D = frame_emb.shape
        S = c.num_speakers
        f = jnp.broadcast_to(frame_emb[:, None], (B, S, T, D))
        t = jnp.broadcast_to(target_emb[:, :, None, :], (B, S, T, D))
        x = self.back_in(jnp.concatenate([f, t], axis=-1)).reshape(B * S, T, c.d_model)
        for blk in self.conformers:
            x = blk(x, None, train)
        fwd = self.lstm_fwd(x)
        bwd = self.lstm_bwd(x[:, ::-1])[:, ::-1]
        h = jnp.concatenate([fwd, bwd], axis=-1)
        h = nn.relu(self.fc1(h))
        return self.fc2(h)[..., 0].reshape(B, S, T).astype(jnp.float32)

    def __call__(self, left, right, y_left, train: bool = False):
        """Training forward: self-enroll on the left block with true labels
        y_left (B, S, T_left_frames), predict the right block → (B, S, T)."""
        emb_l = self.embed_frames(left, train)
        emb_r = self.embed_frames(right, train)
        Tl = min(emb_l.shape[1], y_left.shape[-1])
        target = self.masked_target_embeddings(emb_l[:, :Tl], y_left[:, :, :Tl])
        return self.backend(emb_r, target, train)

    # ------------------------------------------------------------------
    def online_init(self, batch: int):
        c = self.cfg
        return dict(
            sums=jnp.zeros((batch, c.num_speakers, c.d_model), jnp.float32),
            counts=jnp.zeros((batch, c.num_speakers, 1), jnp.float32),
        )

    def online_step(self, block, state, threshold: float = 0.5, train: bool = False):
        """One block: predict with current self-enrolled embeddings, then
        update the accumulators from this block's decisions."""
        emb = self.embed_frames(block, train)
        target = state["sums"] / (state["counts"] + 1e-8)
        logits = self.backend(emb, target, train)
        dec = (jax.nn.sigmoid(logits) > threshold).astype(jnp.float32)  # (B, S, T)
        new_state = dict(
            sums=state["sums"] + jnp.einsum("bst,btd->bsd", dec, emb.astype(jnp.float32)),
            counts=state["counts"] + jnp.sum(dec, axis=-1, keepdims=True),
        )
        return logits, new_state
