"""EEND-EDA: encoder-decoder attractors for variable speaker counts.

Reference: `/root/reference/speaker_diarization/eend_eda/models.py:160-652` +
`encoder_decoder_attractor.py:8-59`. The LSTM encoder consumes the
(optionally time-shuffled) frame embeddings; the LSTM decoder, initialized
from the encoder's final state, unrolls zero inputs for C+1 steps producing
attractors; diarization logits are emb · attractorᵀ and a linear head gives
per-attractor existence logits. Recurrences are `lax.scan`-based flax RNNs —
fine on TPU at these sizes (d=256, T≤2000).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .eend import FrontendConfig
from ..ops import features as F
from .transformer import TransformerEncoder


class EncoderDecoderAttractor(nn.Module):
    d_model: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, n_attractors: int, frame_mask=None, order=None):
        """emb: (B, T, D) frame embeddings → (attractors (B, n_att, D),
        exist_logits (B, n_att)).

        order: optional (B, T) int32 frame permutation applied before the
        encoder LSTM (the reference's time-shuffle, models.py:531-536).
        frame_mask: (B, T); padded frames are zeroed before encoding.
        """
        if order is not None:
            emb_in = jnp.take_along_axis(emb, order[..., None], axis=1)
            if frame_mask is not None:
                fm = jnp.take_along_axis(frame_mask, order, axis=1)
            else:
                fm = None
        else:
            emb_in, fm = emb, frame_mask
        if fm is not None:
            emb_in = emb_in * fm[..., None].astype(emb_in.dtype)

        enc_cell = nn.OptimizedLSTMCell(self.d_model, dtype=self.dtype, name="enc_lstm")
        dec_cell = nn.OptimizedLSTMCell(self.d_model, dtype=self.dtype, name="dec_lstm")
        enc = nn.RNN(enc_cell, return_carry=True, name="enc_rnn")
        # seq_lengths: stop the carry at the last valid frame per sample so
        # padding does not corrupt the attractor state.
        if fm is not None:
            seq_len = jnp.sum(fm.astype(jnp.int32), axis=-1)
            carry, _ = enc(emb_in.astype(self.dtype), seq_lengths=seq_len)
        else:
            carry, _ = enc(emb_in.astype(self.dtype))

        dec = nn.RNN(dec_cell, name="dec_rnn")
        zeros = jnp.zeros((emb.shape[0], n_attractors, self.d_model), dtype=self.dtype)
        attractors = dec(zeros, initial_carry=carry)
        exist_logits = nn.Dense(1, dtype=self.dtype, name="exist_head")(attractors)[..., 0]
        return attractors, exist_logits.astype(jnp.float32)


class EendEdaModel(nn.Module):
    """Transformer encoder + EDA. Training capacity n_speakers; inference can
    decode up to max_attractors and threshold on existence probability."""

    n_speakers: int = 2
    max_attractors: int = 15
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    d_ff: int = 2048
    dropout: float = 0.1
    # transformer | conformer (reference eend_eda/models.py:495-504
    # encoder_type selects torchaudio Conformer)
    encoder_type: str = "transformer"
    # conformer conv-module norm: 'batch' (torchaudio parity, needs a
    # mutable-aware trainer) or 'group' (stateless; what the CLI uses)
    conv_norm: str = "batch"
    frontend: Optional[FrontendConfig] = FrontendConfig()
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.encoder_type == "conformer":
            from .conformer import ConformerEncoder

            self.encoder = ConformerEncoder(
                d_model=self.d_model,
                n_layers=self.n_layers,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                dropout=self.dropout,
                conv_norm=self.conv_norm,
                dtype=self.dtype,
            )
        elif self.encoder_type == "transformer":
            self.encoder = TransformerEncoder(
                d_model=self.d_model,
                n_layers=self.n_layers,
                n_heads=self.n_heads,
                d_ff=self.d_ff,
                dropout=self.dropout,
                remat=self.remat,
                dtype=self.dtype,
            )
        else:
            raise ValueError(f"encoder_type must be transformer|conformer, got {self.encoder_type!r}")
        self.eda = EncoderDecoderAttractor(d_model=self.d_model, dtype=self.dtype)

    def embed(self, x, frame_mask=None, deterministic: bool = True):
        if self.frontend is not None and x.ndim == 2:
            fe = self.frontend
            x = F.eend_frontend_jax(
                x, x.shape[-1], fe.frame_size, fe.frame_shift, fe.sample_rate,
                fe.n_mels, fe.context_size, fe.subsampling, fe.mean_norm,
            )
        x = x.astype(self.dtype)
        if self.encoder_type == "conformer":
            return self.encoder(x, frame_mask=frame_mask, train=not deterministic)
        return self.encoder(x, frame_mask=frame_mask, deterministic=deterministic)

    def __call__(self, x, frame_mask=None, order=None, deterministic: bool = True, n_attractors: Optional[int] = None):
        """→ (logits (B, T, C), exist_logits (B, C+1)) with C = n_attractors
        (default n_speakers). logits use the first C attractors."""
        C = self.n_speakers if n_attractors is None else n_attractors
        emb = self.embed(x, frame_mask, deterministic)
        attractors, exist_logits = self.eda(emb, C + 1, frame_mask=frame_mask, order=order)
        att = attractors[:, :C]  # (B, C, D)
        logits = jnp.einsum("btd,bcd->btc", emb, att).astype(jnp.float32)
        if frame_mask is not None:
            logits = logits * frame_mask[..., None]
        return logits, exist_logits

    def infer(self, x, frame_mask=None, deterministic: bool = True):
        """Decode max_attractors attractors; return (logits (B, T, A),
        exist_probs (B, A)). Downstream selects active attractors by
        threshold (reference models.py:639-651)."""
        emb = self.embed(x, frame_mask, deterministic)
        attractors, exist_logits = self.eda(emb, self.max_attractors, frame_mask=frame_mask)
        logits = jnp.einsum("btd,bad->bta", emb, attractors).astype(jnp.float32)
        return logits, jax.nn.sigmoid(exist_logits)
