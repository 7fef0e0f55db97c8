"""SSND: sequence-to-sequence neural diarization with query decoders.

Reference: `/root/reference/egs/alimeeting/ssnd/ssnd_model.py` — frame
extractor (CAM++-style, no global stats pooling) → Conformer encoder →
two query decoders over N speaker slots:

- DetectionDecoder (ssnd_model.py:271): queries = learned slot embeddings
  fused with per-slot auxiliary speaker embeddings (L2-normed); keys =
  encoder features fused with a learned positional embedding; per-slot
  VAD logits over the block.
- RepresentationDecoder (ssnd_model.py:341): queries fused with the slots'
  VAD posteriors; outputs one speaker embedding per slot.

Losses: focal BCE on VAD + ArcFace CE of predicted embeddings against the
learned all-speaker matrix E_all (ssnd_model.py:445-480); pseudo-speaker
and non-speech embeddings fill empty slots. Online block-wise inference
keeps an embedding memory per discovered speaker (infer flow mirrored in
infer/ssnd.py-style helpers here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import features as F
from ..ops.losses import l2_normalize
from .campplus import CAMPPlus
from .conformer import ConformerEncoder


@dataclass(frozen=True)
class SSNDConfig:
    feat_dim: int = 80
    emb_dim: int = 256  # speaker embedding dim
    d_model: int = 256
    n_heads: int = 8
    d_ff: int = 512
    num_layers: int = 4
    max_speakers: int = 4
    vad_out_len: int = 100  # frames per block (label rate 25 × 4 s)
    pos_emb_dim: int = 256
    max_seq_len: int = 1000
    n_all_speakers: int = 1000
    arcface_margin: float = 0.2
    arcface_scale: float = 32.0
    sample_rate: int = 16000
    extractor_blocks: tuple = (12, 24, 16)


class QueryFusionBlock(nn.Module):
    """SWDecoderBlockV2: cross-attn with fused Q/K, self-attn, FFN (post-norm)."""

    n_heads: int
    d_ff: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_dec, x_fea, q_aux, k_pos, train: bool = False):
        d = x_dec.shape[-1]
        q = nn.Dense(d, dtype=self.dtype, name="fq")(jnp.concatenate([x_dec, q_aux], axis=-1))
        k = nn.Dense(d, dtype=self.dtype, name="fk")(jnp.concatenate([x_fea, k_pos], axis=-1))
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout, dtype=self.dtype, name="cross_attn"
        )(q, k, x_fea, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x_dec + nn.Dropout(self.dropout)(h, deterministic=not train))
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout, dtype=self.dtype, name="self_attn"
        )(x, x, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x + nn.Dropout(self.dropout)(h, deterministic=not train))
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ffn1")(x)
        h = nn.Dense(d, dtype=self.dtype, name="ffn2")(nn.relu(h))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(x + nn.Dropout(self.dropout)(h, deterministic=not train))


class SSNDModel(nn.Module):
    cfg: SSNDConfig = SSNDConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.extractor = CAMPPlus(
            feat_dim=c.feat_dim, block_layers=c.extractor_blocks,
            block_dilations=(1, 2, 2)[: len(c.extractor_blocks)], dtype=self.dtype,
        )
        self.extract_proj = nn.Dense(c.emb_dim, dtype=self.dtype)
        self.encoder = ConformerEncoder(
            d_model=c.d_model, n_layers=c.num_layers, n_heads=c.n_heads, d_ff=c.d_ff, dtype=self.dtype
        )
        self.det_layers = [
            QueryFusionBlock(c.n_heads, c.d_ff, dtype=self.dtype, name=f"det_{i}") for i in range(c.num_layers)
        ]
        self.det_out = nn.Dense(c.vad_out_len, dtype=self.dtype)
        self.rep_in_fea = nn.Dense(c.d_model, dtype=self.dtype)
        self.rep_in_dec = nn.Dense(c.d_model, dtype=self.dtype)
        self.rep_in_aux = nn.Dense(c.emb_dim, dtype=self.dtype)
        self.rep_layers = [
            QueryFusionBlock(c.n_heads, c.d_ff, dtype=self.dtype, name=f"rep_{i}") for i in range(c.num_layers)
        ]
        self.rep_out = nn.Dense(c.emb_dim, dtype=self.dtype)

        self.pos_emb = self.param("pos_emb", nn.initializers.normal(1.0), (1, c.max_seq_len, c.pos_emb_dim))
        self.E_all = self.param("E_all", nn.initializers.normal(1.0), (c.n_all_speakers, c.emb_dim))
        self.e_pse = self.param("e_pse", nn.initializers.normal(1.0), (1, c.emb_dim))
        self.e_non = self.param("e_non", nn.initializers.normal(1.0), (1, c.emb_dim))
        self.det_query = self.param("det_query", nn.initializers.normal(1.0), (c.max_speakers, c.d_model))
        self.rep_query = self.param("rep_query", nn.initializers.normal(1.0), (c.max_speakers, c.vad_out_len))

    # ------------------------------------------------------------------
    def encode(self, audio_or_fbank, train: bool = False):
        """audio (B, N) or fbank (B, T100, feat) → (extractor feats
        (B, T50, emb_dim), conformer features (B, T50, d_model)).

        The detection decoder consumes the conformer output; the
        representation decoder consumes the raw extractor features
        (reference forward: `self.rep_decoder(x_rep_dec, x, ...)` where
        x = extractor(feats), ssnd_model.py:644-673)."""
        c = self.cfg
        if audio_or_fbank.ndim == 2:
            fbank = F.kaldi_fbank_auto(audio_or_fbank, sample_rate=c.sample_rate, num_mel_bins=c.feat_dim, mean_norm=True)
        else:
            fbank = audio_or_fbank
        frames = self.extractor(fbank.astype(self.dtype), train=train, mode="frames")
        feats = self.extract_proj(frames)  # (B, T50, emb_dim)
        return feats, self.encoder(feats, train=train)  # (B, T50, d_model)

    def detect(self, x_fea, aux_embs, train: bool = False):
        """x_fea (B, T, D), aux_embs (B, N, emb_dim) → VAD logits (B, N, vad_out_len)."""
        B, T, _ = x_fea.shape
        N = self.cfg.max_speakers
        q_aux = l2_normalize(aux_embs)
        x_dec = jnp.broadcast_to(self.det_query[None], (B, N, self.cfg.d_model)).astype(self.dtype)
        k_pos = jnp.broadcast_to(self.pos_emb[:, :T], (B, T, self.cfg.pos_emb_dim)).astype(self.dtype)
        for layer in self.det_layers:
            x_dec = layer(x_dec, x_fea, q_aux.astype(self.dtype), k_pos, train)
        return self.det_out(x_dec).astype(jnp.float32)

    def represent(self, x_ext, q_vad, train: bool = False):
        """x_ext (B, T, emb_dim) extractor feats, q_vad (B, N, T_vad) VAD
        activities (ground-truth labels at train, sigmoid probs at infer) →
        speaker embeddings (B, N, emb_dim).

        Reference RepresentationDecoder (ssnd_model.py:341-369): decoder
        state = learned per-slot query rep_query_emb pooled over T_vad and
        projected 1→d_model; aux query = the slot's VAD activity pooled
        over T_vad and projected 1→d_aux; cross-attention keys/values are
        the *extractor* features. (The round-3 version fed raw predicted
        logits through both projections and ignored rep_query — the
        ArcFace table never converged, VERDICT r3.)"""
        B, T, _ = x_ext.shape
        N = self.cfg.max_speakers
        fea = self.rep_in_fea(x_ext)
        x_dec = self.rep_in_dec(
            jnp.mean(self.rep_query, axis=-1, keepdims=True).astype(self.dtype)
        )  # (N, d_model)
        x_dec = jnp.broadcast_to(x_dec[None], (B, N, self.cfg.d_model))
        q_aux = self.rep_in_aux(jnp.mean(q_vad, axis=-1, keepdims=True).astype(self.dtype))
        k_pos = jnp.broadcast_to(self.pos_emb[:, :T], (B, T, self.cfg.pos_emb_dim)).astype(self.dtype)
        for layer in self.rep_layers:
            x_dec = layer(x_dec, fea, q_aux, k_pos, train)
        return self.rep_out(x_dec).astype(jnp.float32)

    def __call__(self, audio_or_fbank, aux_embs, train: bool = False, vad_labels=None):
        """→ (vad_logits (B, N, vad_out_len), spk_embs (B, N, emb_dim)).

        vad_labels: teacher-forced VAD activities for the representation
        decoder at train time (reference trains with q_aux = vad_labels,
        ssnd_model.py:673; inference uses the predicted probabilities,
        :775)."""
        x_ext, enc = self.encode(audio_or_fbank, train)
        vad = self.detect(enc, aux_embs, train)
        if vad_labels is None:
            q_vad = jax.nn.sigmoid(jax.lax.stop_gradient(vad))
        else:
            q_vad = vad_labels.astype(jnp.float32)
        emb = self.represent(x_ext, q_vad, train)
        return vad, emb

    # ------------------------------------------------------------------
    def lookup_speaker_embs(self, gids: jnp.ndarray) -> jnp.ndarray:
        """Slot queries from global speaker ids: E_all[gid], with the
        pseudo-speaker embedding for unknown slots (gid < 0) — the reference's
        train-time query construction (ssnd_model.py:579-587)."""
        safe = jnp.maximum(gids, 0)
        embs = self.E_all[safe]  # (..., emb_dim)
        return jnp.where((gids < 0)[..., None], self.e_pse[0], embs)

    def arcface_logits(self, emb: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """Scaled cos(θ+m) logits vs E_all (reference compute_arcface_loss)."""
        c = self.cfg
        e = l2_normalize(emb)
        W = l2_normalize(self.E_all)
        cos = jnp.clip(e @ W.T, -0.9999, 0.9999)  # (M, n_all)
        theta = jnp.arccos(cos)
        onehot = jax.nn.one_hot(labels, c.n_all_speakers)
        theta_m = theta + onehot * c.arcface_margin
        return jnp.cos(theta_m) * c.arcface_scale
