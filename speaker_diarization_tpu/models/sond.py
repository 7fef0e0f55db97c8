"""SOND: speaker-overlap-aware network diarization with powerset labels.

Reference: `/root/reference/speaker_diarization/sond/` — DiarSondModel
(models.py:40-130): frame speech encoder (ResNet34) + speaker ConvEncoder
over enrolled embeddings + CI (context-independent, cosine/dot) and CD
(context-dependent, self-attentive) scorers + FSMN post-net → powerset
(PSE) class logits with label-smoothing CE. The reference's 2517 PSE
labels = subsets of ≤4 simultaneous speakers out of 16
(ops/powerset.py: n_powerset_classes(16, 4) == 2517).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops import powerset as P
from .speaker_encoders import ResNet34
from .transformer import TransformerEncoderLayer


@dataclass(frozen=True)
class SONDConfig:
    max_speakers: int = 16
    max_set_size: int = 4
    feat_dim: int = 80
    spk_emb_dim: int = 192
    d_model: int = 256
    n_heads: int = 4
    cd_layers: int = 2
    fsmn_layers: int = 3
    fsmn_lorder: int = 10
    fsmn_rorder: int = 10
    dropout: float = 0.1
    label_smoothing: float = 0.1
    encoder_m_channels: int = 32
    encoder_blocks: tuple = (3, 4, 6, 3)

    @property
    def n_classes(self) -> int:
        return P.n_powerset_classes(self.max_speakers, self.max_set_size)


class FsmnBlock(nn.Module):
    """Feedforward sequential memory: linear proj + depthwise time-tap conv
    with lorder past / rorder future taps + residual (fsmn_encoder.py:89)."""

    d_model: int
    lorder: int = 10
    rorder: int = 10
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="proj")(x)
        k = self.lorder + self.rorder + 1
        mem = nn.Conv(
            self.d_model, (k,), padding=[(self.lorder, self.rorder)],
            feature_group_count=self.d_model, use_bias=False, dtype=self.dtype, name="memory",
        )(h)
        h = h + mem
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        out = nn.relu(nn.Dense(self.d_model, dtype=self.dtype, name="out")(h))
        if x.shape[-1] == self.d_model:
            out = out + x
        return out


class SONDModel(nn.Module):
    cfg: SONDConfig = SONDConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.speech_encoder = ResNet34(
            feat_dim=c.feat_dim, m_channels=c.encoder_m_channels, num_blocks=c.encoder_blocks, dtype=self.dtype
        )
        self.frame_proj = nn.Dense(c.d_model, dtype=self.dtype)
        # speaker encoder: 1-D conv stack over the speaker axis (ConvEncoder)
        self.spk_proj1 = nn.Dense(c.d_model, dtype=self.dtype)
        self.spk_proj2 = nn.Dense(c.d_model, dtype=self.dtype)
        self.cd_layers_mods = [
            TransformerEncoderLayer(n_heads=c.n_heads, d_ff=4 * c.d_model, dropout=c.dropout, dtype=self.dtype, name=f"cd_{i}")
            for i in range(c.cd_layers)
        ]
        self.cd_score = nn.Dense(1, dtype=self.dtype)
        self.fsmn = [
            FsmnBlock(c.d_model, c.fsmn_lorder, c.fsmn_rorder, c.dropout, dtype=self.dtype, name=f"fsmn_{i}")
            for i in range(c.fsmn_layers)
        ]
        self.out = nn.Dense(c.n_classes, dtype=self.dtype)

    def encode_speech(self, fbank, train: bool = False):
        """fbank (B, T100, F) → frame features (B, T100/8, d_model)."""
        h = self.speech_encoder(fbank.astype(self.dtype), train=train, mode="frames")
        return self.frame_proj(h)

    def encode_speakers(self, spk_embs):
        """(B, N, spk_emb_dim) → (B, N, d_model), L2-normalized."""
        h = nn.relu(self.spk_proj1(spk_embs.astype(self.dtype)))
        h = self.spk_proj2(h)
        return L.l2_normalize(h)

    def __call__(self, fbank, spk_embs, train: bool = False):
        """fbank (B, T100, F), spk_embs (B, N=max_speakers, D) →
        powerset logits (B, T_frames, n_classes)."""
        c = self.cfg
        frames = self.encode_speech(fbank, train)  # (B, T, D)
        spk = self.encode_speakers(spk_embs)  # (B, N, D)
        fn = L.l2_normalize(frames)
        ci = jnp.einsum("btd,bnd->btn", fn, spk)  # cosine CI scores

        # CD scorer: per-speaker fused sequence through shared transformer
        B, T, D = frames.shape
        N = spk.shape[1]
        fused = frames[:, None, :, :] + spk[:, :, None, :]  # (B, N, T, D)
        fused = fused.reshape(B * N, T, D)
        for layer in self.cd_layers_mods:
            fused = layer(fused, None, not train)
        cd = self.cd_score(fused).reshape(B, N, T).transpose(0, 2, 1)  # (B, T, N)

        h = jnp.concatenate([ci, cd], axis=-1)  # (B, T, 2N)
        for blk in self.fsmn:
            h = blk(h, train)
        return self.out(h).astype(jnp.float32)


def make_sond_loss(model: SONDModel):
    """loss_fn (has_mutable): powerset PIT CE with label smoothing."""
    from ..ops import metrics as M

    c = model.cfg

    def loss_fn(params, mutable, batch, rng, train):
        variables = {"params": params, **mutable}
        if train:
            logits, new_mut = model.apply(
                variables, batch["fbank"], batch["spk_embs"], True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            new_mut = dict(new_mut)
        else:
            logits = model.apply(variables, batch["fbank"], batch["spk_embs"], False)
            new_mut = mutable
        labels = batch["labels"]  # (B, T_frames, max_speakers) multilabel
        # The ResNet34 frame encoder rounds the ×8 downsample up while label
        # subsampling rounds down — crop both to the common length.
        T = min(logits.shape[1], labels.shape[1])
        logits = logits[:, :T]
        labels = labels[:, :T]
        frame_mask = batch.get("frame_mask")
        if frame_mask is not None:
            frame_mask = frame_mask[:, :T]
        loss, _ = P.powerset_pit_ce(
            logits, labels, c.max_speakers, c.max_set_size,
            frame_mask=frame_mask, label_smoothing=c.label_smoothing,
        )
        # frame-level DER from powerset argmax
        pred_ml = P.powerset_to_multilabel(jnp.argmax(logits, -1), c.max_speakers, c.max_set_size)
        stats = M.diarization_error_stats((pred_ml * 2 - 1) * 10.0, labels, frame_mask)
        return loss, ({"frame_der": M.der_from_stats(stats)}, new_mut)

    return loss_fn
