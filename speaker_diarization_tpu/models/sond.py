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
    # speaker profile encoder (reference conv_encoder.py:19 ConvEncoder):
    # k=1 conv stack over the profile axis, tanh, residual after layer 1
    spk_encoder_layers: int = 3
    # CD scorer attention: 'sanm' (reference attention.py:311
    # MultiHeadedAttentionSANM — fused qkv + FSMN memory branch) or 'vanilla'
    cd_attention: str = "sanm"
    sanm_kernel: int = 11

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


class SpeakerConvEncoder(nn.Module):
    """Speaker-profile encoder (reference sond/conv_encoder.py:19
    ConvEncoder): k=1 conv stack over the profile axis (≡ per-profile MLP),
    tanh activations, residual connections from layer 2 on, and an output
    projection. Input profiles are L2-normalized; zero (absent) profiles
    stay zero via the norm mask."""

    d_model: int
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, profiles):
        """(B, N, spk_emb_dim) → (B, N, d_model)."""
        mask = (jnp.linalg.norm(profiles, axis=-1, keepdims=True) > 0).astype(self.dtype)
        h = L.l2_normalize(profiles.astype(self.dtype))
        for i in range(self.n_layers):
            y = nn.Dense(self.d_model, dtype=self.dtype, name=f"conv_{i}")(h)
            y = jnp.tanh(y)
            h = h + y if (i > 0 and h.shape[-1] == self.d_model) else y
        h = nn.Dense(self.d_model, dtype=self.dtype, name="conv_out")(h)
        return h * mask


class SANMLayer(nn.Module):
    """Self-attention layer with FSMN memory (reference sond/attention.py:311
    MultiHeadedAttentionSANM): fused qkv projection + a depthwise-conv memory
    branch over v, summed with the attention output; pre-LN residual wiring
    as in the reference SelfAttentionEncoder."""

    n_heads: int
    d_ff: int
    kernel: int = 11
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, T, _ = q.shape
        H = self.n_heads
        hd = d // H
        qh = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
        kh = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        w = jax.nn.softmax(jnp.einsum("bhtd,bhsd->bhts", qh, kh), axis=-1)
        att = jnp.einsum("bhts,bhsd->bhtd", w, vh).transpose(0, 2, 1, 3).reshape(B, T, d)
        att = nn.Dense(d, dtype=self.dtype, name="out_proj")(att)
        # FSMN memory on v: depthwise conv, residual inside the branch
        lpad = (self.kernel - 1) // 2
        mem = nn.Conv(
            d, (self.kernel,), padding=[(lpad, self.kernel - 1 - lpad)],
            feature_group_count=d, use_bias=False, dtype=self.dtype, name="fsmn",
        )(v)
        mem = nn.Dropout(self.dropout)(v + mem, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(att + mem, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ffn1")(h)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="ffn2")(nn.relu(h))
        return x + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class SONDModel(nn.Module):
    cfg: SONDConfig = SONDConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.speech_encoder = ResNet34(
            feat_dim=c.feat_dim, m_channels=c.encoder_m_channels, num_blocks=c.encoder_blocks, dtype=self.dtype
        )
        self.frame_proj = nn.Dense(c.d_model, dtype=self.dtype)
        # speaker profile encoder (reference conv_encoder.py:19)
        self.speaker_encoder = SpeakerConvEncoder(
            c.d_model, n_layers=c.spk_encoder_layers, dtype=self.dtype
        )
        # CD scorer input is concat[speech ‖ profile] (models.py:315-326
        # concate_speech_ivc) → project to d_model → SANM/vanilla stack
        self.cd_in_proj = nn.Dense(c.d_model, dtype=self.dtype)
        if c.cd_attention == "sanm":
            self.cd_layers_mods = [
                SANMLayer(
                    n_heads=c.n_heads, d_ff=4 * c.d_model, kernel=c.sanm_kernel,
                    dropout=c.dropout, dtype=self.dtype, name=f"cd_{i}",
                )
                for i in range(c.cd_layers)
            ]
        else:
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
        """(B, N, spk_emb_dim) → (B, N, d_model), zero rows stay zero."""
        return self.speaker_encoder(spk_embs)

    def n_out_frames(self, n_fbank_frames: int) -> int:
        """Encoder output length for a given 100 Hz fbank length (×8
        downsample, ceil rounding — measured contract of ResNet34 frames
        mode). Feed fbank padded to 8·T_labels for exact label alignment."""
        return -(-n_fbank_frames // 8)

    def __call__(self, fbank, spk_embs, train: bool = False):
        """fbank (B, T100, F), spk_embs (B, N=max_speakers, D) →
        powerset logits (B, T_frames, n_classes)."""
        c = self.cfg
        frames = self.encode_speech(fbank, train)  # (B, T, D)
        spk = self.encode_speakers(spk_embs)  # (B, N, D)
        # normalize_speech_speaker (models.py:337-339): both scorers see
        # L2-normalized frame/profile vectors
        fn = L.l2_normalize(frames)
        sn = L.l2_normalize(spk) * (jnp.linalg.norm(spk, axis=-1, keepdims=True) > 0)
        ci = jnp.einsum("btd,bnd->btn", fn, sn)  # cosine CI scores

        # CD scorer: concat[speech ‖ profile] per (speaker, frame) folded
        # into the batch axis (models.py:329-346 calc_similarity)
        B, T, D = frames.shape
        N = spk.shape[1]
        f_exp = jnp.broadcast_to(fn[:, None, :, :], (B, N, T, D))
        s_exp = jnp.broadcast_to(sn[:, :, None, :], (B, N, T, D))
        fused = jnp.concatenate([f_exp, s_exp], axis=-1).reshape(B * N, T, 2 * D)
        fused = self.cd_in_proj(fused)
        for layer in self.cd_layers_mods:
            fused = layer(fused, not train) if c.cd_attention == "sanm" else layer(fused, None, not train)
        cd = self.cd_score(fused).reshape(B, N, T).transpose(0, 2, 1)  # (B, T, N)

        h = jnp.concatenate([cd, ci], axis=-1)  # (B, T, 2N) — cd first (models.py:377)
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
        # alignment is the caller's contract: fbank padded to 8·T_labels so
        # the ×8 encoder emits exactly one frame per label (n_out_frames)
        if logits.shape[1] != labels.shape[1]:
            raise ValueError(
                f"SOND frame/label mismatch: logits T={logits.shape[1]} vs "
                f"labels T={labels.shape[1]} — pad fbank to 8*T_labels "
                f"(see make_sond_loss_from_audio)"
            )
        frame_mask = batch.get("frame_mask")
        # identity (profile-order) CE: channel i is scored against profile
        # i, as the reference's LabelSmoothingLoss does — see
        # powerset_pit_ce's permutation_invariant note
        loss, _ = P.powerset_pit_ce(
            logits, labels, c.max_speakers, c.max_set_size,
            frame_mask=frame_mask, label_smoothing=c.label_smoothing,
            permutation_invariant=False,
        )
        # frame-level DER from powerset argmax
        pred_ml = P.powerset_to_multilabel(jnp.argmax(logits, -1), c.max_speakers, c.max_set_size)
        stats = M.diarization_error_stats((pred_ml * 2 - 1) * 10.0, labels, frame_mask)
        return loss, ({"frame_der": M.der_from_stats(stats)}, new_mut)

    return loss_fn
