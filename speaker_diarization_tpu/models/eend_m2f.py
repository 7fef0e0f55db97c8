"""EEND-M2F: Mask2Former-style set-prediction diarization.

Reference: `/root/reference/speaker_diarization/eend_m2f/` — conv
subsampling backbone (backbone.py:7 DepthwiseSeparableConv1dSubsampling10)
→ 1-D pixel decoder upsampling back to frame rate (pixel_decoder.py) →
masked transformer decoder with N learned queries
(mask2former_transformer_decoder.py:14) → per-query class logit
(speaker/no-speaker) + mask embedding; masks = mask_emb · pixel_featᵀ.
Training: Hungarian matching on (class, mask BCE, dice) costs
(criterion.py:176 SetCriterion, matchers) with auxiliary per-layer losses.

TPU-first: masks are scored over all frames (no point sampling — T ≤ 2000
1-D frames, unlike 2-D images), the Hungarian matcher runs ON DEVICE
(exact JV solver in lax control flow, ops/hungarian.py — no host
callbacks), and the masked cross-attention uses the previous layer's mask
prediction as an attention bias with static shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import features as F
from ..ops.hungarian import dice_loss, hungarian_assign
from .eend import FrontendConfig
from .transformer import TransformerEncoder, sinusoidal_position_encoding


@dataclass(frozen=True)
class M2FConfig:
    num_queries: int = 16
    d_model: int = 256
    n_heads: int = 4
    d_ff: int = 1024
    enc_layers: int = 4
    dec_layers: int = 3
    dropout: float = 0.1
    mask_threshold: float = 0.5
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0
    no_object_weight: float = 0.1
    # True backbone (reference backbone.py:7 + pixel_decoder.py:3): the
    # encoder runs at ×10 subsampled rate behind a depthwise-separable conv
    # (k15 s10), and a 2-stage transposed-conv pixel decoder (×2 then ×5)
    # upsamples back to frame rate where masks are scored. use_backbone=False
    # keeps the flat encoder-at-frame-rate variant.
    use_backbone: bool = True
    subsample: int = 10
    encoder_type: str = "conformer"  # conformer (reference) | transformer
    conv_kernel: int = 49  # conformer depthwise kernel (reference backbone.py)
    # matcher: 'mask2former' (class+mask+dice costs) or 'fastinst'
    # (additionally a location cost: a query whose peak-confidence time
    # falls outside the target's active region pays location_weight —
    # fastinst_matcher.py:135-142 semantics with the query location taken
    # as argmax_t of its mask prediction; the IA-guided proposal head of
    # full FastInst is not replicated)
    matcher: str = "mask2former"
    location_weight: float = 1000.0


class DepthwiseSeparableSubsample10(nn.Module):
    """×10 conv subsampling (reference backbone.py:7
    DepthwiseSeparableConv1dSubsampling10): depthwise k15 s10 pad3 → ReLU →
    pointwise 1×1 → ReLU → LayerNorm → dropout. (B, T, F) → (B, ≈T/10, D)."""

    d_model: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        nin = x.shape[-1]
        h = nn.Conv(
            nin, (15,), strides=(10,), padding=[(3, 3)],
            feature_group_count=nin, use_bias=False, dtype=self.dtype, name="depthwise",
        )(x)
        h = nn.relu(h)
        h = nn.Conv(self.d_model, (1,), use_bias=False, dtype=self.dtype, name="pointwise")(h)
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln")(h)
        return nn.Dropout(self.dropout)(h, deterministic=not train)


class PixelDecoderUpsample10(nn.Module):
    """×10 transposed-conv upsample (reference pixel_decoder.py:3
    OneDimTransposedConvolutionUpsampleLayer): conv_t k3 s2 → GELU →
    conv_t k5 s5 → GELU → LayerNorm → GELU; a final 1×1 conv produces the
    mask features. (B, T', D) → (features (B, 10·T', D), mask_feat same)."""

    d_model: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.ConvTranspose(self.d_model, (3,), strides=(2,), padding="SAME", dtype=self.dtype, name="up2")(x)
        h = nn.gelu(h, approximate=True)
        h = nn.ConvTranspose(self.d_model, (5,), strides=(5,), padding="SAME", dtype=self.dtype, name="up5")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.LayerNorm(dtype=self.dtype, name="ln")(h)
        h = nn.gelu(h, approximate=True)
        mask_feat = nn.Conv(self.d_model, (1,), dtype=self.dtype, name="mask_features")(h)
        return h, mask_feat


class MaskedDecoderLayer(nn.Module):
    n_heads: int
    d_ff: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, feats, attn_mask=None, train: bool = False):
        d = queries.shape[-1]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout, dtype=self.dtype, name="cross_attn"
        )(queries, feats, mask=attn_mask, deterministic=not train)
        q = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries + h)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dropout_rate=self.dropout, dtype=self.dtype, name="self_attn"
        )(q, q, deterministic=not train)
        q = nn.LayerNorm(dtype=self.dtype, name="norm2")(q + h)
        h = nn.Dense(self.d_ff, dtype=self.dtype, name="ffn1")(q)
        h = nn.Dense(d, dtype=self.dtype, name="ffn2")(nn.relu(h))
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(q + h)


class EENDM2FModel(nn.Module):
    cfg: M2FConfig = M2FConfig()
    frontend: Optional[FrontendConfig] = FrontendConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        if c.use_backbone:
            self.subsampler = DepthwiseSeparableSubsample10(c.d_model, c.dropout, dtype=self.dtype)
            self.pixel_decoder = PixelDecoderUpsample10(c.d_model, dtype=self.dtype)
        if c.use_backbone and c.encoder_type == "conformer":
            from .conformer import ConformerEncoder

            # stateless GroupNorm conv module: identical train/eval graphs,
            # no batch_stats plumbing through the set-criterion loss path
            self.encoder = ConformerEncoder(
                d_model=c.d_model, n_layers=c.enc_layers, n_heads=c.n_heads, d_ff=c.d_ff,
                conv_kernel=c.conv_kernel, dropout=c.dropout, conv_norm="group", dtype=self.dtype,
            )
        else:
            self.encoder = TransformerEncoder(
                d_model=c.d_model, n_layers=c.enc_layers, n_heads=c.n_heads, d_ff=c.d_ff,
                dropout=c.dropout, has_pos=True, dtype=self.dtype,
            )
        if not c.use_backbone:
            self.pixel_proj = nn.Dense(c.d_model, dtype=self.dtype)
        self.query_emb = self.param("query_emb", nn.initializers.normal(0.5), (c.num_queries, c.d_model))
        self.dec_layers_mods = [
            MaskedDecoderLayer(c.n_heads, c.d_ff, c.dropout, dtype=self.dtype, name=f"dec_{i}")
            for i in range(c.dec_layers)
        ]
        self.class_head = nn.Dense(1, dtype=self.dtype)  # speaker vs no-object
        self.mask_head = nn.Dense(c.d_model, dtype=self.dtype)

    def __call__(self, x, frame_mask=None, train: bool = False):
        """x: audio (B, samples) or features (B, T, d_in).

        Returns dict with 'mask_logits' (B, Q, T), 'class_logits' (B, Q),
        and per-layer aux lists. With use_backbone=True, the frontend must
        NOT subsample (subsampling=1): the ×10 happens in the conv
        subsampler and masks are scored at the input frame rate.
        """
        if self.frontend is not None and x.ndim == 2:
            fe = self.frontend
            x = F.eend_frontend_jax(
                x, x.shape[-1], fe.frame_size, fe.frame_shift, fe.sample_rate,
                fe.n_mels, fe.context_size, fe.subsampling, fe.mean_norm,
            )
        x = x.astype(self.dtype)
        if self.cfg.use_backbone:
            T_in = x.shape[1]
            h = self.subsampler(x, train=train)  # (B, ≈T/10, D)
            if self.cfg.encoder_type == "conformer":
                h = self.encoder(h, train=train)
            else:
                h = self.encoder(h, frame_mask=None, deterministic=not train)
            feat, mask_feat = self.pixel_decoder(h)  # both (B, 10·T', D)
            # align the upsampled rate back to the input frame count
            if feat.shape[1] < T_in:
                pad = T_in - feat.shape[1]
                feat = jnp.pad(feat, ((0, 0), (0, pad), (0, 0)))
                mask_feat = jnp.pad(mask_feat, ((0, 0), (0, pad), (0, 0)))
            feat, mask_feat = feat[:, :T_in], mask_feat[:, :T_in]
            pixel = mask_feat  # masks scored against mask features
            cross_feats = feat  # queries cross-attend to pixel-decoder features
        else:
            feats = self.encoder(x, frame_mask=frame_mask, deterministic=not train)
            pixel = self.pixel_proj(feats)  # (B, T, D)
            cross_feats = pixel

        B, T, D = pixel.shape
        Q = self.cfg.num_queries
        q = jnp.broadcast_to(self.query_emb[None], (B, Q, D)).astype(self.dtype)

        aux_masks, aux_classes = [], []
        attn_mask = None
        for layer in self.dec_layers_mods:
            q = layer(q, cross_feats, attn_mask, train)
            memb = self.mask_head(q)  # (B, Q, D)
            mask_logits = jnp.einsum("bqd,btd->bqt", memb, pixel).astype(jnp.float32)
            cls_logits = self.class_head(q)[..., 0].astype(jnp.float32)
            aux_masks.append(mask_logits)
            aux_classes.append(cls_logits)
            # masked attention: restrict to currently-predicted foreground
            fg = jax.nn.sigmoid(mask_logits) > self.cfg.mask_threshold
            any_fg = jnp.any(fg, axis=-1, keepdims=True)
            fg = jnp.where(any_fg, fg, True)  # empty masks attend everywhere
            attn_mask = fg[:, None]  # (B, 1, Q, T) boolean, True = attend

        return dict(
            mask_logits=aux_masks[-1],
            class_logits=aux_classes[-1],
            aux_mask_logits=aux_masks[:-1],
            aux_class_logits=aux_classes[:-1],
        )


def m2f_criterion(outputs: dict, labels: jnp.ndarray, cfg: M2FConfig, frame_mask=None):
    """Hungarian-matched set loss (reference criterion.py:176 SetCriterion).

    labels: (B, S, T) per-speaker activity (S ≤ num_queries; pad rows zero).
    Returns (loss, aux_dict).
    """

    def one_level(mask_logits, class_logits):
        B, Q, T = mask_logits.shape
        S = labels.shape[1]
        # cost matrix (B, Q, S): class + mask bce + dice
        p = jax.nn.sigmoid(mask_logits)
        eps = 1e-6
        bce_pos = -jnp.log(jnp.clip(p, eps, 1.0))
        bce_neg = -jnp.log(jnp.clip(1 - p, eps, 1.0))
        cost_mask = (
            jnp.einsum("bqt,bst->bqs", bce_pos, labels) + jnp.einsum("bqt,bst->bqs", bce_neg, 1 - labels)
        ) / T
        num = 2 * jnp.einsum("bqt,bst->bqs", p, labels)
        den = jnp.sum(p, axis=-1)[:, :, None] + jnp.sum(labels, axis=-1)[:, None, :]
        cost_dice = 1 - (num + 1) / (den + 1)
        cost_class = -jax.nn.sigmoid(class_logits)[:, :, None]
        cost = cfg.mask_weight * cost_mask + cfg.dice_weight * cost_dice + cfg.class_weight * cost_class
        if cfg.matcher == "fastinst":
            # location cost (fastinst_matcher.py:135-142): query location =
            # its peak-confidence frame; pay when the target is inactive
            # there (-[active] transposed → 0 when inside, else +weight)
            loc = jnp.argmax(mask_logits, axis=-1)  # (B, Q)
            inside = jnp.take_along_axis(
                labels[:, None, :, :],  # (B, 1, S, T)
                loc[:, :, None, None],  # (B, Q, 1, 1)
                axis=-1,
            )[..., 0]  # (B, Q, S)
            cost = cost + cfg.location_weight * (1.0 - inside)
        # only match real speakers (rows with any activity); pad columns get
        # a sentinel just above the real-cost range so float32 precision on
        # real-cost differences survives the JV potential updates
        real = jnp.sum(labels, axis=-1) > 0  # (B, S)
        real_max = jnp.max(
            jnp.where(real[:, None, :], cost, -jnp.inf), axis=(1, 2), keepdims=True
        )
        real_max = jnp.where(jnp.isfinite(real_max), real_max, 0.0)
        cost = jnp.where(real[:, None, :], cost, real_max + 1.0)
        # assign: queries (rows) ≥ speakers (cols) → transpose to (B, S, Q)
        assign = hungarian_assign(cost.transpose(0, 2, 1))  # (B, S) query index per speaker

        onehot = jax.nn.one_hot(assign, Q)  # (B, S, Q)
        matched = jnp.where(real[..., None], onehot, 0.0)
        # class targets: matched queries → 1, rest → 0 with no_object weight
        is_obj = jnp.max(matched, axis=1)  # (B, Q)
        w = is_obj + cfg.no_object_weight * (1 - is_obj)
        ce = jnp.maximum(class_logits, 0) - class_logits * is_obj + jnp.log1p(jnp.exp(-jnp.abs(class_logits)))
        class_loss = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        # mask losses on matched pairs
        pred = jnp.einsum("bsq,bqt->bst", matched, mask_logits)
        mce = jnp.maximum(pred, 0) - pred * labels + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        if frame_mask is not None:
            mce = mce * frame_mask[:, None, :]
        n_real = jnp.maximum(jnp.sum(real), 1.0)
        mask_loss = jnp.sum(mce * real[..., None]) / (n_real * T)
        d = dice_loss(jnp.where(real[..., None], pred, -1e9), labels)
        dice = jnp.sum(d * real) / n_real
        return cfg.class_weight * class_loss + cfg.mask_weight * mask_loss + cfg.dice_weight * dice, (
            class_loss,
            mask_loss,
            dice,
        )

    total, (cl, ml, dl) = one_level(outputs["mask_logits"], outputs["class_logits"])
    for m, c in zip(outputs.get("aux_mask_logits", []), outputs.get("aux_class_logits", [])):
        aux_total, _ = one_level(m, c)
        total = total + aux_total
    return total, {"class_loss": cl, "mask_loss": ml, "dice_loss": dl}


def m2f_predict_activity(outputs: dict, class_threshold: float = 0.5, max_concurrent: int = 0):
    """Inference: keep queries with class prob > threshold; activity =
    sigmoid masks of kept queries (reference infer_mask_model.py).

    max_concurrent > 0 additionally keeps only the top-k query activities
    per frame (reference model.py:213-272 infer2 "每帧最多选择两个说话人" —
    per-frame top-num_speakers selection), the reference's cap on
    simultaneous speakers that stops over-firing queries from stacking
    false alarms."""
    probs = jax.nn.sigmoid(outputs["class_logits"])  # (B, Q)
    masks = jax.nn.sigmoid(outputs["mask_logits"])  # (B, Q, T)
    keep = probs > class_threshold
    act = masks * keep[..., None]
    Q = act.shape[1]
    if 0 < max_concurrent < Q:
        kth = -jnp.sort(-act, axis=1)[:, max_concurrent - 1 : max_concurrent]  # (B, 1, T)
        act = jnp.where(act >= kth, act, 0.0)
    return act, keep
