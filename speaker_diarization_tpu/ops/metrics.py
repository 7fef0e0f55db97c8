"""Frame-level diarization error statistics (training-time reporting).

Matches the reference's `calc_diarization_error`
(`/root/reference/speaker_diarization/eend/loss.py:70-103`,
`egs/alimeeting/ts_vad2/model.py:973-1048`) but batched and jit-able:
one call over (B, T, C) tensors with masks instead of per-sample loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def diarization_error_stats(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    frame_mask: jnp.ndarray | None = None,
    threshold: float = 0.5,
) -> dict[str, jnp.ndarray]:
    """Frame-level DER decomposition from pre-activations.

    Args:
      logits: (B, T, C) pre-activations (sigmoid applied internally).
      labels: (B, T, C) {0,1}.
      frame_mask: optional (B, T) validity mask.
    Returns:
      dict of scalar counts: speech_scored/miss/falarm, speaker_scored/
      miss/falarm/error, correct, frames, diarization_error. DER% =
      diarization_error / speaker_scored.
    """
    decisions = (jax.nn.sigmoid(logits) > threshold).astype(jnp.int32)
    labels = labels.astype(jnp.int32)
    if frame_mask is None:
        fm = jnp.ones(logits.shape[:2], dtype=jnp.int32)
    else:
        fm = frame_mask.astype(jnp.int32)
    decisions = decisions * fm[..., None]
    labels = labels * fm[..., None]

    n_ref = jnp.sum(labels, axis=-1)  # (B, T)
    n_sys = jnp.sum(decisions, axis=-1)
    res = {}
    res["speech_scored"] = jnp.sum(((n_ref > 0) & (fm > 0)).astype(jnp.int32))
    res["speech_miss"] = jnp.sum(((n_ref > 0) & (n_sys == 0)).astype(jnp.int32))
    res["speech_falarm"] = jnp.sum(((n_ref == 0) & (n_sys > 0) & (fm > 0)).astype(jnp.int32))
    res["speaker_scored"] = jnp.sum(n_ref)
    res["speaker_miss"] = jnp.sum(jnp.maximum(n_ref - n_sys, 0))
    res["speaker_falarm"] = jnp.sum(jnp.maximum(n_sys - n_ref, 0))
    n_map = jnp.sum((labels == 1) & (decisions == 1), axis=-1)
    res["speaker_error"] = jnp.sum(jnp.minimum(n_ref, n_sys) - n_map)
    C = labels.shape[-1]
    res["correct"] = jnp.sum((labels == decisions).all(axis=-1).astype(jnp.int32) * fm)
    res["frames"] = jnp.sum(fm)
    res["diarization_error"] = res["speaker_miss"] + res["speaker_falarm"] + res["speaker_error"]
    return res


def der_from_stats(stats: dict) -> jnp.ndarray:
    """Frame-level DER = (miss + falarm + confusion) / scored speaker-frames."""
    return stats["diarization_error"] / jnp.maximum(stats["speaker_scored"], 1)
