"""Permutation-invariant training (PIT) losses and friends, TPU-first.

Semantics match the reference implementations
(`/root/reference/speaker_diarization/eend/loss.py:20-67`,
`fs_eend/loss.py:257-330` — the O(C²) pairwise-cost formulation,
`eend_eda/models.py:654-692` — attractor existence loss), but everything here
is batched, static-shaped and fully vectorized:

- the pairwise BCE cost matrix (B, C, C) is one fused elementwise+reduce op;
- the min over C! permutations is a gather over a precomputed permutation
  index table (C ≤ 6 in practice, so C! ≤ 720 rows — tiny) followed by a
  reduction, instead of a Python loop over `itertools.permutations`;
- variable per-sample speaker counts are handled with masks, not ragged lists.

All functions are jit/vmap/pjit-compatible (no data-dependent shapes).
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np


def bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on pre-activations (stable form)."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    """Gradient-safe L2 normalization.

    `x / max(norm(x), eps)` has a NaN gradient at exactly-zero rows (the
    derivative of the norm at 0 is 0/0, and `0 * nan = nan` survives the
    clamp). This form — `x * rsqrt(sum(x²) + eps²)` — is finite everywhere,
    which matters because zero rows DO occur (zero-vector silence speakers in
    TS-VAD/SOND enrollment, reference ts_vad_dataset.py:508).
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps * eps)


@functools.lru_cache(maxsize=16)
def permutation_table(n: int) -> np.ndarray:
    """(n!, n) int32 table of all permutations of range(n)."""
    return np.array(list(itertools.permutations(range(n))), dtype=np.int32)


def pairwise_bce_cost(
    logits: jnp.ndarray, labels: jnp.ndarray, frame_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Pairwise PIT cost matrix.

    Args:
      logits: (B, T, C) pre-activations.
      labels: (B, T, C) {0,1} targets.
      frame_mask: optional (B, T) validity mask (1 = real frame).
    Returns:
      cost: (B, C, C); cost[b, i, j] = sum over valid frames of
        BCE(logits[b, :, i], labels[b, :, j]).
    """
    # (B, T, C, 1) vs (B, T, 1, C) → (B, T, C, C), summed over T.
    l = logits[..., :, None]
    t = labels[..., None, :]
    e = jnp.maximum(l, 0.0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
    if frame_mask is not None:
        e = e * frame_mask[..., None, None]
    return jnp.sum(e, axis=-3)


def pit_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    frame_mask: jnp.ndarray | None = None,
    spk_mask: jnp.ndarray | None = None,
):
    """Batched permutation-invariant BCE.

    Args:
      logits: (B, T, C) pre-activations.
      labels: (B, T, C) {0,1} targets (padded speaker columns must be 0).
      frame_mask: optional (B, T) frame validity (1 = real frame).
      spk_mask: optional (B, C) speaker validity (1 = real speaker). When a
        sample has n < C speakers, only permutations that map the first n
        prediction channels onto the n real label channels are considered
        (matching the reference's select_perm_indices semantics).
    Returns:
      loss: scalar — total min-perm BCE summed over batch / total frame count
        (the reference's normalization: per-frame mean CE averaged over C).
      labels_perm: (B, T, C) labels under the best permutation per sample.
      best_perm: (B, C) int32 — labels_perm[b, t, i] = labels[b, t, best_perm[b, i]].
    """
    B, T, C = logits.shape
    cost = pairwise_bce_cost(logits, labels, frame_mask)  # (B, C, C)
    perms = jnp.asarray(permutation_table(C))  # (P, C)
    # per-perm cost: sum_i cost[b, i, perms[p, i]]  → (B, P)
    perm_cost = jnp.sum(jnp.take_along_axis(cost[:, None, :, :], perms[None, :, :, None], axis=-1)[..., 0], axis=-1)

    if spk_mask is not None:
        # A permutation is valid iff every real prediction channel i
        # (i < n_b) maps to a real label channel (perms[p, i] < n_b).
        n = jnp.sum(spk_mask, axis=-1, keepdims=True)  # (B, 1)
        maps_real = perms[None, :, :] < n[:, :, None]  # (B, P, C)
        is_real = jnp.arange(C)[None, None, :] < n[:, :, None]
        valid = jnp.all(maps_real == is_real, axis=-1)  # (B, P)
        perm_cost = jnp.where(valid, perm_cost, jnp.inf)

    best = jnp.argmin(perm_cost, axis=-1)  # (B,)
    best_perm = perms[best]  # (B, C)
    labels_perm = jnp.take_along_axis(labels, best_perm[:, None, :], axis=-1)
    min_cost = jnp.min(perm_cost, axis=-1)  # (B,)

    if frame_mask is not None:
        n_frames = jnp.sum(frame_mask)
    else:
        n_frames = jnp.asarray(B * T, dtype=logits.dtype)
    # reference: per-sample mean-over-(T,C) CE * T, summed, / total frames
    loss = jnp.sum(min_cost / C) / jnp.maximum(n_frames, 1.0)
    return loss, labels_perm, best_perm


def standard_bce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    frame_mask: jnp.ndarray | None = None,
    spk_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Masked mean BCE without permutation (TS-VAD style, model.py:1050)."""
    e = bce_with_logits(logits, labels)
    m = jnp.ones_like(e)
    if frame_mask is not None:
        m = m * frame_mask[..., None]
    if spk_mask is not None:
        m = m * spk_mask[..., None, :]
    return jnp.sum(e * m) / jnp.maximum(jnp.sum(m), 1.0)


def attractor_existence_loss(
    exist_logits: jnp.ndarray, spk_mask: jnp.ndarray
) -> jnp.ndarray:
    """EEND-EDA attractor existence BCE (reference eend_eda/models.py:654-692).

    Args:
      exist_logits: (B, C+1) logits for C+1 decoded attractors.
      spk_mask: (B, C) — 1 for real speakers. The target for sample b is
        [1]*n_b followed by a 0 for the (n_b+1)-th attractor; remaining
        positions are excluded from the loss.
    """
    B, C1 = exist_logits.shape
    C = C1 - 1
    n = jnp.sum(spk_mask, axis=-1, keepdims=True)  # (B, 1)
    pos = jnp.arange(C1)[None, :]
    target = (pos < n).astype(exist_logits.dtype)
    valid = (pos <= n).astype(exist_logits.dtype)
    e = bce_with_logits(exist_logits, target) * valid
    return jnp.sum(e) / jnp.maximum(jnp.sum(valid), 1.0)


def focal_bce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Focal BCE (SSND, reference ssnd_model.py:483)."""
    p = jax.nn.sigmoid(logits)
    ce = bce_with_logits(logits, labels)
    p_t = p * labels + (1 - p) * (1 - labels)
    a_t = alpha * labels + (1 - alpha) * (1 - labels)
    e = a_t * ((1 - p_t) ** gamma) * ce
    if frame_mask is not None:
        e = e * frame_mask[..., None]
        return jnp.sum(e) / jnp.maximum(jnp.sum(frame_mask) * logits.shape[-1], 1.0)
    return jnp.mean(e)


def pit_loss_bruteforce_reference(logits, labels):
    """O(C!) straight port of the per-sample reference loss — test oracle only.

    NumPy, unbatched: returns (min mean-BCE * T, best permutation).
    """
    logits = np.asarray(logits, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.float64)
    T, C = logits.shape
    best, best_perm = np.inf, None
    for p in itertools.permutations(range(C)):
        lp = labels[:, list(p)]
        e = np.maximum(logits, 0) - logits * lp + np.log1p(np.exp(-np.abs(logits)))
        m = e.mean()
        if m < best:
            best, best_perm = m, p
    return best * T, best_perm
