"""Powerset multi-class encoding of multilabel speaker activity.

Used by the SOND family (2517 PSE labels over ≤16 speakers, reference
speaker_diarization/sond/models.py:103-109) and the DiariZen-style powerset
EEND-VC (egs/magicdata-ramc/eend_vc — pyannote Powerset + permutation +
NLL). Classes are all speaker subsets of size ≤ max_set_size, ordered by
(set size, lexicographic): [∅, {0}, …, {K-1}, {0,1}, {0,2}, …].
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from . import losses as L


@functools.lru_cache(maxsize=32)
def powerset_mapping(n_speakers: int, max_set_size: int = 2) -> np.ndarray:
    """(n_classes, n_speakers) binary matrix: class → active speakers."""
    rows = []
    for size in range(max_set_size + 1):
        for combo in itertools.combinations(range(n_speakers), size):
            row = np.zeros(n_speakers, np.float32)
            row[list(combo)] = 1.0
            rows.append(row)
    return np.stack(rows)


def n_powerset_classes(n_speakers: int, max_set_size: int = 2) -> int:
    return powerset_mapping(n_speakers, max_set_size).shape[0]


def multilabel_to_powerset(labels: jnp.ndarray, n_speakers: int, max_set_size: int = 2) -> jnp.ndarray:
    """(…, n_speakers) {0,1} → (…,) class indices (nearest class when the
    true set exceeds max_set_size)."""
    A = jnp.asarray(powerset_mapping(n_speakers, max_set_size))  # (C, K)
    # choose the class whose set maximizes matched actives minus mismatches
    score = jnp.einsum("...k,ck->...c", labels * 2.0 - 1.0, A) - jnp.sum(A, axis=-1) * 0.5
    return jnp.argmax(score, axis=-1)


def powerset_to_multilabel(idx: jnp.ndarray, n_speakers: int, max_set_size: int = 2) -> jnp.ndarray:
    A = jnp.asarray(powerset_mapping(n_speakers, max_set_size))
    return A[idx]


def powerset_pit_ce(
    logits: jnp.ndarray,  # (B, T, n_classes)
    labels: jnp.ndarray,  # (B, T, n_speakers) multilabel
    n_speakers: int,
    max_set_size: int = 2,
    frame_mask: jnp.ndarray | None = None,
    label_smoothing: float = 0.0,
    permutation_invariant: bool = True,
):
    """Permutation-invariant powerset cross-entropy.

    The best speaker permutation is found on the multilabel marginals
    (probabilities folded back through the mapping, as pyannote's
    `permutate` does on the powerset posteriors), then CE is computed on
    the permuted class targets. Returns (loss, permuted class targets).

    `permutation_invariant=False` computes CE on the labels in the given
    channel order — REQUIRED for profile-conditioned models (SOND): the
    reference scores channel i against profile i with a straight
    LabelSmoothingLoss (sond/models.py:118-130, label_smoothing_loss.py:14),
    and inference assumes that binding. Round 3 trained SOND with PIT here
    and the model fit a permuted solution (train CE fell to 0.80 while
    frame-DER vs the unpermuted labels stalled at ~0.6) — the profile
    binding never formed and leaderboard DER stuck at the baseline.
    """
    if not permutation_invariant:
        target_idx = multilabel_to_powerset(labels, n_speakers, max_set_size)
        return _powerset_ce(logits, target_idx, frame_mask, label_smoothing), target_idx
    A = jnp.asarray(powerset_mapping(n_speakers, max_set_size))  # (C, K)
    probs = jax.nn.softmax(logits, axis=-1)
    marginals = jnp.einsum("btc,ck->btk", probs, A)  # (B, T, K) speaker probs
    # PIT on marginals (BCE against labels) — reuse the pairwise machinery
    eps = 1e-6
    marg_logits = jnp.log(jnp.clip(marginals, eps, 1 - eps)) - jnp.log(
        jnp.clip(1 - marginals, eps, 1 - eps)
    )
    _, labels_perm, perm = L.pit_loss(marg_logits, labels, frame_mask=frame_mask)
    target_idx = multilabel_to_powerset(labels_perm, n_speakers, max_set_size)
    return _powerset_ce(logits, target_idx, frame_mask, label_smoothing), target_idx


def _powerset_ce(logits, target_idx, frame_mask=None, label_smoothing: float = 0.0):
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(target_idx, n_classes)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / n_classes
    ce = -jnp.sum(onehot * logp, axis=-1)  # (B, T)
    if frame_mask is not None:
        return jnp.sum(ce * frame_mask) / jnp.maximum(jnp.sum(frame_mask), 1.0)
    return jnp.mean(ce)
