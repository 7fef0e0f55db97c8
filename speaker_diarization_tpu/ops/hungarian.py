"""Hungarian (linear sum assignment) for set-prediction matching.

The reference's EEND-M2F matcher uses scipy on host
(`eend_m2f/mask2former_matcher.py`); here the cost matrix is computed on
device and the tiny assignment problem (N queries ≤ 32) goes through
`jax.pure_callback` to scipy — jit/vmap-compatible, negligible host time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """cost (B, N, M) → (B, N) column index assigned to each row."""
    from scipy.optimize import linear_sum_assignment

    out = np.zeros(cost.shape[:2], np.int32)
    for b in range(cost.shape[0]):
        r, c = linear_sum_assignment(cost[b])
        out[b, r] = c
    return out


def hungarian_assign(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched assignment: cost (B, N, M) with N ≤ M → (B, N) int32 columns."""
    B, N, M = cost.shape
    cost = jax.lax.stop_gradient(jnp.nan_to_num(cost, nan=1e9, posinf=1e9, neginf=-1e9))
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((B, N), jnp.int32),
        cost,
        vmap_method="sequential",
    )


def dice_loss(pred_logits: jnp.ndarray, targets: jnp.ndarray, eps: float = 1.0) -> jnp.ndarray:
    """Soft dice on sigmoid(mask logits): (..., T) → (...)."""
    p = jax.nn.sigmoid(pred_logits)
    num = 2 * jnp.sum(p * targets, axis=-1)
    den = jnp.sum(p, axis=-1) + jnp.sum(targets, axis=-1)
    return 1.0 - (num + eps) / (den + eps)
