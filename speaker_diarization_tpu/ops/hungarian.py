"""Hungarian (linear sum assignment) for set-prediction matching.

The reference's EEND-M2F matcher uses scipy on host
(`eend_m2f/mask2former_matcher.py`). Host callbacks are not available on
every TPU runtime (and a per-step host round trip through a remote chip
is pure latency), so the assignment runs ON DEVICE: an exact
Jonker–Volgenant shortest-augmenting-path solver in pure JAX
(`lax.while_loop`/`fori_loop`, fixed shapes, O(N·M²) — trivial for the
≤32-query problems set prediction produces). scipy remains only as the
test oracle (`_lsa_host`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _lsa_host(cost: np.ndarray) -> np.ndarray:
    """Test oracle: cost (B, N, M) → (B, N) column assigned per row (scipy)."""
    from scipy.optimize import linear_sum_assignment

    out = np.zeros(cost.shape[:2], np.int32)
    for b in range(cost.shape[0]):
        r, c = linear_sum_assignment(cost[b])
        out[b, r] = c
    return out


_INF = jnp.float32(1e30)


def _lsa_device_single(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact rectangular assignment on device: cost (N, M), N ≤ M → (N,) cols.

    Jonker–Volgenant shortest augmenting path with row/column potentials
    (the e-maxx formulation, 1-indexed with a virtual column 0). All loops
    are lax control flow with fixed-shape carries, so the whole solver
    compiles into the training step.
    """
    N, M = cost.shape
    A = jnp.zeros((N + 1, M + 1), jnp.float32)
    A = A.at[1:, 1:].set(cost.astype(jnp.float32))

    def solve_row(i, carry):
        u, v, p, way = carry
        # start an augmenting search from row i at virtual column 0
        p = p.at[0].set(i)
        minv = jnp.full((M + 1,), _INF)
        used = jnp.zeros((M + 1,), bool)
        cols = jnp.arange(M + 1)

        def cond(st):
            _, _, _, _, _, j0, done = st
            return ~done

        def body(st):
            u, v, minv, used, way, j0, _ = st
            used = used.at[j0].set(True)
            i0 = p[j0]
            cur = A[i0] - u[i0] - v  # (M+1,)
            better = (~used) & (cur < minv)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            scan_min = jnp.where(used | (cols == 0), _INF, minv)
            j1 = jnp.argmin(scan_min)
            delta = scan_min[j1]
            # update potentials: used columns' rows gain delta, others shrink
            u = u.at[p].add(jnp.where(used, delta, 0.0))
            v = jnp.where(used, v - delta, v)
            minv = jnp.where(used, minv, minv - delta)
            done = p[j1] == 0
            return u, v, minv, used, way, j1, done

        u, v, minv, used, way, j0, _ = jax.lax.while_loop(
            cond, body, (u, v, minv, used, way, jnp.int32(0), jnp.bool_(False))
        )

        # augment: walk `way` links back to the virtual column
        def aug_cond(st):
            _, j0 = st
            return j0 != 0

        def aug_body(st):
            p, j0 = st
            j1 = way[j0]
            p = p.at[j0].set(p[j1])
            return p, j1

        p, _ = jax.lax.while_loop(aug_cond, aug_body, (p, j0))
        return u, v, p, way

    u0 = jnp.zeros((N + 1,), jnp.float32)
    v0 = jnp.zeros((M + 1,), jnp.float32)
    p0 = jnp.zeros((M + 1,), jnp.int32)  # p[j] = row matched to column j (0 = free)
    way0 = jnp.zeros((M + 1,), jnp.int32)
    _, _, p, _ = jax.lax.fori_loop(1, N + 1, solve_row, (u0, v0, p0, way0))

    # invert: ans[row-1] = col-1
    rows = p[1:]  # (M,) row index (1-based) per column, 0 if unmatched
    ans = jnp.zeros((N,), jnp.int32)
    ans = ans.at[jnp.where(rows > 0, rows - 1, N)].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop"
    )
    return ans


def hungarian_assign(cost: jnp.ndarray) -> jnp.ndarray:
    """Batched exact assignment: cost (B, N, M), N ≤ M → (B, N) int32 columns.

    Runs entirely on device (vmapped JV solver) — jit/grad-safe
    (stop_gradient'd input, integer output).
    """
    B, N, M = cost.shape
    if N > M:
        raise ValueError(f"hungarian_assign expects N <= M, got {(N, M)}")
    # Keep float32 precision on the entries that matter: replace nan/inf
    # with a sentinel near the real-cost scale, then subtract the per-matrix
    # min so potentials stay small (a 1e9 sentinel would quantize real-cost
    # differences below its float32 ULP once it enters the search).
    cost = jax.lax.stop_gradient(cost)
    finite = jnp.isfinite(cost)
    fmax = jnp.max(jnp.where(finite, cost, -jnp.inf), axis=(1, 2), keepdims=True)
    fmin = jnp.min(jnp.where(finite, cost, jnp.inf), axis=(1, 2), keepdims=True)
    fmax = jnp.where(jnp.isfinite(fmax), fmax, 0.0)
    fmin = jnp.where(jnp.isfinite(fmin), fmin, 0.0)
    sentinel = fmax + jnp.maximum(fmax - fmin, 1.0)
    cost = jnp.where(finite, cost, sentinel) - fmin
    return jax.vmap(_lsa_device_single)(cost)


def dice_loss(pred_logits: jnp.ndarray, targets: jnp.ndarray, eps: float = 1.0) -> jnp.ndarray:
    """Soft dice on sigmoid(mask logits): (..., T) → (...)."""
    p = jax.nn.sigmoid(pred_logits)
    num = 2 * jnp.sum(p * targets, axis=-1)
    den = jnp.sum(p, axis=-1) + jnp.sum(targets, axis=-1)
    return 1.0 - (num + eps) / (den + eps)
