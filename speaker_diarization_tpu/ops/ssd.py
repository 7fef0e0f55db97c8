"""State-space duality (SSD) scan — the Mamba-2 core, in chunked matmul form.

Reference behavior: `egs/alimeeting/ts_vad2/mamba.py:150-233` (Mamba2BlockV2)
wraps `mamba_ssm.modules.mamba2.Mamba2`, whose hot op is the Triton
`mamba_chunk_scan_combined` kernel. On TPU we use the same block-decomposed
algorithm (Dao & Gu 2024, "Transformers are SSMs"), which is *already* the
MXU-native formulation: everything is batched matmuls over length-L chunks
plus one tiny `lax.scan` over chunk boundaries for the state carry — no
elementwise recurrence over time, so XLA tiles it straight onto the MXU.

Semantics (per batch b, head h, channel p, state n):
    h_t = exp(dt_t * A_h) * h_{t-1} + dt_t * B_t[n] * x_t[p]
    y_t = sum_n C_t[n] * h_t[n, p] + D_h * x_t[p]
with A_h < 0 a scalar per head (Mamba-2's restriction vs Mamba-1's
per-channel diagonal), and B/C shared across head groups.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _repeat_groups(t: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(B, T, G, N) → (B, T, H, N) by repeating each group H/G times."""
    g = t.shape[2]
    if g == n_heads:
        return t
    return jnp.repeat(t, n_heads // g, axis=2)


def ssd_chunked(
    x: jnp.ndarray,  # (B, T, H, P)
    dt: jnp.ndarray,  # (B, T, H), positive (already softplus'd)
    A: jnp.ndarray,  # (H,), negative
    Bm: jnp.ndarray,  # (B, T, G, N)
    Cm: jnp.ndarray,  # (B, T, G, N)
    D: jnp.ndarray | None = None,  # (H,)
    chunk: int = 64,
) -> jnp.ndarray:
    """Chunked SSD scan; returns y of shape (B, T, H, P). float32 math."""
    Bsz, T, H, P = x.shape
    pad = (-T) % chunk
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0), (0, 0)))
        Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0), (0, 0)))
    Tp = T + pad
    NC, L = Tp // chunk, chunk

    Bh = _repeat_groups(Bm, H)  # (B, Tp, H, N)
    Ch = _repeat_groups(Cm, H)

    def r(t, extra):  # (B, Tp, ...) → (B, NC, L, ...)
        return t.reshape((Bsz, NC, L) + extra)

    xc = r(x, (H, P))
    dtc = r(dt, (H,))
    bc = r(Bh, (H, Bh.shape[-1]))
    cc = r(Ch, (H, Ch.shape[-1]))

    a = dtc * A  # (B, NC, L, H) log-decay per step
    cum = jnp.cumsum(a, axis=2)  # inclusive cumsum within chunk

    # ---- intra-chunk (causal "attention" with decay mask) ----
    # decay[i, j] = exp(cum_i - cum_j) for i >= j (state at i from input at j)
    seg = cum[:, :, :, None, :] - cum[:, :, None, :, :]  # (B, NC, Li, Lj, H)
    causal = jnp.tril(jnp.ones((L, L), dtype=bool))
    decay = jnp.exp(jnp.where(causal[None, None, :, :, None], seg, -jnp.inf))
    cb = jnp.einsum("bclhn,bcshn->bclsh", cc, bc)  # (B, NC, Li, Lj, H)
    y_intra = jnp.einsum("bclsh,bcsh,bcshp->bclhp", cb * decay, dtc, xc)

    # ---- chunk states + carry scan ----
    # state contribution of chunk c: S_c = sum_j exp(cum_last - cum_j) dt_j B_j x_j
    last = cum[:, :, -1:, :]  # (B, NC, 1, H)
    w = jnp.exp(last - cum) * dtc  # (B, NC, L, H)
    S_local = jnp.einsum("bclh,bclhn,bclhp->bchnp", w, bc, xc)
    E = jnp.exp(last[:, :, 0, :])  # (B, NC, H) whole-chunk decay

    def carry_step(S, inp):
        S_loc, e = inp  # S: (B, H, N, P)
        S_next = e[:, :, None, None] * S + S_loc
        return S_next, S  # emit the carry *before* this chunk

    S0 = jnp.zeros((Bsz, H, Bh.shape[-1], P), x.dtype)
    _, S_prev = jax.lax.scan(
        carry_step, S0, (jnp.moveaxis(S_local, 1, 0), jnp.moveaxis(E, 1, 0))
    )
    S_prev = jnp.moveaxis(S_prev, 0, 1)  # (B, NC, H, N, P)

    # inter-chunk: y_l += exp(cum_l) * C_l · S_prev
    y_inter = jnp.einsum("bclh,bclhn,bchnp->bclhp", jnp.exp(cum), cc, S_prev)

    y = (y_intra + y_inter).reshape(Bsz, Tp, H, P)[:, :T]
    if D is not None:
        y = y + x[:, :T] * D[None, None, :, None]
    return y


def ssd_sequential(x, dt, A, Bm, Cm, D=None):
    """Per-step oracle for tests; same signature/shapes as ssd_chunked."""
    Bsz, T, H, P = x.shape
    Bh = _repeat_groups(Bm, H)
    Ch = _repeat_groups(Cm, H)

    def step(h, inp):
        xt, dtt, bt, ct = inp  # (B,H,P) (B,H) (B,H,N) (B,H,N)
        decay = jnp.exp(dtt * A)  # (B, H)
        h = decay[:, :, None, None] * h + jnp.einsum(
            "bh,bhn,bhp->bhnp", dtt, bt, xt
        )
        y = jnp.einsum("bhn,bhnp->bhp", ct, h)
        return h, y

    h0 = jnp.zeros((Bsz, H, Bh.shape[-1], P), x.dtype)
    _, ys = jax.lax.scan(
        step,
        h0,
        (
            jnp.moveaxis(x, 1, 0),
            jnp.moveaxis(dt, 1, 0),
            jnp.moveaxis(Bh, 1, 0),
            jnp.moveaxis(Ch, 1, 0),
        ),
    )
    y = jnp.moveaxis(ys, 0, 1)
    if D is not None:
        y = y + x * D[None, None, :, None]
    return y
