"""Fused Pallas selective-scan (Mamba S6) kernel.

TPU-native replacement for the CUDA/Triton `selective_scan_fn` the reference
wraps (`egs/alimeeting/ts_vad2/mamba.py:11-15`). The pure-JAX
`ops.mamba_scan.selective_scan` expresses the recurrence as a log-depth
associative scan, which materializes the (B, T, D, N) discretized tensors in
HBM and re-reads them log2(T) times. This kernel instead streams the raw
inputs HBM→VMEM once per time-chunk and carries the (N, D) state in VMEM
across chunks, so HBM traffic is O(B·T·(2D+2N)) — independent of N·D — and
the recurrence runs at VPU speed on-chip.

Layout: the state is kept (N, D) — d_state on sublanes (8/16/32… fine for
f32), d_inner on lanes (multiples of 128 at model sizes). Time advances in
aligned 8-row sub-blocks; inside one, the recurrence unrolls with static
indices and the B-outer-product / C-contraction run as rank-1 / K=N
dot_generals at Precision.HIGHEST (default MXU passes lose ~4e-3 relative
over 100 steps; HIGHEST restores ≤1e-6 vs the sequential oracle). Measured
on v5e at TS-VAD shape (64×100×768, N=16): 2.9 ms vs 14.3 ms for the
associative scan — 4.8×.

Grid = (batch, time-chunks); TPU executes the grid sequentially with the
last axis fastest, so the VMEM carry is valid across the chunk axis and is
reset whenever chunk_idx == 0.

Gradients: `selective_scan_fused` is a custom_vjp with a hand-written
Pallas backward: the forward saves only each chunk's initial state
((B·T/L, N, D), L× smaller than the state trajectory); the backward walks
chunks in reverse grid order, replays sub-block entry states once per
chunk into VMEM scratch, and runs the adjoint recurrence
dh_t = C_t⊗g_t + a_{t+1}⊙dh_{t+1}, accumulating dA/dD across grid steps
into a shared output block. Measured full value-and-grad at TS-VAD shape
(64×100×768, N=16) on v5e: 7.7 ms vs 52.9 ms through the associative scan
— 6.9×; per-input grads match jax.grad of the associative formulation to
~1e-6 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_SUB = 8  # time sub-block: f32 sublane granularity; statically unrolled


def _scan_kernel(x_ref, dt_ref, b_ref, c_ref, a_ref, d_ref, y_ref, h_scr, *, chunk):
    """One (batch, time-chunk) grid step.

    x_ref/dt_ref: (1, L, D); b_ref/c_ref: (1, L, N); a_ref: (N, D);
    d_ref: (1, D); y_ref: (1, L, D); h_scr: (N, D) f32 carry.

    Time advances in aligned _SUB-row slices (Mosaic needs provably aligned
    sublane offsets; per-element dynamic lane slices are not legal). Inside
    a sub-block the recurrence is unrolled with static indices; the B-outer
    product and C-contraction are rank-1 / K=N dot_generals.
    """

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    A = a_ref[:].astype(jnp.float32)  # (N, D)
    Dskip = d_ref[:].astype(jnp.float32)  # (1, D)
    outer = (((0,), (0,)), ((), ()))  # (1,N)·(1,D) → (N,D)
    contract = (((1,), (0,)), ((), ()))  # (1,N)·(N,D) → (1,D)

    def body(i, h):
        off = pl.multiple_of(i * _SUB, _SUB)
        dtb = dt_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)  # (S, D)
        xb = x_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)  # (S, D)
        bb = b_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)  # (S, N)
        cb = c_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)  # (S, N)
        dxb = dtb * xb
        ys = []
        for s in range(_SUB):
            dts = dtb[s : s + 1, :]  # (1, D)
            h = jnp.exp(dts * A) * h + jax.lax.dot_general(
                bb[s : s + 1, :], dxb[s : s + 1, :], outer,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            ys.append(
                jax.lax.dot_general(
                    cb[s : s + 1, :], h, contract,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        y_ref[0, pl.ds(off, _SUB), :] = (
            jnp.concatenate(ys, axis=0) + Dskip * xb
        ).astype(y_ref.dtype)
        return h

    h_scr[:] = jax.lax.fori_loop(0, chunk // _SUB, body, h_scr[:])


def selective_scan_pallas(
    x: jnp.ndarray,  # (B, T, D)
    delta: jnp.ndarray,  # (B, T, D)
    A: jnp.ndarray,  # (D, N)
    Bm: jnp.ndarray,  # (B, T, N)
    C: jnp.ndarray,  # (B, T, N)
    D: jnp.ndarray,  # (D,)
    chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward selective scan; same contract as ops.mamba_scan."""
    B_, T, Dd = x.shape
    N = A.shape[1]
    chunk = max(_SUB, (chunk // _SUB) * _SUB)
    L = min(chunk, -(-T // _SUB) * _SUB)
    n_chunks = -(-T // L)
    Tp = n_chunks * L
    if Tp != T:
        # zero padding is recurrence-neutral: dt=0 → decay 1, update 0
        pad = ((0, 0), (0, Tp - T), (0, 0))
        x = jnp.pad(x, pad)
        delta = jnp.pad(delta, pad)
        Bm = jnp.pad(Bm, pad)
        C = jnp.pad(C, pad)

    At = A.T.astype(jnp.float32)  # (N, D)
    D2 = D.reshape(1, Dd).astype(jnp.float32)

    y = pl.pallas_call(
        functools.partial(_scan_kernel, chunk=L),
        grid=(B_, n_chunks),
        in_specs=[
            pl.BlockSpec((1, L, Dd), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dd), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, Dd), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_, Tp, Dd), x.dtype),
        scratch_shapes=[pltpu.VMEM((N, Dd), jnp.float32)],
        interpret=interpret,
    )(x, delta, Bm, C, At, D2)
    return y[:, :T]


def _scan_kernel_with_states(
    x_ref, dt_ref, b_ref, c_ref, a_ref, d_ref, y_ref, h0_ref, h_scr, *, chunk
):
    """Forward that also emits each chunk's INITIAL state (for the backward's
    chunk-local recomputation). Same math as _scan_kernel."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[:] = jnp.zeros_like(h_scr)

    h0_ref[0] = h_scr[:]
    A = a_ref[:].astype(jnp.float32)
    Dskip = d_ref[:].astype(jnp.float32)
    outer = (((0,), (0,)), ((), ()))
    contract = (((1,), (0,)), ((), ()))

    def body(i, h):
        off = pl.multiple_of(i * _SUB, _SUB)
        dtb = dt_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
        xb = x_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
        bb = b_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
        cb = c_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
        dxb = dtb * xb
        ys = []
        for s in range(_SUB):
            dts = dtb[s : s + 1, :]
            h = jnp.exp(dts * A) * h + jax.lax.dot_general(
                bb[s : s + 1, :], dxb[s : s + 1, :], outer,
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            ys.append(
                jax.lax.dot_general(
                    cb[s : s + 1, :], h, contract,
                    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
                )
            )
        y_ref[0, pl.ds(off, _SUB), :] = (jnp.concatenate(ys, axis=0) + Dskip * xb).astype(y_ref.dtype)
        return h

    h_scr[:] = jax.lax.fori_loop(0, chunk // _SUB, body, h_scr[:])


def _scan_bwd_kernel(
    x_ref, dt_ref, b_ref, c_ref, a_ref, d_ref, h0_ref, g_ref,
    dx_ref, ddt_ref, db_ref, dc_ref, da_ref, dd_ref, dh_scr, hent_scr, *, chunk,
):
    """Backward for one (batch, reverse-chunk) grid step.

    Chunks are visited in REVERSE time order (the index maps flip the chunk
    axis). Within a chunk, states h_t are recomputed forward from the saved
    chunk-initial state h0 (stored in VMEM), then gradients run backward
    carrying dh across chunks in scratch. dA/dD map every grid step to the
    same block and accumulate (zeroed on the first grid step).

    Recurrence gradients (h_t = exp(Δ_t⊗A)·h_{t-1} + B_t⊗(Δ_t·x_t),
    y_t = C_t·h_t + D·x_t):
      dh_t  = C_t ⊗ g_t + a_{t+1} ⊙ dh_{t+1}
      dC_t  = Σ_d g_t,d · h_t,·,d
      dB_t  = Σ_d dh_t,·,d · (Δ_t x_t)_d
      dΔ_t  = Σ_n [ (dh_t a_t h_{t-1}) ⊙ A + dh_t · B_t,n x_t ]_{n,·}
      dA    += Σ_t (dh_t ⊙ a_t ⊙ h_{t-1}) · Δ_t
      dx_t  = Δ_t · (B_t·dh_t) + D ⊙ g_t ;  dD += Σ_t g_t ⊙ x_t
    """

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        da_ref[:] = jnp.zeros_like(da_ref)
        dd_ref[:] = jnp.zeros_like(dd_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    A = a_ref[:].astype(jnp.float32)  # (N, D)
    Dskip = d_ref[:].astype(jnp.float32)  # (1, D)
    outer = (((0,), (0,)), ((), ()))  # (1,N)·(1,D) → (N,D)
    contract = (((1,), (0,)), ((), ()))  # (1,N)·(N,D) → (1,D)

    n_sub = chunk // _SUB
    dA_acc = jnp.zeros_like(A)
    dD_acc = jnp.zeros_like(Dskip)
    dh = dh_scr[:]

    # pass 1: replay the chunk once, storing every sub-block's ENTRY state
    # (O(L) work; a per-sub-block replay-from-h0 would be O(L²/S))
    def store_entries(k, h):
        hent_scr[pl.ds(k, 1)] = h[None]
        o2 = pl.multiple_of(k * _SUB, _SUB)
        dt2 = dt_ref[0, pl.ds(o2, _SUB), :].astype(jnp.float32)
        x2 = x_ref[0, pl.ds(o2, _SUB), :].astype(jnp.float32)
        b2 = b_ref[0, pl.ds(o2, _SUB), :].astype(jnp.float32)
        dx2 = dt2 * x2
        for s in range(_SUB):
            dts = dt2[s : s + 1, :]
            h = jnp.exp(dts * A) * h + jax.lax.dot_general(
                b2[s : s + 1, :], dx2[s : s + 1, :], outer,
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
        return h

    jax.lax.fori_loop(0, n_sub, store_entries, h0_ref[0].astype(jnp.float32))

    def sub_block(j, carry):
        dA_acc, dD_acc, dh = carry
        i = n_sub - 1 - j  # reverse order over sub-blocks
        off = pl.multiple_of(i * _SUB, _SUB)
        dtb = dt_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)  # (S, D)
        xb = x_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
        bb = b_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)  # (S, N)
        cb = c_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)
        gb = g_ref[0, pl.ds(off, _SUB), :].astype(jnp.float32)  # (S, D)
        dxb = dtb * xb
        h_entry = hent_scr[pl.ds(i, 1)][0]

        # forward through the sub-block, keeping the S states + predecessors
        hs = []
        h = h_entry
        a_list = []
        for s in range(_SUB):
            dts = dtb[s : s + 1, :]
            a_s = jnp.exp(dts * A)
            h = a_s * h + jax.lax.dot_general(
                bb[s : s + 1, :], dxb[s : s + 1, :], outer,
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            hs.append(h)
            a_list.append(a_s)

        dx_rows, ddt_rows, db_rows, dc_rows = [], [], [], []
        for s in range(_SUB - 1, -1, -1):
            g_s = gb[s : s + 1, :]  # (1, D)
            h_s = hs[s]
            h_prev = hs[s - 1] if s > 0 else h_entry
            a_s = a_list[s]
            dts = dtb[s : s + 1, :]
            # dh_s = C_s ⊗ g_s + carried dh (already includes a_{s+1} factor)
            dh = dh + jax.lax.dot_general(
                cb[s : s + 1, :], g_s, outer,
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            # dC_s,n = Σ_d g_s,d h_s,n,d  → (1, N) via (N,D)·(1,D)ᵀ
            dc_rows.append(
                jax.lax.dot_general(
                    g_s, h_s, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
                )  # (1, N)
            )
            # dB_s,n = Σ_d dh_n,d (Δx)_d
            db_rows.append(
                jax.lax.dot_general(
                    dxb[s : s + 1, :], dh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
                )  # (1, N)
            )
            dadot = dh * a_s * h_prev  # (N, D) — d(loss)/d(log a) terms
            # dΔ_d = Σ_n dadot A + Σ_n dh B_s,n x_d
            bdh = jax.lax.dot_general(
                bb[s : s + 1, :], dh, contract,
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )  # (1, D)
            ddt_rows.append(
                jnp.sum(dadot * A, axis=0, keepdims=True) + bdh * xb[s : s + 1, :]
            )
            dx_rows.append(bdh * dts + Dskip * g_s)
            dA_acc = dA_acc + dadot * dts
            dD_acc = dD_acc + g_s * xb[s : s + 1, :]
            # carry to previous step: dh_{s-1} ← a_s ⊙ dh_s
            dh = a_s * dh

        dx_ref[0, pl.ds(off, _SUB), :] = jnp.concatenate(dx_rows[::-1], axis=0).astype(dx_ref.dtype)
        ddt_ref[0, pl.ds(off, _SUB), :] = jnp.concatenate(ddt_rows[::-1], axis=0).astype(ddt_ref.dtype)
        db_ref[0, pl.ds(off, _SUB), :] = jnp.concatenate(db_rows[::-1], axis=0).astype(db_ref.dtype)
        dc_ref[0, pl.ds(off, _SUB), :] = jnp.concatenate(dc_rows[::-1], axis=0).astype(dc_ref.dtype)
        return dA_acc, dD_acc, dh

    dA_acc, dD_acc, dh = jax.lax.fori_loop(0, n_sub, sub_block, (dA_acc, dD_acc, dh))
    dh_scr[:] = dh
    da_ref[:] = da_ref[:] + dA_acc
    dd_ref[:] = dd_ref[:] + dD_acc


def _pallas_fwd_with_states(x, delta, Bm, C, At, D2, L, n_chunks, interpret=False):
    B_, Tp, Dd = x.shape
    N = At.shape[0]
    y, h0 = pl.pallas_call(
        functools.partial(_scan_kernel_with_states, chunk=L),
        grid=(B_, n_chunks),
        in_specs=[
            pl.BlockSpec((1, L, Dd), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dd), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, Dd), lambda b, c: (b, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Dd), lambda b, c: (b * n_chunks + c, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B_, Tp, Dd), x.dtype),
            jax.ShapeDtypeStruct((B_ * n_chunks, N, Dd), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((N, Dd), jnp.float32)],
        interpret=interpret,
    )(x, delta, Bm, C, At, D2)
    return y, h0


def _pallas_bwd(x, delta, Bm, C, At, D2, h0, g, L, n_chunks, interpret=False):
    B_, Tp, Dd = x.shape
    N = At.shape[0]
    rev = lambda b, c: (b, n_chunks - 1 - c, 0)  # noqa: E731
    dx, ddt, db, dc, dA, dD = pl.pallas_call(
        functools.partial(_scan_bwd_kernel, chunk=L),
        grid=(B_, n_chunks),
        in_specs=[
            pl.BlockSpec((1, L, Dd), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dd), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, N, Dd), lambda b, c: (b * n_chunks + (n_chunks - 1 - c), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, L, Dd), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, Dd), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Dd), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, N), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dd), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B_, Tp, Dd), jnp.float32),
            jax.ShapeDtypeStruct((B_, Tp, Dd), jnp.float32),
            jax.ShapeDtypeStruct((B_, Tp, N), jnp.float32),
            jax.ShapeDtypeStruct((B_, Tp, N), jnp.float32),
            jax.ShapeDtypeStruct((N, Dd), jnp.float32),
            jax.ShapeDtypeStruct((1, Dd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, Dd), jnp.float32),
            pltpu.VMEM((L // _SUB, N, Dd), jnp.float32),
        ],
        interpret=interpret,
    )(x, delta, Bm, C, At, D2, h0, g)
    return dx, ddt, db, dc, dA, dD


def _pad_args(x, delta, Bm, C, chunk):
    B_, T, Dd = x.shape
    chunk = max(_SUB, (chunk // _SUB) * _SUB)
    L = min(chunk, -(-T // _SUB) * _SUB)
    n_chunks = -(-T // L)
    Tp = n_chunks * L
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        x, delta, Bm, C = (jnp.pad(a, pad) for a in (x, delta, Bm, C))
    return x, delta, Bm, C, L, n_chunks, T


def _auto_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@jax.custom_vjp
def selective_scan_fused(x, delta, A, Bm, C, D):
    """selective_scan with fused Pallas forward AND backward kernels.

    The backward saves only each chunk's initial state from the forward
    ((B·T/L, N, D) — L× smaller than the full state trajectory), replays
    states chunk-locally in reverse grid order, and accumulates dA/dD
    across grid steps. Gradients match jax.grad of the associative-scan
    formulation (asserted in tests)."""
    return selective_scan_pallas(x, delta, A, Bm, C, D, interpret=_auto_interpret())


def _fused_fwd(x, delta, A, Bm, C, D):
    xp, dp, bp, cp, L, n_chunks, T = _pad_args(x, delta, Bm, C, chunk=128)
    At = A.T.astype(jnp.float32)
    D2 = D.reshape(1, -1).astype(jnp.float32)
    y, h0 = _pallas_fwd_with_states(xp, dp, bp, cp, At, D2, L, n_chunks, interpret=_auto_interpret())
    dtype_tokens = (jnp.zeros((), A.dtype), jnp.zeros((), D.dtype))
    return y[:, :T], (xp, dp, bp, cp, At, D2, h0, L, n_chunks, T, dtype_tokens)


def _fused_bwd(res, g):
    xp, dp, bp, cp, At, D2, h0, L, n_chunks, T, (a_tok, d_tok) = res
    Tp = xp.shape[1]
    if Tp != T:
        g = jnp.pad(g, ((0, 0), (0, Tp - T), (0, 0)))
    dx, ddt, db, dc, dA, dD = _pallas_bwd(
        xp, dp, bp, cp, At, D2, h0, g.astype(xp.dtype), L, n_chunks,
        interpret=_auto_interpret(),
    )
    return (
        dx[:, :T].astype(xp.dtype),
        ddt[:, :T].astype(dp.dtype),
        dA.T.astype(a_tok.dtype),
        db[:, :T].astype(bp.dtype),
        dc[:, :T].astype(cp.dtype),
        dD[0].astype(d_tok.dtype),
    )


selective_scan_fused.defvjp(_fused_fwd, _fused_bwd)
