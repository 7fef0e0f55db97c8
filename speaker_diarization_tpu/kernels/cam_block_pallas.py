"""Pallas TPU kernel: a whole CAM++ dense block in ONE kernel.

The XLA-level fused rewrite (cam_block_fused.cam_dense_block_infer) left
the blocks serialization-bound: 12/24/16 sequential layers of small
(≤3.5 GFLOP) matmuls each run ~1 ms of MXU work in ~8 ms of wall
(logs/campplus_fused_r4.log: block MFU 0.03-0.05 either way). This kernel
keeps the growing concat buffer resident in VMEM across ALL layers of a
block — one HBM read of the input, one HBM write of the output, zero
inter-op overhead between the 52 layers' matmuls.

Math is identical to models/campplus.CAMDenseTDNNBlock(train=False) with
BN folded to scale/bias (see cam_block_fused.prepare_block_params for the
zero-padded stacking contract). Inference only.

Kernel structure per grid step (one batch tile):
  buf ← x (zero-padded to C_max lanes)
  for layer i (static unroll):
    h = relu(buf·s1ᵢ + b1ᵢ)                 # padded channels stay 0
    u = relu((h @ W1ᵢ)·s2ᵢ + b2ᵢ)           # (Bt, T, 128) MXU
    ctx = global-mean(u) + segment-means(u)  # (Bt, n_seg, 128)
    m = σ(relu(ctx@Wc1ᵢ+bc1ᵢ)@Wc2ᵢ+bc2ᵢ)    # (Bt, n_seg, 32)
    loc = Σₖ shiftₖ(u) @ Kᵢₖ                 # dilated k3 conv, 3 MXU calls
    buf[..., c:c+32] = loc · m
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _block_kernel(
    x_ref, s1_ref, b1_ref, w1_ref, s2_ref, b2_ref, k_ref, wc1_ref, bc1_ref,
    wc2_ref, bc2_ref, out_ref, *, L, c0, dilation, seg_len, dtype,
):
    Bt, T, _ = x_ref.shape
    c_max = out_ref.shape[-1]
    d = dilation
    n_seg = T // seg_len  # T is a multiple of seg_len (asserted by caller)

    out_ref[:, :, :] = jnp.pad(
        x_ref[:, :, :].astype(dtype), ((0, 0), (0, 0), (0, c_max - c0))
    )

    for i in range(L):
        buf = out_ref[:, :, :]
        h = jnp.maximum(buf * s1_ref[i].astype(dtype) + b1_ref[i].astype(dtype), 0)
        u = _dot(h, w1_ref[i].astype(dtype))  # (Bt, T, 128) f32
        u = jnp.maximum(u * s2_ref[i] + b2_ref[i], 0).astype(dtype)

        # context: global mean + per-segment means (CAMLayer.seg_pooling)
        uf = u.astype(jnp.float32)
        gmean = jnp.mean(uf, axis=1, keepdims=True)  # (Bt, 1, 128)
        segs = [
            jnp.mean(uf[:, s * seg_len : (s + 1) * seg_len], axis=1, keepdims=True)
            for s in range(n_seg)
        ]
        ctx = jnp.concatenate([gmean + sm for sm in segs], axis=1).astype(dtype)
        a = jnp.maximum(_dot(ctx, wc1_ref[i].astype(dtype)) + bc1_ref[i], 0).astype(dtype)
        m = jax.nn.sigmoid(_dot(a, wc2_ref[i].astype(dtype)) + bc2_ref[i])  # (Bt, n_seg, 32)

        # dilated k3 conv via shifted slices (zero boundary)
        zpad = jnp.zeros((Bt, d, u.shape[-1]), dtype)
        u_past = jnp.concatenate([zpad, u[:, : T - d]], axis=1)
        u_fut = jnp.concatenate([u[:, d:], zpad], axis=1)
        loc = (
            _dot(u_past, k_ref[i, 0].astype(dtype))
            + _dot(u, k_ref[i, 1].astype(dtype))
            + _dot(u_fut, k_ref[i, 2].astype(dtype))
        )  # (Bt, T, 32) f32
        m_full = jnp.concatenate(
            [jnp.broadcast_to(m[:, s : s + 1], (Bt, seg_len, m.shape[-1])) for s in range(n_seg)],
            axis=1,
        )
        out = (loc * m_full).astype(dtype)
        out_ref[:, :, c0 + i * 32 : c0 + (i + 1) * 32] = out


def _pick_batch_tile(B: int, T: int, c0: int, c_max: int, L: int) -> int:
    """Largest batch tile whose working set fits comfortably in VMEM.

    The kernel is op-overhead-bound, not MXU-bound, at small tiles (52
    layers × ~13 ops per grid step — measured block MFU ~0.12 at tile 4):
    fewer, fatter grid steps amortize the per-op latency. Budget ≈ 13 MB
    of the ~16 MB VMEM: resident out buffer (Bt·T·c_max) + input + the
    h/u temporaries + the stacked W1 (L·c_max·128), all bf16.
    """
    import os

    if os.environ.get("SDT_BLOCK_BT"):
        return int(os.environ["SDT_BLOCK_BT"])
    weights = 2 * L * c_max * 128 + 2 * L * 3 * 128 * 32
    for bt in (16, 8, 4, 2, 1):
        if B % bt:
            continue
        work = 2 * bt * T * (2 * c_max + c0 + 2 * 128)  # out + h + in + u/loc
        if weights + work <= 13 * 1024 * 1024:
            return bt
    return 1


@functools.partial(
    jax.jit, static_argnames=("dilation", "seg_len", "dtype", "batch_tile", "interpret")
)
def cam_dense_block_pallas(
    x: jnp.ndarray,
    bp: dict,
    dilation: int,
    seg_len: int = 100,
    dtype=jnp.bfloat16,
    batch_tile: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """x (B, T, C_in) → (B, T, C_max); B % batch_tile == 0, T % seg_len == 0."""
    B, T, c0 = x.shape
    L, c_max = bp["W1"].shape[0], bp["W1"].shape[1]
    growth = bp["K"].shape[-1]
    assert growth == 32 and c0 + L * 32 == c_max
    if batch_tile is None:
        batch_tile = _pick_batch_tile(B, T, c0, c_max, L)
        # Large blocks (block2: L=24, c_max=1024 → 6.3 MB of resident
        # stacked W1) force a small batch tile and stay op-overhead-bound.
        # Splitting the layer chain into two kernel calls halves the
        # resident weights so each half runs at a 2× fatter tile; the
        # handoff costs one extra HBM round trip of the (B, T, c_mid)
        # buffer (~0.03 ms at batch 64) — far below the overhead saved.
        import os

        force_split = os.environ.get("SDT_BLOCK_SPLIT") == "1"
        if (batch_tile < 8 or force_split) and L >= 8:
            L1 = L // 2
            c_mid = c0 + 32 * L1
            bp1 = {
                "s1": bp["s1"][:L1, :c_mid], "b1": bp["b1"][:L1, :c_mid],
                "W1": bp["W1"][:L1, :c_mid], "s2": bp["s2"][:L1], "b2": bp["b2"][:L1],
                "K": bp["K"][:L1], "Wc1": bp["Wc1"][:L1], "bc1": bp["bc1"][:L1],
                "Wc2": bp["Wc2"][:L1], "bc2": bp["bc2"][:L1],
            }
            bp2 = {k: v[L1:] for k, v in bp.items()}
            h = cam_dense_block_pallas(
                x, bp1, dilation, seg_len=seg_len, dtype=dtype, interpret=interpret
            )
            return cam_dense_block_pallas(
                h, bp2, dilation, seg_len=seg_len, dtype=dtype, interpret=interpret
            )
    if B % batch_tile != 0 or T % seg_len != 0:
        # fallback: XLA-level fused path covers ragged shapes
        from .cam_block_fused import cam_dense_block_infer

        return cam_dense_block_infer(x, bp, dilation, seg_len, dtype)

    kern = functools.partial(
        _block_kernel, L=L, c0=c0, dilation=dilation, seg_len=seg_len, dtype=dtype
    )
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    args = [bp[k].astype(dtype if k in ("W1", "K", "Wc1", "Wc2") else jnp.float32)
            for k in ("s1", "b1", "W1", "s2", "b2", "K", "Wc1", "bc1", "Wc2", "bc2")]
    return pl.pallas_call(
        kern,
        grid=(B // batch_tile,),
        in_specs=[
            pl.BlockSpec((batch_tile, T, c0), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[full(a) for a in args],
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, T, c_max), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T, c_max), dtype),
        interpret=interpret,
    )(x, *args)
