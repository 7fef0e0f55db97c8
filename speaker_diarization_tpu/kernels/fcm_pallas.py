"""Pallas TPU kernel: the whole CAM++ FCM head in ONE kernel.

The FCM front-end (models/campplus.py:189 — 2-D residual conv stack over
(freq, time) with 32 channels) is lane-starved on the MXU: every 3×3 conv
has N = C_out = 32 against 128 lanes, capping XLA at ~17% MFU (measured
3.56 ms in-context at batch 64 × 4 s, logs/r5_profile_parts.log).

This kernel restates each conv so the matmul runs at full lane width:

  * the three FREQ taps are folded into the contraction by concatenating
    freq-shifted copies along channels:  X3[f] = [x[f-1] ‖ x[f] ‖ x[f+1]]
    → K = 3·32 = 96;
  * the three TIME taps are folded into the OUTPUT width:
    W_wide[(df,ci),(dt,co)] = W[df,dt,ci,co] → N = 3·32 = 96, and the
    conv result is recovered by shifting the three output groups along
    time and summing — shifts are free sublane moves in VMEM;
  * one (F·T, 96) × (96, 96) matmul per conv instead of nine 32-lane
    products: ~56% lane utilization vs 6%;
  * stride-2 freq convs gather even/odd source rows directly (no
    compute-then-subsample waste);
  * the whole head stays resident in VMEM per batch item — one HBM read
    of the fbank, one write of the (F'=10, T, 32) output.

Inference only; BN folded to per-channel scale/bias. Parity vs the flax
module is asserted in tests/test_fcm_pallas.py (interpret mode on CPU).
Reference semantics: cam_pplus_wespeaker.py FCM (+ models/campplus.py).

STATUS (round 5): BOTH restatements here are experimental and not
dispatched by default. The Pallas kernel is parity-correct in interpret
mode but Mosaic cannot compile it for a real v5e in this shape regime
(3-D vectors with a 32-wide lane dim → thousands of vregs per op; the
remote tpu_compile_helper runs >10 min and is OOM-killed). The XLA-level
fcm_xla_folded variant compiles but measured 24 ms vs 0.6 ms for the
plain lax-conv head at batch 64 × 4 s — the (..., 96) tap concat
materializes ~400 MB intermediates and the head is bandwidth-bound, not
lane-bound. Production dispatch (cam_block_fused._fcm_auto) therefore
uses the naive conv form; opt in here with SDT_FCM_PALLAS=1 /
SDT_FCM_FOLDED=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_bn(bn_p, bn_s, eps=1e-5):
    # jnp (not numpy) so it traces under an enclosing jit — the transforms
    # are tiny reshapes of the weights, re-run per call at negligible cost
    mean, var = jnp.asarray(bn_s["mean"]), jnp.asarray(bn_s["var"])
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    scale = jnp.asarray(bn_p.get("scale", jnp.ones_like(mean)), jnp.float32) * inv
    bias = jnp.asarray(bn_p.get("bias", jnp.zeros_like(mean)), jnp.float32) - mean * scale
    return scale, bias


def _wide(W):
    """(3, 3, Cin, Cout) conv kernel → (3·Cin, 3·Cout) with
    W_wide[(df,ci),(dt,co)] = W[df,dt,ci,co]."""
    W = jnp.asarray(W, jnp.float32)
    kf, kt, ci, co = W.shape
    assert kf == 3 and kt == 3
    return W.transpose(0, 2, 1, 3).reshape(3 * ci, 3 * co)


def prepare_fcm_params(params, stats, dtype=jnp.bfloat16):
    """Flax FCM params/batch_stats → flat list of arrays for the kernel.

    Order (13 conv units):
      conv1, L1_0(c1,c2,sc), L1_1(c1,c2), L2_0(c1,c2,sc), L2_1(c1,c2), conv2
    Each 3×3 unit contributes (W_wide bf16, sb f32 (2,32)); shortcuts
    contribute (Wsc (32,32) bf16, sb) — BN of conv2-of-a-block has no relu
    before the residual add, handled in-kernel.
    """
    out = []

    def push(Wwide, bn_p, bn_s):
        s, b = _fold_bn(bn_p, bn_s)
        out.append(jnp.asarray(Wwide, dtype))
        out.append(jnp.stack([s, b]).astype(jnp.float32))

    push(_wide(params["conv1"]["kernel"]), params["bn1"], stats["bn1"])
    for blk in ("layer1_0", "layer1_1", "layer2_0", "layer2_1"):
        p = params[blk]
        s = stats[blk]
        push(_wide(p["conv1"]["kernel"]), p["bn1"], s["bn1"])
        push(_wide(p["conv2"]["kernel"]), p["bn2"], s["bn2"])
        if "shortcut_conv" in p:
            Wsc = jnp.asarray(p["shortcut_conv"]["kernel"], jnp.float32)[0, 0]  # (32,32)
            push(Wsc, p["shortcut_bn"], s["shortcut_bn"])
    push(_wide(params["conv2"]["kernel"]), params["bn2"], stats["bn2"])
    return out


# ---------------------------------------------------------------------------
# XLA-level folded form (the production TPU path).
#
# The whole-head Pallas kernel below compiles and passes parity in
# interpret mode, but Mosaic cannot compile it for a real v5e in this
# shape regime — the remote tpu_compile_helper runs for >10 min and is
# OOM-killed (measured round 5, logs/r5_fcm_bisect.log). The same
# tap-folding restatement expressed as plain XLA ops gets the MXU win
# (K=96/N=96 matmuls instead of nine 32-lane products) without Mosaic:
# XLA fuses the shifts/concats into the matmul's operand reads.
# ---------------------------------------------------------------------------


def _tshift_b(a, d):
    """Zero-filled shift along the time axis (axis 2 of (B, F, T, C))."""
    T = a.shape[2]
    if d > 0:
        return jnp.pad(a, ((0, 0), (0, 0), (d, 0), (0, 0)))[:, :, :T]
    return jnp.pad(a, ((0, 0), (0, 0), (0, -d), (0, 0)))[:, :, -d:]


def _conv3x3_folded(x, Wwide, sb, stride, dtype, relu=True):
    """x (B, F, T, C) → (B, F/stride, T, Cout); same math as _conv3x3."""
    B, F, T, C = x.shape
    if stride == 1:
        rows = [
            jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :F],  # x[f-1]
            x,
            jnp.pad(x, ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:],  # x[f+1]
        ]
    else:
        Fo = F // 2
        x2 = x.reshape(B, Fo, 2, T, C)
        even, odd = x2[:, :, 0], x2[:, :, 1]
        prev_odd = jnp.pad(odd, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :Fo]  # x[2f'-1]
        rows = [prev_odd, even, odd]
    X3 = jnp.concatenate([r.astype(dtype) for r in rows], axis=-1)
    ow = jax.lax.dot_general(
        X3, Wwide.astype(dtype), (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    co = Wwide.shape[1] // 3
    g0, g1, g2 = ow[..., :co], ow[..., co : 2 * co], ow[..., 2 * co :]
    out = _tshift_b(g0, 1) + g1 + _tshift_b(g2, -1)
    out = out * sb[0] + sb[1]
    if relu:
        out = jnp.maximum(out, 0)
    return out.astype(dtype)


def fcm_xla_folded(fbank, flat_params, dtype=jnp.bfloat16):
    """fbank (B, T, 80) → (B, T, 320); tap-folded FCM head in plain XLA.

    flat_params: output of prepare_fcm_params. Matches the flax FCM module
    (models/campplus.py) to bf16 tolerance; exact in f32.
    """
    w = list(flat_params)
    B, T, Fdim = fbank.shape
    assert Fdim == 80, Fdim
    x0 = jnp.swapaxes(fbank.astype(jnp.float32), 1, 2)  # (B, 80, T)
    xm = jnp.pad(x0, ((0, 0), (1, 0), (0, 0)))[:, :80]
    xp = jnp.pad(x0, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    X3 = jnp.stack([xm, x0, xp], axis=-1).astype(dtype)  # (B, 80, T, 3)
    ow = jax.lax.dot_general(
        X3, w[0].astype(dtype), (((3,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    g0, g1, g2 = ow[..., 0:32], ow[..., 32:64], ow[..., 64:96]
    h = _tshift_b(g0, 1) + g1 + _tshift_b(g2, -1)
    h = jnp.maximum(h * w[1][0] + w[1][1], 0).astype(dtype)  # (B, 80, T, 32)

    F = 80
    i = 2
    for stride in (2, 1, 2, 1):
        Fo = F // stride
        h1 = _conv3x3_folded(h, w[i], w[i + 1], stride, dtype, relu=True)
        i += 2
        if stride == 2:
            sc = jax.lax.dot_general(
                h.reshape(B, Fo, 2, h.shape[2], h.shape[3])[:, :, 0].astype(dtype),
                w[i + 2].astype(dtype), (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sc = sc * w[i + 3][0] + w[i + 3][1]
        else:
            sc = h[:, :Fo].astype(jnp.float32)
        h2 = _conv3x3_folded(h1, w[i], w[i + 1], 1, dtype, relu=False)
        i += 2
        if stride == 2:
            i += 2
        h = jnp.maximum(h2.astype(jnp.float32) + sc, 0).astype(dtype)
        F = Fo

    h = _conv3x3_folded(h, w[i], w[i + 1], 2, dtype, relu=True)  # (B, 10, T, 32)
    return h.transpose(0, 2, 3, 1).reshape(B, T, 320)


def _tshift(a, d):
    """Shift along the time axis (axis 1 of (F, T, C)) by d with zero fill.

    Written as roll + iota mask: Mosaic cannot lower a sublane-axis
    concatenate of vectors with mismatched pad layouts, but dynamic_rotate
    plus a select is native.
    """
    T = a.shape[1]
    rolled = pltpu.roll(a, d % T, axis=1)  # pltpu.roll requires shift >= 0
    t = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    if d > 0:
        return jnp.where(t >= d, rolled, 0)
    return jnp.where(t < T + d, rolled, 0)


def _conv3x3(x, Wwide, sb, F_in, stride, dtype, relu=True):
    """x (F_in, T, C) → (F_out, T, 32) after BN(scale/bias)[+relu]."""
    T = x.shape[1]
    if stride == 1:
        F_out = F_in
        rows = [
            jnp.concatenate([jnp.zeros_like(x[:1]), x[: F_in - 1]], axis=0),  # x[f-1]
            x,
            jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0),  # x[f+1]
        ]
    else:
        F_out = F_in // 2
        # even/odd rows via a leading-dim reshape (a strided slice on a 3-D
        # array would lower to a gather, which Mosaic rejects on TPU)
        x2 = x.reshape(F_out, 2, T, x.shape[-1])
        even = x2[:, 0]  # x[2f']
        odd = x2[:, 1]  # x[2f'+1]
        prev_odd = jnp.concatenate([jnp.zeros_like(odd[:1]), odd[: F_out - 1]], axis=0)  # x[2f'-1]
        rows = [prev_odd, even, odd]
    X3 = jnp.concatenate([r.astype(dtype) for r in rows], axis=-1)  # (F_out, T, 3C)
    ow = jax.lax.dot_general(
        X3, Wwide.astype(dtype), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (F_out, T, 96)
    g0, g1, g2 = ow[..., 0:32], ow[..., 32:64], ow[..., 64:96]
    out = _tshift(g0, 1) + g1 + _tshift(g2, -1)
    out = out * sb[0] + sb[1]
    if relu:
        out = jnp.maximum(out, 0)
    return out.astype(dtype)


def _fcm_kernel(fbank_ref, *refs, T, dtype):
    out_ref = refs[-1]
    w = [r[...] for r in refs[:-1]]  # alternating Wwide/sb per unit, in prepare order

    x0 = fbank_ref[0]  # (80, T) f32 (pre-transposed freq-major)
    # conv1: single input channel → X3 (80, T, 3)
    F = 80
    xm = jnp.concatenate([jnp.zeros_like(x0[:1]), x0[:-1]], axis=0)
    xp = jnp.concatenate([x0[1:], jnp.zeros_like(x0[:1])], axis=0)
    X3 = jnp.stack([xm, x0, xp], axis=-1).astype(dtype)  # (80, T, 3)
    ow = jax.lax.dot_general(
        X3, w[0].astype(dtype), (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (80, T, 96)
    g0, g1, g2 = ow[..., 0:32], ow[..., 32:64], ow[..., 64:96]
    h = _tshift(g0, 1) + g1 + _tshift(g2, -1)
    h = jnp.maximum(h * w[1][0] + w[1][1], 0).astype(dtype)  # (80, T, 32)

    i = 2
    for blk, stride in (("layer1_0", 2), ("layer1_1", 1), ("layer2_0", 2), ("layer2_1", 1)):
        Fo = F // stride
        h1 = _conv3x3(h, w[i], w[i + 1], F, stride, dtype, relu=True)
        i += 2
        if stride == 2:
            # shortcut: 1×1 stride-2 conv + BN (no relu)
            sc = jax.lax.dot_general(
                h.reshape(Fo, 2, h.shape[1], h.shape[2])[:, 0].astype(dtype),
                w[i + 2].astype(dtype), (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            sc = sc * w[i + 3][0] + w[i + 3][1]
        else:
            sc = h[:Fo].astype(jnp.float32)
        h2 = _conv3x3(h1, w[i], w[i + 1], Fo, 1, dtype, relu=False)
        i += 2
        if stride == 2:
            i += 2  # consumed shortcut params
        h = jnp.maximum(h2.astype(jnp.float32) + sc, 0).astype(dtype)
        F = Fo

    # final conv2: stride (2, 1) + BN + relu → (10, T, 32)
    h = _conv3x3(h, w[i], w[i + 1], F, 2, dtype, relu=True)
    out_ref[0] = h.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def fcm_pallas(fbank, flat_params, dtype=jnp.bfloat16, interpret=False):
    """fbank (B, T, 80) f32/bf16 → (B, T, 320) FCM features.

    flat_params: output of prepare_fcm_params (13 units × 2 arrays).
    """
    B, T, Fdim = fbank.shape
    assert Fdim == 80, Fdim
    x = jnp.swapaxes(fbank.astype(jnp.float32), 1, 2)  # (B, 80, T)
    full = lambda a: pl.BlockSpec(a.shape, lambda b: (0,) * a.ndim, memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_fcm_kernel, T=T, dtype=dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 80, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
        + [full(a) for a in flat_params],
        out_specs=pl.BlockSpec((1, 10, T, 32), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 10, T, 32), dtype),
        interpret=interpret,
    )(x, *flat_params)
    # (B, F'=10, T, C=32) → (B, T, C, F') → (B, T, 320): torch's
    # channel-major flatten (models/campplus.py FCM tail)
    return out.transpose(0, 2, 3, 1).reshape(B, T, 320)
