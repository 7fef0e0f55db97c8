"""Fused inference path for the CAM++ dense-TDNN blocks.

Round-4 TPU reformulation (VERDICT r3 #3: CAM++ at MFU 0.10 is 88% of
flagship inference wall time). The standard flax path
(models/campplus.py CAMDenseTDNNBlock) materializes a growing
`jnp.concatenate` every layer and issues many small (N=32) convolutions;
XLA's fusions leave the MXU mostly idle (measured block MFU 0.03-0.05,
logs/campplus_bench_r4.log).

This path restates the exact same math MXU-first:
  * one preallocated (B, T, C_max) activation buffer updated in place
    (lax.dynamic_update_slice) instead of 52 growing concats;
  * inference BatchNorm folded to per-channel scale/bias, zero-padded to
    C_max so every layer's bottleneck projection is ONE full-width
    (B·T, C_max) x (C_max, 128) matmul — zero rows multiply zero weights,
    so the result is exactly the concat-prefix matmul;
  * the k3 dilated conv as three shifted (B·T, 128) x (128, 32) matmuls;
  * the CAM context branch (global mean + 100-frame segment means →
    bottleneck MLP → sigmoid mask) on the tiny (B, n_seg, C) tensors.

Inference only (no batch-stats update); training keeps the flax path.
Parity: tests/test_campplus_fused.py asserts equality with the standard
module to float tolerance.

Reference semantics: cam_pplus_wespeaker.py:12-423 (CAMDenseTDNNLayer /
CAMLayer / seg_pooling).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _fold_bn(bn_params, bn_stats, eps=1e-5):
    """BN(inference) → per-channel (scale, bias)."""
    mean, var = bn_stats["mean"], bn_stats["var"]
    inv = 1.0 / jnp.sqrt(var + eps)
    scale = bn_params.get("scale", jnp.ones_like(mean)) * inv
    bias = bn_params.get("bias", jnp.zeros_like(mean)) - mean * scale
    return scale, bias


def prepare_block_params(params, stats, num_layers: int, c_in0: int, c_max: int):
    """Stack one dense block's per-layer weights, padded to c_max.

    Returns a dict of arrays with a leading layer axis. Channel positions
    beyond each layer's true input width get scale=0 / bias=0 / W=0, so
    full-width matmuls reproduce the concat-prefix computation exactly.
    """
    growth = (c_max - c_in0) // num_layers  # 32
    s1s, b1s, W1s, s2s, b2s, Ks, Wc1s, bc1s, Wc2s, bc2s = ([] for _ in range(10))
    for i in range(num_layers):
        lp, ls = params[f"tdnnd{i + 1}"], stats[f"tdnnd{i + 1}"]
        c_in = c_in0 + i * growth
        s1, b1 = _fold_bn(lp["nonlinear1"]["bn"], ls["nonlinear1"]["bn"])
        pad = c_max - c_in
        s1s.append(jnp.pad(s1, (0, pad)))
        b1s.append(jnp.pad(b1, (0, pad)))
        W1 = lp["linear1"]["kernel"][0]  # (c_in, bn_ch)
        W1s.append(jnp.pad(W1, ((0, pad), (0, 0))))
        s2, b2 = _fold_bn(lp["nonlinear2"]["bn"], ls["nonlinear2"]["bn"])
        s2s.append(s2)
        b2s.append(b2)
        cam = lp["cam_layer"]
        Ks.append(cam["linear_local"]["kernel"])  # (3, bn_ch, growth)
        Wc1s.append(cam["linear1"]["kernel"][0])  # (bn_ch, bn_ch//2)
        bc1s.append(cam["linear1"]["bias"])
        Wc2s.append(cam["linear2"]["kernel"][0])  # (bn_ch//2, growth)
        bc2s.append(cam["linear2"]["bias"])
    stk = lambda xs: jnp.stack(xs)  # noqa: E731
    return dict(
        s1=stk(s1s), b1=stk(b1s), W1=stk(W1s), s2=stk(s2s), b2=stk(b2s),
        K=stk(Ks), Wc1=stk(Wc1s), bc1=stk(bc1s), Wc2=stk(Wc2s), bc2=stk(bc2s),
    )


def cam_dense_block_infer(
    x: jnp.ndarray,
    bp: dict,
    dilation: int,
    seg_len: int = 100,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """x (B, T, C_in) → (B, T, C_in + L·growth), same math as
    CAMDenseTDNNBlock(train=False)."""
    B, T, c0 = x.shape
    L = bp["W1"].shape[0]
    c_max = bp["W1"].shape[1]
    growth = bp["K"].shape[-1]
    d = dilation

    buf = jnp.zeros((B, T, c_max), dtype)
    buf = jax.lax.dynamic_update_slice(buf, x.astype(dtype), (0, 0, 0))

    n_seg = -(-T // seg_len)
    pad_t = n_seg * seg_len - T
    counts = jnp.minimum(seg_len, T - np.arange(n_seg) * seg_len).astype(jnp.float32)

    for i in range(L):
        h = jnp.maximum(buf * bp["s1"][i].astype(dtype) + bp["b1"][i].astype(dtype), 0)
        u = jnp.einsum("btc,cd->btd", h, bp["W1"][i].astype(dtype),
                       preferred_element_type=jnp.float32)
        u = jnp.maximum(u * bp["s2"][i] + bp["b2"][i], 0).astype(dtype)  # (B, T, bn)

        # CAM context: global mean + ceil-mode segment means (seg_pooling)
        up_seg = jnp.pad(u, ((0, 0), (0, pad_t), (0, 0)))
        segs = up_seg.reshape(B, n_seg, seg_len, -1).astype(jnp.float32).sum(axis=2)
        segs = segs / counts[None, :, None]
        gmean = jnp.mean(u.astype(jnp.float32), axis=1, keepdims=True)
        ctx = (gmean + segs).astype(dtype)  # (B, n_seg, bn)
        a = jnp.maximum(
            jnp.einsum("bsc,cd->bsd", ctx, bp["Wc1"][i].astype(dtype),
                       preferred_element_type=jnp.float32) + bp["bc1"][i], 0
        ).astype(dtype)
        m = jax.nn.sigmoid(
            jnp.einsum("bsd,dg->bsg", a, bp["Wc2"][i].astype(dtype),
                       preferred_element_type=jnp.float32) + bp["bc2"][i]
        )  # (B, n_seg, growth) float32
        m = jnp.repeat(m, seg_len, axis=1)[:, :T]

        # dilated k3 conv as three shifted matmuls
        upad = jnp.pad(u, ((0, 0), (d, d), (0, 0)))
        K = bp["K"][i].astype(dtype)  # (3, bn, growth)
        loc = (
            jnp.einsum("btc,cg->btg", upad[:, :T], K[0], preferred_element_type=jnp.float32)
            + jnp.einsum("btc,cg->btg", upad[:, d : T + d], K[1], preferred_element_type=jnp.float32)
            + jnp.einsum("btc,cg->btg", upad[:, 2 * d : T + 2 * d], K[2], preferred_element_type=jnp.float32)
        )
        out = (loc * m).astype(dtype)
        buf = jax.lax.dynamic_update_slice(buf, out, (0, 0, c0 + i * growth))

    return buf


# ---------------------------------------------------------------------------
# Pure-jnp inference equivalents of the standard flax submodules (so the
# fused forward is module-free and callable from inside other modules'
# apply; flax forbids constructing submodules there).
# ---------------------------------------------------------------------------

_DN2 = ("NHWC", "HWIO", "NHWC")
_DN1 = ("NWC", "WIO", "NWC")


def _bn_infer(x, bn_p, bn_s, relu=True):
    scale, bias = _fold_bn(bn_p, bn_s)
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    return jnp.maximum(y, 0) if relu else y


def _conv2d(x, k, strides=(1, 1), pad=1):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=strides,
        padding=[(pad, pad), (pad, pad)], dimension_numbers=_DN2,
    )


def _basic_res_block(x, p, st, stride):
    h = _conv2d(x, p["conv1"]["kernel"], (stride, 1))
    h = _bn_infer(h, p["bn1"], st["bn1"])
    h = _conv2d(h, p["conv2"]["kernel"])
    h = _bn_infer(h, p["bn2"], st["bn2"], relu=False)
    if "shortcut_conv" in p:
        sc = jax.lax.conv_general_dilated(
            x, p["shortcut_conv"]["kernel"].astype(x.dtype), (stride, 1),
            padding=[(0, 0), (0, 0)], dimension_numbers=_DN2,
        )
        sc = _bn_infer(sc, p["shortcut_bn"], st["shortcut_bn"], relu=False)
    else:
        sc = x
    return jnp.maximum(h + sc, 0)


def _fcm_infer(fbank, p, st, num_blocks=(2, 2)):
    B, T, F = fbank.shape
    h = fbank.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
    h = _conv2d(h, p["conv1"]["kernel"])
    h = _bn_infer(h, p["bn1"], st["bn1"])
    for g, name in ((0, "layer1"), (0, "layer2")):
        for i in range(num_blocks[g]):
            h = _basic_res_block(
                h, p[f"{name}_{i}"], st[f"{name}_{i}"], 2 if i == 0 else 1
            )
    h = _conv2d(h, p["conv2"]["kernel"], (2, 1))
    h = _bn_infer(h, p["bn2"], st["bn2"])
    return h.transpose(0, 2, 3, 1).reshape(B, T, -1)


def _tdnn_infer(x, p, st, stride=2, dilation=1, kernel=5):
    pad = (kernel - 1) // 2 * dilation
    h = jax.lax.conv_general_dilated(
        x, p["conv"]["kernel"].astype(x.dtype), window_strides=(stride,),
        padding=[(pad, pad)], rhs_dilation=(dilation,), dimension_numbers=_DN1,
    )
    return _bn_infer(h, p["nonlinear"]["bn"], st["nonlinear"]["bn"])


def _transit_infer(x, p, st):
    h = _bn_infer(x, p["nonlinear"]["bn"], st["nonlinear"]["bn"])
    return jnp.einsum(
        "btc,cd->btd", h, p["linear"]["kernel"][0].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _fcm_auto(fbank, p, st, dtype):
    """Dispatch the FCM head.

    Production path: the plain lax-conv form (_fcm_infer) — measured
    0.6 ms in-context at batch 64 x 4 s on v5e (XLA fuses the small convs
    well; logs/r5_profile_parts_naive.log). Two experimental
    restatements are kept behind env flags, both measured SLOWER or
    uncompilable on real hardware in round 5:
      SDT_FCM_FOLDED=1  tap-folded XLA matmuls — 24 ms: the (..., 96)
                        concat materializes ~400 MB intermediates and the
                        head is bandwidth-bound, not lane-bound;
      SDT_FCM_PALLAS=1  whole-head Pallas kernel — parity-correct in
                        interpret mode, but Mosaic's remote compile is
                        OOM-killed on v5e (3-D vectors with a 32-wide
                        lane dim → thousands of vregs per op)."""
    import os

    std_head = fbank.shape[-1] == 80 and p["conv1"]["kernel"].shape == (3, 3, 1, 32)
    if std_head and os.environ.get("SDT_FCM_PALLAS") == "1" and jax.default_backend() in ("tpu", "axon"):
        from .fcm_pallas import fcm_pallas, prepare_fcm_params

        return fcm_pallas(fbank, tuple(prepare_fcm_params(p, st, dtype)), dtype=dtype)
    if std_head and os.environ.get("SDT_FCM_FOLDED") == "1":
        from .fcm_pallas import fcm_xla_folded, prepare_fcm_params

        return fcm_xla_folded(fbank, tuple(prepare_fcm_params(p, st, dtype)), dtype=dtype)
    return _fcm_infer(fbank, p, st)


def _dense_block_auto(h, bp, dil, dtype):
    """Dispatch: single-kernel Pallas block on TPU backends (incl. the
    'axon' relay), XLA-level fusion elsewhere. SDT_NO_PALLAS=1 forces the
    XLA path."""
    import os

    if os.environ.get("SDT_NO_PALLAS") != "1" and jax.default_backend() in ("tpu", "axon"):
        from .cam_block_pallas import cam_dense_block_pallas

        return cam_dense_block_pallas(h, bp, dil, dtype=dtype)
    return cam_dense_block_infer(h, bp, dil, dtype=dtype)


def campplus_frames_fused(model, variables, fbank: jnp.ndarray) -> jnp.ndarray:
    """Full CAM++ 'frames' forward with fused dense blocks.

    model: a CAMPPlus instance (for config); variables: its init/trained
    variables. Entirely module-free: FCM/TDNN/transits as lax convs and
    matmuls, the three dense blocks through cam_dense_block_infer.
    """
    params, stats = variables["params"], variables.get("batch_stats", {})
    dt = model.dtype
    h = _fcm_auto(fbank.astype(dt), params["head"], stats["head"], dt)
    h = _tdnn_infer(h, params["tdnn"], stats["tdnn"])
    channels = model.init_channels
    for i, (num_layers, dil) in enumerate(zip(model.block_layers, model.block_dilations)):
        c_max = channels + num_layers * model.growth_rate
        bp = prepare_block_params(
            params[f"block{i + 1}"], stats[f"block{i + 1}"], num_layers, channels, c_max
        )
        h = _dense_block_auto(h, bp, dil, dt)
        channels = c_max
        h = _transit_infer(h, params[f"transit{i + 1}"], stats[f"transit{i + 1}"])
        channels //= 2
    on = params["out_nonlinear"]["bn"], stats["out_nonlinear"]["bn"]
    return _bn_infer(h, on[0], on[1])
