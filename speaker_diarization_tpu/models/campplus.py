"""CAM++ speaker encoder (D-TDNN with context-aware masking), flax.linen.

Architecture parity with the reference wespeaker implementation
(`/root/reference/egs/alimeeting/ts_vad2/cam_pplus_wespeaker.py:12-423`):
FCM 2-D residual front-end (freq 80→10, ×32 ch) → TDNN k5 s2 (time ×1/2) →
three CAM-dense blocks (12/24/16 layers, growth 32, dilations 1/2/2) with
transit layers halving channels → 512-d frame features at 50 Hz
(`frames` mode, == get_time_out=True) or stats-pool → 192-d embedding
(`embedding` mode). ~6.6 M params.

Layout is channel-last (B, T, C) / (B, F, T, C) for TPU conv efficiency; a
torch→flax weight converter maps the reference checkpoint tensors
(utils/torch_convert.py). BatchNorm uses flax batch_stats (train step must
pass mutable=['batch_stats']).
"""

from __future__ import annotations

from typing import Literal, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BNReLU(nn.Module):
    """'batchnorm-relu' nonlinearity block; 'batchnorm_' = BN without affine."""

    relu: bool = True
    affine: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            use_scale=self.affine,
            use_bias=self.affine,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x) if self.relu else x


class TDNNLayer(nn.Module):
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            strides=(self.stride,),
            padding=[(pad, pad)],
            kernel_dilation=(self.dilation,),
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        return BNReLU(dtype=self.dtype, name="nonlinear")(x, train)


def seg_pooling(x: jnp.ndarray, seg_len: int = 100) -> jnp.ndarray:
    """Segment-average pooling with ceil-mode tail (CAMLayer.seg_pooling).

    x: (B, T, C) → per-100-frame segment means broadcast back to (B, T, C).
    """
    B, T, C = x.shape
    n_seg = -(-T // seg_len)
    pad = n_seg * seg_len - T
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    sums = xp.reshape(B, n_seg, seg_len, C).sum(axis=2)
    counts = jnp.minimum(seg_len, T - np.arange(n_seg) * seg_len).astype(x.dtype)
    means = sums / counts[None, :, None]
    seg = jnp.repeat(means, seg_len, axis=1)[:, :T]
    return seg


class CAMLayer(nn.Module):
    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    reduction: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = nn.Conv(
            self.out_channels,
            (self.kernel_size,),
            padding=[(pad, pad)],
            kernel_dilation=(self.dilation,),
            use_bias=False,
            dtype=self.dtype,
            name="linear_local",
        )(x)
        context = jnp.mean(x, axis=1, keepdims=True) + seg_pooling(x)
        context = nn.relu(nn.Conv(self.bn_channels // self.reduction, (1,), dtype=self.dtype, name="linear1")(context))
        m = nn.sigmoid(nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="linear2")(context))
        return y * m


class CAMDenseTDNNLayer(nn.Module):
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BNReLU(dtype=self.dtype, name="nonlinear1")(x, train)
        x = nn.Conv(self.bn_channels, (1,), use_bias=False, dtype=self.dtype, name="linear1")(x)
        x = BNReLU(dtype=self.dtype, name="nonlinear2")(x, train)
        return CAMLayer(
            self.bn_channels, self.out_channels, self.kernel_size, self.dilation, dtype=self.dtype, name="cam_layer"
        )(x, train)


class CAMDenseTDNNBlock(nn.Module):
    num_layers: int
    out_channels: int
    bn_channels: int
    kernel_size: int
    dilation: int = 1
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        layer_cls = CAMDenseTDNNLayer
        if self.remat:
            layer_cls = nn.remat(CAMDenseTDNNLayer, static_argnums=(1,))
        for i in range(self.num_layers):
            out = layer_cls(
                out_channels=self.out_channels,
                bn_channels=self.bn_channels,
                kernel_size=self.kernel_size,
                dilation=self.dilation,
                dtype=self.dtype,
                name=f"tdnnd{i + 1}",
            )(x, train)
            x = jnp.concatenate([x, out], axis=-1)
        return x


class TransitLayer(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BNReLU(dtype=self.dtype, name="nonlinear")(x, train)
        return nn.Conv(self.out_channels, (1,), use_bias=False, dtype=self.dtype, name="linear")(x)


class BasicResBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, F, T, C); stride applies to frequency only
        in_c = x.shape[-1]
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        if self.stride != 1 or in_c != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1), use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
            sc = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class FCM(nn.Module):
    """2-D residual front-end: (B, T, F) fbank → (B, T, C*(F//8)) at 100 Hz."""

    m_channels: int = 32
    num_blocks: Sequence[int] = (2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, T, F = x.shape
        h = x.transpose(0, 2, 1)[..., None]  # (B, F, T, 1)
        h = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h))
        # NOTE: the reference uses num_blocks[0] for both layer groups
        for g, name in ((0, "layer1"), (0, "layer2")):
            for i in range(self.num_blocks[g]):
                h = BasicResBlock(self.m_channels, stride=2 if i == 0 else 1, dtype=self.dtype, name=f"{name}_{i}")(h, train)
        h = nn.Conv(self.m_channels, (3, 3), strides=(2, 1), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h))
        # (B, F//8, T, C) → (B, T, C*F//8) with torch's (C major, F minor) order
        h = h.transpose(0, 2, 3, 1)  # (B, T, C, F')
        return h.reshape(B, T, -1)


def stats_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, C) → (B, 2C): mean ‖ unbiased std over time."""
    mean = jnp.mean(x, axis=1)
    var = jnp.sum((x - mean[:, None, :]) ** 2, axis=1) / jnp.maximum(x.shape[1] - 1, 1)
    return jnp.concatenate([mean, jnp.sqrt(var + 1e-10)], axis=-1)


class CAMPPlus(nn.Module):
    """CAM++: fbank (B, T, feat_dim) @100 Hz → frame features and/or embedding.

    mode 'frames': (B, ceil(T/2), 512) 50 Hz features (TS-VAD speech encoder).
    mode 'embedding': (B, embedding_size) x-vector.
    """

    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    block_layers: Sequence[int] = (12, 24, 16)  # reference sizes; shrink for tests
    block_dilations: Sequence[int] = (1, 2, 2)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mode: Literal["frames", "embedding", "both"] = "embedding"):
        h = FCM(dtype=self.dtype, name="head")(x, train)
        h = TDNNLayer(self.init_channels, 5, stride=2, dtype=self.dtype, name="tdnn")(h, train)
        channels = self.init_channels
        for i, (num_layers, ksz, dil) in enumerate(
            zip(self.block_layers, [3] * len(self.block_layers), self.block_dilations)
        ):
            h = CAMDenseTDNNBlock(
                num_layers=num_layers,
                out_channels=self.growth_rate,
                bn_channels=self.bn_size * self.growth_rate,
                kernel_size=ksz,
                dilation=dil,
                remat=self.remat,
                dtype=self.dtype,
                name=f"block{i + 1}",
            )(h, train)
            channels += num_layers * self.growth_rate
            h = TransitLayer(channels // 2, dtype=self.dtype, name=f"transit{i + 1}")(h, train)
            channels //= 2
        h = BNReLU(dtype=self.dtype, name="out_nonlinear")(h, train)
        if mode == "frames":
            return h  # (B, T/2, 512)
        e = stats_pool(h.astype(jnp.float32))  # (B, 1024)
        e = nn.Dense(self.embedding_size, use_bias=False, dtype=self.dtype, name="dense_linear")(e)
        e = BNReLU(relu=False, affine=False, dtype=self.dtype, name="dense_nonlinear")(e, train)
        if mode == "both":
            # utterance embedding + frame features in one pass (the reference
            # ts_vad3 speaker encoder returns both, ts_vad3/model.py:964-968)
            return e, h
        return e
