"""ERes2Net speaker encoder (3D-Speaker), flax.

Reference: `egs/alimeeting/ts_vad2/ERes2Net.py` — Res2Net blocks with
local feature fusion (AFF attention between split branches in the deeper
blocks) and global feature fusion across stages (downsampled stage outputs
fused via AFF), TSTP pooling → embedding. Activations are ReLU clamped at
20 (reference ReLU = Hardtanh(0, 20)). Layout (B, F, T, C); 'frames' mode
returns pre-pooling features for TS-VAD conditioning.
"""

from __future__ import annotations

from typing import Literal, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .speaker_encoders import stats_pool_time


def relu20(x):
    return jnp.clip(x, 0.0, 20.0)


class AFF(nn.Module):
    """Attentional feature fusion: gate from concat, blend the two inputs."""

    channels: int
    r: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ds_y, train: bool = False):
        inter = max(self.channels // self.r, 1)
        a = jnp.concatenate([x, ds_y], axis=-1)
        a = nn.Conv(inter, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(a)
        a = nn.silu(a)
        a = nn.Conv(self.channels, (1, 1), use_bias=True, dtype=self.dtype, name="conv2")(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(a)
        att = 1.0 + jnp.tanh(a)
        return x * att + ds_y * (2.0 - att)


class ERes2NetBlock(nn.Module):
    planes: int
    stride: int = 1
    base_width: int = 32
    scale: int = 2
    use_aff: bool = False  # deeper stages fuse branches with AFF
    expansion: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * self.base_width / 64.0)
        out = nn.Conv(width * self.scale, (1, 1), strides=(self.stride, self.stride), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(out)
        out = relu20(out)
        spx = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(self.scale):
            if i == 0:
                sp = spx[0]
            elif self.use_aff:
                sp = AFF(width, dtype=self.dtype, name=f"aff_{i - 1}")(sp, spx[i], train)
            else:
                sp = sp + spx[i]
            sp = nn.Conv(width, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name=f"conv_{i}")(sp)
            sp = relu20(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name=f"bn_{i}")(sp))
            outs.append(sp)
        out = jnp.concatenate(outs, axis=-1)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn3")(out)
        in_c = x.shape[-1]
        if self.stride != 1 or in_c != self.planes * self.expansion:
            sc = nn.Conv(self.planes * self.expansion, (1, 1), strides=(self.stride, self.stride), use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
            sc = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return relu20(out + sc)


class ERes2Net(nn.Module):
    """Base ERes2Net (full 12/123/1234 GFF cascade). ERes2Net_huge
    (reference ERes2Net_huge.py) is this class with m_channels=64,
    base_width=24, scale=3, expansion=4."""

    feat_dim: int = 80
    embedding_size: int = 192
    m_channels: int = 32
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 32
    scale: int = 2
    expansion: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mode: Literal["frames", "embedding"] = "embedding"):
        # x: (B, T, F) fbank → (B, F, T, 1)
        B, T, Fd = x.shape
        m, e = self.m_channels, self.expansion
        h = x.transpose(0, 2, 1)[..., None]
        h = nn.Conv(m, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = relu20(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h))

        def stage(h, planes, n, stride, use_aff, name):
            for bi in range(n):
                h = ERes2NetBlock(
                    planes, stride if bi == 0 else 1,
                    base_width=self.base_width, scale=self.scale, expansion=e,
                    use_aff=use_aff, dtype=self.dtype, name=f"{name}_{bi}",
                )(h, train)
            return h

        out1 = stage(h, m, self.num_blocks[0], 1, False, "layer1")
        out2 = stage(out1, m * 2, self.num_blocks[1], 2, False, "layer2")
        d1 = nn.Conv(m * 2 * e, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=self.dtype, name="layer1_downsample")(out1)
        fuse12 = AFF(m * 2 * e, dtype=self.dtype, name="fuse12")(out2, d1, train)
        out3 = stage(out2, m * 4, self.num_blocks[2], 2, True, "layer3")
        d2 = nn.Conv(m * 4 * e, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=self.dtype, name="layer2_downsample")(fuse12)
        fuse123 = AFF(m * 4 * e, dtype=self.dtype, name="fuse123")(out3, d2, train)
        out4 = stage(out3, m * 8, self.num_blocks[3], 2, True, "layer4")
        d3 = nn.Conv(m * 8 * e, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=self.dtype, name="layer3_downsample")(fuse123)
        fuse1234 = AFF(m * 8 * e, dtype=self.dtype, name="fuse1234")(out4, d3, train)

        # (B, F/8, T/8, 8me) → (B, T/8, F/8·8me)
        Bx, F8, T8, C = fuse1234.shape
        frames = fuse1234.transpose(0, 2, 1, 3).reshape(Bx, T8, F8 * C)
        if mode == "frames":
            return frames
        p = stats_pool_time(frames.astype(jnp.float32), unbiased=True)
        return nn.Dense(self.embedding_size, dtype=self.dtype, name="seg_1")(p)


class ERes2NetV2(nn.Module):
    """ERes2NetV2 (reference egs/magicdata-ramc/ts_vad2/ERes2NetV2.py):
    pruned global fusion — only stage-3→stage-4 AFF (layer3_ds + fuse34) —
    with wider m_channels. The reference TS-VAD uses it as a speech encoder
    via get_frame_level_feat (fuse34 frames, 12.5 Hz) and
    get_frame_level_feat_frame_rate25 (stage-3 frames, 25 Hz) —
    modes 'frames' and 'frames25' here."""

    feat_dim: int = 80
    embedding_size: int = 192
    m_channels: int = 64
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 26
    scale: int = 2
    expansion: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mode: Literal["frames", "frames25", "embedding"] = "embedding"):
        B, T, Fd = x.shape
        m, e = self.m_channels, self.expansion
        h = x.transpose(0, 2, 1)[..., None]
        h = nn.Conv(m, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = relu20(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h))

        def stage(h, planes, n, stride, use_aff, name):
            for bi in range(n):
                h = ERes2NetBlock(
                    planes, stride if bi == 0 else 1,
                    base_width=self.base_width, scale=self.scale, expansion=e,
                    use_aff=use_aff, dtype=self.dtype, name=f"{name}_{bi}",
                )(h, train)
            return h

        out1 = stage(h, m, self.num_blocks[0], 1, False, "layer1")
        out2 = stage(out1, m * 2, self.num_blocks[1], 2, False, "layer2")
        out3 = stage(out2, m * 4, self.num_blocks[2], 2, True, "layer3")
        if mode == "frames25":
            Bx, F4, T4, C = out3.shape
            return out3.transpose(0, 2, 1, 3).reshape(Bx, T4, F4 * C)
        out4 = stage(out3, m * 8, self.num_blocks[3], 2, True, "layer4")
        d3 = nn.Conv(m * 8 * e, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=self.dtype, name="layer3_ds")(out3)
        fuse34 = AFF(m * 8 * e, dtype=self.dtype, name="fuse34")(out4, d3, train)

        Bx, F8, T8, C = fuse34.shape
        frames = fuse34.transpose(0, 2, 1, 3).reshape(Bx, T8, F8 * C)
        if mode == "frames":
            return frames
        p = stats_pool_time(frames.astype(jnp.float32), unbiased=True)
        return nn.Dense(self.embedding_size, dtype=self.dtype, name="seg_1")(p)
