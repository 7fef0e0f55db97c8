"""Speaker-encoder zoo: ECAPA-TDNN and ResNet34 (wespeaker variants).

Reference: `egs/alimeeting/ts_vad2/ecapa_tdnn_wespeaker.py` (Res2 blocks with
SE, MFA concat, ASTP pooling) and `resnet_wespeaker.py` (ResNet34 on fbank,
TSTP pooling). Each model runs in 'frames' mode (pre-pooling features for
TS-VAD conditioning / subsegment clustering) or 'embedding' mode, same
contract as CAM++ (models/campplus.py). Channel-last layouts; BatchNorm via
batch_stats.
"""

from __future__ import annotations

from typing import Literal, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvReluBn1d(nn.Module):
    out_channels: int
    kernel: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2 * self.dilation
        h = nn.Conv(
            self.out_channels, (self.kernel,), padding=[(pad, pad)], kernel_dilation=(self.dilation,),
            dtype=self.dtype, name="conv",
        )(x)
        h = nn.relu(h)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn")(h)


class Res2ConvReluBn(nn.Module):
    """Res2Net 1-D: split channels into `scale` groups, cascade convs."""

    channels: int
    kernel: int = 3
    dilation: int = 1
    scale: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.channels // self.scale
        nums = self.scale if self.scale == 1 else self.scale - 1
        pad = (self.kernel - 1) // 2 * self.dilation
        spx = jnp.split(x, self.scale, axis=-1)
        out = []
        sp = spx[0]
        for i in range(nums):
            if i >= 1:
                sp = sp + spx[i]
            sp = nn.Conv(
                width, (self.kernel,), padding=[(pad, pad)], kernel_dilation=(self.dilation,),
                dtype=self.dtype, name=f"conv_{i}",
            )(sp)
            sp = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name=f"bn_{i}")(nn.relu(sp))
            out.append(sp)
        if self.scale != 1:
            out.append(spx[nums])
        return jnp.concatenate(out, axis=-1)


class SEConnect(nn.Module):
    bottleneck: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=1)  # (B, C)
        s = nn.relu(nn.Dense(self.bottleneck, dtype=self.dtype, name="linear1")(s))
        s = nn.sigmoid(nn.Dense(x.shape[-1], dtype=self.dtype, name="linear2")(s))
        return x * s[:, None, :]


class SERes2Block(nn.Module):
    channels: int
    kernel: int = 3
    dilation: int = 2
    scale: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvReluBn1d(self.channels, 1, dtype=self.dtype, name="in1x1")(x, train)
        h = Res2ConvReluBn(self.channels, self.kernel, self.dilation, self.scale, dtype=self.dtype, name="res2")(h, train)
        h = ConvReluBn1d(self.channels, 1, dtype=self.dtype, name="out1x1")(h, train)
        h = SEConnect(dtype=self.dtype, name="se")(h)
        return x + h


def stats_pool_time(x: jnp.ndarray, unbiased: bool = False, eps: float = 1e-10) -> jnp.ndarray:
    """TSTP: (B, T, C) → (B, 2C) mean‖std.

    unbiased=True matches torch.var's default (÷(T-1)) used by the
    reference pooling layers (pooling_layers_3d_speaker.py:52, +1e-8)."""
    T = x.shape[1]
    mean = jnp.mean(x, axis=1)
    var = jnp.clip(jnp.mean(x * x, axis=1) - mean * mean, 0.0, None)
    if unbiased:
        var = var * (T / max(T - 1, 1))
        eps = 1e-8
    return jnp.concatenate([mean, jnp.sqrt(var + eps)], axis=-1)


class ASTP(nn.Module):
    """Attentive statistics pooling (wespeaker ASTP)."""

    bottleneck: int = 128
    global_context: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        if self.global_context:
            mean = jnp.mean(x, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.clip(jnp.mean(x * x, axis=1, keepdims=True) - mean**2, 1e-10, None))
            T = x.shape[1]
            ctx = jnp.concatenate([x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1)
        else:
            ctx = x
        a = jnp.tanh(nn.Dense(self.bottleneck, dtype=self.dtype, name="linear1")(ctx))
        a = nn.Dense(x.shape[-1], dtype=self.dtype, name="linear2")(a)
        a = jnp.exp(a - jnp.max(a, axis=1, keepdims=True))
        a = a / jnp.sum(a, axis=1, keepdims=True)  # softmax over time
        mean = jnp.sum(a * x, axis=1)
        var = jnp.clip(jnp.sum(a * x * x, axis=1) - mean * mean, 1e-10, None)
        return jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)


class ECAPA_TDNN(nn.Module):
    """ECAPA-TDNN: fbank (B, T, feat) → 'frames' (B, T, 1536) or embedding."""

    channels: int = 512
    feat_dim: int = 80
    embed_dim: int = 192
    global_context_att: bool = False
    emb_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mode: Literal["frames", "embedding"] = "embedding"):
        h1 = ConvReluBn1d(self.channels, 5, dtype=self.dtype, name="layer1")(x, train)
        h2 = SERes2Block(self.channels, 3, 2, dtype=self.dtype, name="layer2")(h1, train)
        h3 = SERes2Block(self.channels, 3, 3, dtype=self.dtype, name="layer3")(h2, train)
        h4 = SERes2Block(self.channels, 3, 4, dtype=self.dtype, name="layer4")(h3, train)
        h = jnp.concatenate([h2, h3, h4], axis=-1)
        h = nn.relu(nn.Conv(1536, (1,), dtype=self.dtype, name="mfa_conv")(h))
        if mode == "frames":
            return h  # (B, T, 1536) @ fbank rate (100 Hz)
        p = ASTP(global_context=self.global_context_att, dtype=self.dtype, name="pool")(h.astype(jnp.float32))
        p = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="pool_bn")(p)
        e = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear")(p)
        if self.emb_bn:
            e = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="emb_bn_layer")(e)
        return e


class ResBasicBlock2d(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        if self.stride != 1 or in_c != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride), use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
            sc = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class ResNet34(nn.Module):
    """wespeaker ResNet34: fbank (B, T, feat) → 'frames' (B, ceil(T/8), C·F/8)
    at 12.5 Hz or TSTP embedding."""

    feat_dim: int = 80
    embed_dim: int = 256
    m_channels: int = 32
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mode: Literal["frames", "embedding"] = "embedding"):
        B, T, Fd = x.shape
        h = x[:, :, :, None]  # (B, T, F, 1)
        h = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h))
        planes = self.m_channels
        for gi, (n, stride) in enumerate(zip(self.num_blocks, (1, 2, 2, 2))):
            for bi in range(n):
                h = ResBasicBlock2d(planes, stride if bi == 0 else 1, dtype=self.dtype, name=f"layer{gi + 1}_{bi}")(h, train)
            planes *= 2
        # h: (B, T/8, F/8, 8m)
        B2, T8, F8, C = h.shape
        h = h.reshape(B2, T8, F8 * C)
        if mode == "frames":
            return h
        p = stats_pool_time(h.astype(jnp.float32))
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="embed_linear")(p)


def simam(x: jnp.ndarray, lambda_p: float = 1e-4) -> jnp.ndarray:
    """SimAM parameter-free attention over the spatial (T, F) dims.

    Reference: `egs/alimeeting/ts_vad2/samresnet_wespeaker.py:65-70`.
    x: (B, T, F, C) channel-last.
    """
    n = x.shape[1] * x.shape[2] - 1
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    d = jnp.square(x - mean)
    v = jnp.sum(d, axis=(1, 2), keepdims=True) / n
    e_inv = d / (4.0 * (v + lambda_p)) + 0.5
    return x * nn.sigmoid(e_inv)


class SimAMBasicBlock2d(nn.Module):
    """Basic ResNet block with SimAM attention before the residual add
    (reference SimAMBasicBlock, samresnet_wespeaker.py:21-70)."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_c = x.shape[-1]
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        h = simam(h.astype(jnp.float32)).astype(h.dtype)
        if self.stride != 1 or in_c != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride), use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
            sc = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class WespeakerASP(nn.Module):
    """Channel-wise attentive statistics pooling (wespeaker ASP,
    pooling_layers_wespeaker.py:146-168): per-channel softmax attention over
    time, weighted mean‖std."""

    bottleneck: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, D)
        a = nn.relu(nn.Conv(self.bottleneck, (1,), dtype=self.dtype, name="att_conv1")(x))
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="att_bn")(a)
        a = nn.Conv(x.shape[-1], (1,), dtype=self.dtype, name="att_conv2")(a)
        w = jax.nn.softmax(a.astype(jnp.float32), axis=1)
        xf = x.astype(jnp.float32)
        mu = jnp.sum(xf * w, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(xf * xf * w, axis=1) - mu * mu, 1e-5, None))
        return jnp.concatenate([mu, sg], axis=-1)


class SimAMResNet34(nn.Module):
    """SimAM-ResNet34 (wespeaker): fbank (B, T, feat) → 'frames'
    (B, ceil(T/8), 8m·F/8) at 12.5 Hz or ASP embedding.

    Reference: SimAM_ResNet34_ASP, samresnet_wespeaker.py:126-160
    (in_planes=64 ⇒ frames dim 512·(80/8)=5120, matching the TS-VAD
    model_dim=5120 wiring at ts_vad2/model.py:608-630).
    """

    feat_dim: int = 80
    embed_dim: int = 256
    m_channels: int = 64
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, mode: Literal["frames", "embedding"] = "embedding"):
        h = x[:, :, :, None]  # (B, T, F, 1)
        h = nn.Conv(self.m_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h))
        planes = self.m_channels
        for gi, (n, stride) in enumerate(zip(self.num_blocks, (1, 2, 2, 2))):
            for bi in range(n):
                h = SimAMBasicBlock2d(planes, stride if bi == 0 else 1, dtype=self.dtype, name=f"layer{gi + 1}_{bi}")(h, train)
            planes *= 2
        B2, T8, F8, C = h.shape
        h = h.reshape(B2, T8, F8 * C)
        if mode == "frames":
            return h  # (B, T/8, 5120) @ 12.5 Hz
        p = WespeakerASP(dtype=self.dtype, name="pool")(h, train=train)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="bottleneck")(p)


SPEAKER_ENCODERS = {
    "campplus": "speaker_diarization_tpu.models.campplus:CAMPPlus",
    "ecapa_tdnn": "speaker_diarization_tpu.models.speaker_encoders:ECAPA_TDNN",
    "resnet34": "speaker_diarization_tpu.models.speaker_encoders:ResNet34",
    "simam_resnet34": "speaker_diarization_tpu.models.speaker_encoders:SimAMResNet34",
    "eres2net": "speaker_diarization_tpu.models.eres2net:ERes2Net",
    "redimnet": "speaker_diarization_tpu.models.redimnet:ReDimNet",
    "wavlm": "speaker_diarization_tpu.models.wavlm:WavLMModel",
    "whisper": "speaker_diarization_tpu.models.whisper_encoder:WhisperEncoder",
}


def build_speaker_encoder(name: str, **kwargs):
    """Zoo factory (reference create_speech_encoder, ts_vad2/model.py:369)."""
    import importlib

    path = SPEAKER_ENCODERS[name]
    mod, cls = path.split(":")
    return getattr(importlib.import_module(mod), cls)(**kwargs)
