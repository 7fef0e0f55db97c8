"""ReDimNet: reshape-dimensions network for speaker recognition.

Reference: `egs/alimeeting/ts_vad2/redimnet.py` (IDRnD ReDimNet,
arXiv:2407.18223). The network alternates between a 2-D (freq × time ×
channel) view and a 1-D (time × C·F) view: every stage pools frequency into
channels with a strided (stride, 1) conv, runs 2-D conv blocks, flattens back
to 1-D, and optionally runs a time-context block (ConvNeXt-1d stack +
transformer). Stage inputs are softmax-weighted sums of ALL previous stage
outputs in the shared 1-D C·F space (redimnet.py:768-781).

TPU-first notes: channel-last layouts throughout ((B, F, T, C) in 2-D,
(B, T, C·F) in 1-D) so XLA keeps convs in NHWC; the freq↔channel reshapes
are pure metadata ops. Frame rate is never subsampled — 'frames' mode
returns C·F-dim features at the 100 Hz fbank rate (TS-VAD downsamples to
the 25 Hz label rate with a stride-4 conv, magicdata-ramc ts_vad2
model.py ReDimNetB* wiring).
"""

from __future__ import annotations

from typing import Literal, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# stride, num_blocks, conv_exp, kernel_sizes (unused upstream), att_block_red
StageSetup = Tuple[int, int, int, object, Optional[int]]

# Factory configs mirroring redimnet.py:875-1055 (B0-B3; larger B follow the
# same pattern). Fields: C, block_1d_type, block_2d_type, stages, group_divisor.
REDIMNET_SIZES = {
    "b0": dict(
        feat_dim=60, C=10, block_1d_type="conv+att", block_2d_type="basic_resnet",
        stages_setup=((1, 2, 1, None, 30), (2, 3, 2, None, 30), (1, 3, 3, None, 30),
                      (2, 4, 2, None, 10), (1, 3, 1, None, 10)),
        group_divisor=1,
    ),
    "b1": dict(
        feat_dim=72, C=12, block_1d_type="conv+att", block_2d_type="convnext_like",
        stages_setup=((1, 2, 1, None, None), (2, 3, 1, None, None), (3, 4, 1, None, 12),
                      (2, 5, 1, None, 12), (2, 3, 1, None, 8)),
        group_divisor=8,
    ),
    "b2": dict(
        feat_dim=72, C=16, block_1d_type="conv+att", block_2d_type="convnext_like",
        stages_setup=((1, 2, 1, None, 12), (2, 2, 1, None, 12), (1, 3, 1, None, 12),
                      (2, 4, 1, None, 8), (1, 4, 1, None, 8), (2, 4, 1, None, 4)),
        group_divisor=4,
    ),
    "b3": dict(
        feat_dim=72, C=16, block_1d_type="conv+att", block_2d_type="basic_resnet_fwse",
        stages_setup=((1, 6, 4, None, 32), (2, 6, 2, None, 32), (1, 8, 2, None, 32),
                      (2, 10, 2, None, 16), (1, 10, 1, None, 16), (2, 8, 1, None, 16)),
        group_divisor=1,
    ),
    "b4": dict(
        feat_dim=72, C=32, block_1d_type="conv+att", block_2d_type="basic_resnet_fwse",
        stages_setup=((1, 4, 2, None, 48), (2, 4, 2, None, 48), (1, 6, 2, None, 48),
                      (2, 6, 1, None, 32), (1, 8, 1, None, 24), (2, 4, 1, None, 16)),
        group_divisor=1,
    ),
    "b5": dict(
        feat_dim=72, C=32, block_1d_type="conv+att", block_2d_type="basic_resnet_fwse",
        stages_setup=((1, 4, 2, None, 48), (2, 4, 2, None, 48), (1, 6, 2, None, 48),
                      (2, 6, 1, None, 32), (1, 8, 1, None, 24), (2, 4, 1, None, 16)),
        group_divisor=16,
    ),
    "b6": dict(
        feat_dim=72, C=32, block_1d_type="conv+att", block_2d_type="basic_resnet",
        stages_setup=((1, 4, 4, None, 32), (2, 6, 2, None, 32), (1, 6, 2, None, 24),
                      (3, 8, 1, None, 24), (1, 8, 1, None, 16), (2, 8, 1, None, 16)),
        group_divisor=32,
    ),
}


def new_gelu(x):
    """HF NewGELUActivation (tanh approximation, redimnet.py:56-61)."""
    return jax.nn.gelu(x, approximate=True)


def to1d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, F, T, C) → (B, T, F·C); channel index = f·C + c, matching the
    torch permute((0,2,1,3)).reshape (redimnet.py:48-53)."""
    B, F_, T, C = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T, F_ * C)


def to2d(x: jnp.ndarray, c: int, f: int) -> jnp.ndarray:
    """(B, T, f·c) → (B, f, T, c) (redimnet.py:763-766)."""
    B, T, _ = x.shape
    return jnp.transpose(x.reshape(B, T, f, c), (0, 2, 1, 3))


class ConvNeXtLikeBlock(nn.Module):
    """dwconv(s) → BN → GELU → pointwise, residual (redimnet.py:135-165).
    Works for 1-D ((B, T, C)) and 2-D ((B, F, T, C)) inputs."""

    C: int
    kernel_sizes: Sequence  # ints for 1-D, (kf, kt) pairs for 2-D
    group_divisor: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = self.C // self.group_divisor if self.group_divisor is not None else 1
        outs = []
        for i, ks in enumerate(self.kernel_sizes):
            kernel = (ks,) if isinstance(ks, int) else tuple(ks)
            outs.append(
                nn.Conv(self.C, kernel, padding="SAME", feature_group_count=max(1, groups),
                        dtype=self.dtype, name=f"dwconv_{i}")(x)
            )
        h = jnp.concatenate(outs, axis=-1)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="norm")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Conv(self.C, (1,) * (x.ndim - 2), dtype=self.dtype, name="pwconv1")(h)
        return x + h


class FwSEBlock(nn.Module):
    """Frequency-wise squeeze-excitation (redimnet.py:435-459)."""

    num_freq: int
    se_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, F, T, C); squeeze over (T, C)
        s = jnp.mean(x, axis=(2, 3))  # (B, F)
        s = nn.relu(nn.Dense(self.se_channels, dtype=self.dtype, name="squeeze")(s))
        s = nn.sigmoid(nn.Dense(self.num_freq, dtype=self.dtype, name="exitation")(s))
        return x * s[:, :, None, None]


class ResBasicBlock(nn.Module):
    """Grouped 3×3 residual block, optional fwSE (redimnet.py:462-538)."""

    in_planes: int
    planes: int
    num_freq: int
    se_channels: int = 64
    group_divisor: Optional[int] = 4
    use_fwse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        gd = self.group_divisor
        c1_out = self.in_planes if gd is not None else self.planes
        h = nn.Conv(c1_out, (3, 3), padding=1, use_bias=False,
                    feature_group_count=self.in_planes // gd if gd is not None else 1,
                    dtype=self.dtype, name="conv1")(x)
        if gd is not None:
            h = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv1pw")(h)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn1")(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    feature_group_count=self.planes // gd if gd is not None else 1,
                    dtype=self.dtype, name="conv2")(h)
        if gd is not None:
            h = nn.Conv(self.planes, (1, 1), dtype=self.dtype, name="conv2pw")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn2")(h)
        if self.use_fwse:
            h = FwSEBlock(self.num_freq, self.se_channels, dtype=self.dtype, name="se")(h)
        if self.planes != self.in_planes:
            sc = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            sc = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class ConvBlock2d(nn.Module):
    """Dispatch on block_2d_type (redimnet.py:168-204)."""

    c: int
    f: int
    block_type: str = "convnext_like"
    group_divisor: Optional[int] = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.block_type == "convnext_like":
            return ConvNeXtLikeBlock(self.c, [(3, 3)], self.group_divisor, dtype=self.dtype, name="conv_block")(x, train)
        if self.block_type in ("basic_resnet", "basic_resnet_fwse"):
            return ResBasicBlock(
                self.c, self.c, self.f,
                se_channels=min(64, max(self.c, 32)),
                group_divisor=self.group_divisor,
                use_fwse=self.block_type == "basic_resnet_fwse",
                dtype=self.dtype, name="conv_block",
            )(x, train)
        raise NotImplementedError(self.block_type)


class RDNAttention(nn.Module):
    """Plain MHA with pre-scaled queries (redimnet.py:207-274)."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, T, _ = x.shape
        H, D = self.num_heads, self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x) * (D ** -0.5)
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)
        q, k, v = (t.reshape(B, T, H, D).transpose(0, 2, 1, 3) for t in (q, k, v))
        a = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v).transpose(0, 2, 1, 3).reshape(B, T, self.embed_dim)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(o)


class RDNTransformerLayer(nn.Module):
    """Post-norm transformer layer (redimnet.py:277-329): x+attn → LN →
    +FF → LN, NewGELU feed-forward."""

    n_state: int
    n_mlp: int
    n_head: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + RDNAttention(self.n_state, self.n_head, dtype=self.dtype, name="attention")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="layer_norm")(x)
        h = nn.Dense(self.n_mlp, dtype=self.dtype, name="ff_intermediate")(x)
        h = new_gelu(h)
        h = nn.Dense(self.n_state, dtype=self.dtype, name="ff_output")(h)
        x = x + h
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="final_layer_norm")(x)


class PosEncConv(nn.Module):
    """Depthwise conv positional encoding, residual (redimnet.py:119-132)."""

    C: int
    ks: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.C, (self.ks,), padding="SAME", feature_group_count=self.C,
                    dtype=self.dtype, name="conv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        return x + h


class TimeContextBlock1d(nn.Module):
    """1-D time-context block over (B, T, C) (redimnet.py:541-620)."""

    C: int
    hC: int
    pos_ker_sz: int = 59
    block_type: str = "att"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        h = nn.Conv(self.hC, (1,), dtype=self.dtype, name="red_dim_conv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="red_dim_norm")(h)
        if self.block_type == "fc":
            h = nn.Conv(self.hC * 2, (1,), dtype=self.dtype, name="tcm_fc1")(h)
            h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="tcm_norm")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Conv(self.hC, (1,), dtype=self.dtype, name="tcm_fc2")(h)
        elif self.block_type == "gru":
            fwd = nn.RNN(nn.GRUCell(self.hC, dtype=self.dtype), name="gru_fwd")(h)
            bwd = nn.RNN(nn.GRUCell(self.hC, dtype=self.dtype), reverse=True,
                         keep_order=True, name="gru_bwd")(h)
            h = jnp.concatenate([fwd, bwd], axis=-1)
            h = nn.Conv(self.hC, (1,), dtype=self.dtype, name="tcm_gru_proj")(h)
        elif self.block_type == "att":
            h = PosEncConv(self.hC, self.pos_ker_sz, dtype=self.dtype, name="tcm_pos")(h)
            h = RDNTransformerLayer(self.hC, self.hC * 2, 4, dtype=self.dtype, name="tcm_att")(h)
        elif self.block_type == "conv+att":
            for i, ks in enumerate((7, 19, 31, 59)):
                h = ConvNeXtLikeBlock(self.hC, [ks], 1, dtype=self.dtype, name=f"tcm_conv_{i}")(h, train)
            h = RDNTransformerLayer(self.hC, self.hC, 4, dtype=self.dtype, name="tcm_att")(h)
        else:
            raise NotImplementedError(self.block_type)
        h = nn.Conv(self.C, (1,), dtype=self.dtype, name="exp_dim_conv")(h)
        return skip + h


class ReDimNetStage(nn.Module):
    """One stage: freq-pool conv → 2-D blocks → (squeeze-back) → to1d →
    optional time-context block (redimnet.py:689-745)."""

    cur_c: int
    cur_f: int
    stride: int
    num_blocks: int
    conv_exp: int
    att_block_red: Optional[int]
    block_1d_type: str
    block_2d_type: str
    group_divisor: Optional[int]
    CF: int  # constant C·F of the 1-D space
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1d, train: bool = False):
        c, f = self.cur_c, self.cur_f
        x = to2d(x1d, c, f)  # (B, f, T, c)
        new_c = self.stride * c
        new_f = f // self.stride
        h = nn.Conv(new_c * self.conv_exp, (self.stride, 1), strides=(self.stride, 1),
                    padding="VALID", dtype=self.dtype, name="pool_conv")(x)
        for i in range(self.num_blocks):
            h = ConvBlock2d(new_c * self.conv_exp, new_f, self.block_2d_type,
                            self.group_divisor, dtype=self.dtype, name=f"block_{i}")(h, train)
        if self.conv_exp != 1:
            gd = self.group_divisor
            h = nn.Conv(new_c, (3, 3), padding="SAME",
                        feature_group_count=new_c // gd if gd is not None else 1,
                        dtype=self.dtype, name="squeeze_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-6,
                             dtype=self.dtype, name="squeeze_bn")(h)
            h = jax.nn.gelu(h, approximate=False)
            h = nn.Conv(new_c, (1, 1), dtype=self.dtype, name="squeeze_pw")(h)
        h = to1d(h)  # (B, T, f/stride · stride·c) = (B, T, CF)
        if self.att_block_red is not None:
            h = TimeContextBlock1d(self.CF, self.CF // self.att_block_red,
                                   block_type=self.block_1d_type, dtype=self.dtype,
                                   name="tcb")(h, train)
        return h


class ReDimNetBone(nn.Module):
    """Stem + weighted-stage stack + MFA (redimnet.py:623-790)."""

    F: int = 72
    C: int = 16
    block_1d_type: str = "conv+att"
    block_2d_type: str = "basic_resnet"
    stages_setup: Sequence[StageSetup] = ()
    group_divisor: Optional[int] = 1
    out_channels: Optional[int] = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fbank, train: bool = False):
        # fbank: (B, T, F) → 2-D view (B, F, T, 1)
        x = jnp.transpose(fbank, (0, 2, 1))[..., None]
        x = nn.Conv(self.C, (3, 3), padding="SAME", dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        CF = self.C * self.F

        outs = [to1d(x)]  # each (B, T, CF)
        cur_c, cur_f = self.C, self.F
        for si, (stride, num_blocks, conv_exp, _ks, att_red) in enumerate(self.stages_setup):
            if si == 0:
                xin = outs[0]  # softmax over a single input is identity
            else:
                w = self.param(f"inputs_weights_{si}", nn.initializers.zeros, (si + 1, CF))
                ws = jax.nn.softmax(w, axis=0).astype(outs[0].dtype)
                xin = jnp.einsum("nc,nbtc->btc", ws, jnp.stack(outs, axis=0))
            outs.append(
                ReDimNetStage(
                    cur_c=cur_c, cur_f=cur_f, stride=stride, num_blocks=num_blocks,
                    conv_exp=conv_exp, att_block_red=att_red,
                    block_1d_type=self.block_1d_type, block_2d_type=self.block_2d_type,
                    group_divisor=self.group_divisor, CF=CF, dtype=self.dtype,
                    name=f"stage{si}",
                )(xin, train)
            )
            cur_c *= stride
            cur_f //= stride
        n = len(outs)
        w = self.param(f"inputs_weights_{len(self.stages_setup)}", nn.initializers.zeros, (n, CF))
        ws = jax.nn.softmax(w, axis=0).astype(outs[0].dtype)
        x = jnp.einsum("nc,nbtc->btc", ws, jnp.stack(outs, axis=0))
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1,), dtype=self.dtype, name="mfa_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="mfa_bn")(x)
        return x  # (B, T, out_channels or CF) @ 100 Hz


class ReDimNet(nn.Module):
    """Full ReDimNet: 'frames' (B, T, C·F) @ 100 Hz or ASTP embedding.

    `size` picks a factory config (REDIMNET_SIZES); explicit fields override.
    Reference forward: redimnet.py:793-872 (returns (0.0, embed_a) when
    two_emb_layer=False — we return just the embedding).
    """

    size: Optional[str] = "b2"
    feat_dim: Optional[int] = None
    C: Optional[int] = None
    stages_setup: Optional[Sequence[StageSetup]] = None
    block_1d_type: Optional[str] = None
    block_2d_type: Optional[str] = None
    group_divisor: Optional[int] = None
    out_channels: Optional[int] = None  # None → C·F (all B* factories)
    embed_dim: int = 192
    global_context_att: bool = True
    dtype: jnp.dtype = jnp.float32

    def _cfg(self):
        base = dict(REDIMNET_SIZES[self.size]) if self.size else {}
        for k in ("feat_dim", "C", "stages_setup", "block_1d_type", "block_2d_type", "group_divisor"):
            v = getattr(self, k)
            if v is not None:
                base[k] = v
        return base

    @nn.compact
    def __call__(self, fbank, train: bool = False,
                 mode: Literal["frames", "embedding"] = "embedding"):
        cfg = self._cfg()
        out = ReDimNetBone(
            F=cfg["feat_dim"], C=cfg["C"],
            block_1d_type=cfg["block_1d_type"], block_2d_type=cfg["block_2d_type"],
            stages_setup=cfg["stages_setup"], group_divisor=cfg["group_divisor"],
            out_channels=self.out_channels, dtype=self.dtype, name="backbone",
        )(fbank, train)
        if mode == "frames":
            return out
        # wespeaker ASTP with global context (pooling_layers_wespeaker.py:91-144)
        xf = out.astype(jnp.float32)
        if self.global_context_att:
            mean = jnp.mean(xf, axis=1, keepdims=True)
            std = jnp.sqrt(jnp.var(xf, axis=1, ddof=1, keepdims=True) + 1e-7)
            ctx = jnp.concatenate(
                [xf, jnp.broadcast_to(mean, xf.shape), jnp.broadcast_to(std, xf.shape)], axis=-1)
        else:
            ctx = xf
        a = jnp.tanh(nn.Dense(128, name="pool_linear1")(ctx))
        a = jax.nn.softmax(nn.Dense(xf.shape[-1], name="pool_linear2")(a), axis=1)
        mu = jnp.sum(a * xf, axis=1)
        sg = jnp.sqrt(jnp.clip(jnp.sum(a * xf * xf, axis=1) - mu * mu, 1e-7, None))
        stats = jnp.concatenate([mu, sg], axis=-1)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="seg_1")(stats)
