"""Bidirectional Mamba blocks (TS-VAD backend alternative).

Reference: `egs/alimeeting/ts_vad2/mamba.py` — MambaBlockV2 (bidirectional,
concat merge) / MambaBlock (add merge) stacks wrapping the CUDA `mamba_ssm`
kernels. This is a from-scratch flax implementation of Mamba-v1 (S6) blocks
on the TPU associative-scan primitive (ops/mamba_scan.py): in-projection →
causal depthwise conv → SiLU → input-dependent (Δ, B, C) → selective scan →
gated output. Bidirectionality runs the reverse direction with its own
parameters and merges by concat (+ linear) or add, per the reference.
"""

from __future__ import annotations

from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mamba_scan import selective_scan_auto
from ..ops.ssd import ssd_chunked


class MambaLayer(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: int = 0  # 0 → ceil(d_model/16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, T, d_model) → (B, T, d_model), causal."""
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank or -(-self.d_model // 16)
        B_, T, _ = x.shape

        xz = nn.Dense(2 * d_inner, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        xi, z = jnp.split(xz, 2, axis=-1)

        # causal depthwise conv, kernel d_conv
        conv_w = self.param("conv_kernel", nn.initializers.lecun_normal(), (self.d_conv, 1, d_inner))
        conv_b = self.param("conv_bias", nn.initializers.zeros, (d_inner,))
        xi_pad = jnp.pad(xi, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        xi = jax.lax.conv_general_dilated(
            xi_pad.astype(self.dtype),
            conv_w.astype(self.dtype),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d_inner,
        ) + conv_b
        xi = nn.silu(xi)

        dbc = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False, dtype=self.dtype, name="x_proj")(xi)
        dt, Bm, C = jnp.split(dbc, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt = nn.Dense(d_inner, dtype=self.dtype, name="dt_proj")(dt)
        delta = nn.softplus(dt)

        A_log = self.param(
            "A_log", lambda k: jnp.log(jnp.broadcast_to(jnp.arange(1, self.d_state + 1, dtype=jnp.float32), (d_inner, self.d_state)))
        )
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (d_inner,))

        y = selective_scan_auto(
            xi.astype(jnp.float32), delta.astype(jnp.float32), A, Bm.astype(jnp.float32), C.astype(jnp.float32), D
        ).astype(self.dtype)
        y = y * nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(y)


class BiMambaBlock(nn.Module):
    """Residual stack of bidirectional Mamba layers; output (B, T, d_model).

    merge='concat' (MambaBlockV2 style: fwd‖bwd → linear) or 'add'
    (MambaBlock with bidirectional_merging='add').
    """

    d_model: int
    n_layer: int = 2
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    merge: Literal["concat", "add"] = "concat"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x
        for i in range(self.n_layer):
            hn = nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(h)
            fwd = MambaLayer(self.d_model, self.d_state, self.d_conv, self.expand, dtype=self.dtype, name=f"fwd_{i}")(hn)
            bwd = MambaLayer(self.d_model, self.d_state, self.d_conv, self.expand, dtype=self.dtype, name=f"bwd_{i}")(hn[:, ::-1])[:, ::-1]
            if self.merge == "add":
                h = h + fwd + bwd
            else:
                mix = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name=f"merge_{i}")(
                    jnp.concatenate([fwd, bwd], axis=-1)
                )
                h = h + mix
        return nn.LayerNorm(dtype=self.dtype, name="norm_out")(h)


def _inv_softplus(y: float) -> float:
    return float(np.log(np.expm1(y)))


class Mamba2Layer(nn.Module):
    """Mamba-2 mixer on the chunked SSD scan (ops/ssd.py).

    Reference behavior: `mamba_ssm.modules.mamba2.Mamba2` as stacked by
    `egs/alimeeting/ts_vad2/mamba.py:150-233` (d_state 64, d_conv 4,
    expand 2). Structure: in_proj → [z | xBC | dt], causal depthwise conv
    over xBC, SiLU, SSD with a scalar A per head, gated RMSNorm, out_proj.
    """

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    chunk: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """(B, T, d_model) → (B, T, d_model), causal."""
        d_inner = self.expand * self.d_model
        assert d_inner % self.headdim == 0, "d_inner must be a multiple of headdim"
        H = d_inner // self.headdim
        G, N, P = self.ngroups, self.d_state, self.headdim
        Bsz, T, _ = x.shape

        d_xbc = d_inner + 2 * G * N
        zxbcdt = nn.Dense(2 * d_inner + 2 * G * N + H, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        z, xbc, dt = jnp.split(zxbcdt, [d_inner, d_inner + d_xbc], axis=-1)

        # causal depthwise conv over [x | B | C] jointly (reference conv1d)
        conv_w = self.param("conv_kernel", nn.initializers.lecun_normal(), (self.d_conv, 1, d_xbc))
        conv_b = self.param("conv_bias", nn.initializers.zeros, (d_xbc,))
        xbc_pad = jnp.pad(xbc, ((0, 0), (self.d_conv - 1, 0), (0, 0)))
        xbc = jax.lax.conv_general_dilated(
            xbc_pad.astype(self.dtype),
            conv_w.astype(self.dtype),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d_xbc,
        ) + conv_b
        xbc = nn.silu(xbc)
        xi, Bm, Cm = jnp.split(xbc, [d_inner, d_inner + G * N], axis=-1)

        # dt bias: softplus(dt + bias) lands in [dt_min, dt_max] at init
        def dt_bias_init(key):
            u = jax.random.uniform(key, (H,), minval=np.log(1e-3), maxval=np.log(1e-1))
            return jnp.log(jnp.expm1(jnp.exp(u)))

        dt_bias = self.param("dt_bias", dt_bias_init)
        dt = nn.softplus(dt.astype(jnp.float32) + dt_bias)

        # A: scalar per head, init uniform in [1, 16] (mamba2 A_init_range)
        A_log = self.param(
            "A_log", lambda k: jnp.log(jax.random.uniform(k, (H,), minval=1.0, maxval=16.0))
        )
        A = -jnp.exp(A_log)
        D = self.param("D", nn.initializers.ones, (H,))

        y = ssd_chunked(
            xi.astype(jnp.float32).reshape(Bsz, T, H, P),
            dt,
            A,
            Bm.astype(jnp.float32).reshape(Bsz, T, G, N),
            Cm.astype(jnp.float32).reshape(Bsz, T, G, N),
            D,
            chunk=self.chunk,
        ).reshape(Bsz, T, d_inner).astype(self.dtype)

        # gated RMSNorm (mamba2 RMSNormGated, norm_before_gate=False)
        y = y * nn.silu(z)
        y = nn.RMSNorm(dtype=self.dtype, name="norm")(y)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name="out_proj")(y)


class BiMamba2Block(nn.Module):
    """Residual stack of bidirectional Mamba-2 layers (Mamba2BlockV2 analogue).

    The reference concatenates fwd‖bwd (doubling the width for downstream
    layers); here concat is mixed back to d_model by a linear, keeping the
    block shape-preserving — same convention as BiMambaBlock above.
    """

    d_model: int
    n_layer: int = 2
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    merge: Literal["concat", "add"] = "concat"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x
        for i in range(self.n_layer):
            hn = nn.RMSNorm(dtype=self.dtype, name=f"norm_{i}")(h)
            kw = dict(
                d_state=self.d_state, d_conv=self.d_conv, expand=self.expand,
                headdim=self.headdim, dtype=self.dtype,
            )
            fwd = Mamba2Layer(self.d_model, name=f"fwd_{i}", **kw)(hn)
            bwd = Mamba2Layer(self.d_model, name=f"bwd_{i}", **kw)(hn[:, ::-1])[:, ::-1]
            if self.merge == "add":
                h = h + fwd + bwd
            else:
                mix = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, name=f"merge_{i}")(
                    jnp.concatenate([fwd, bwd], axis=-1)
                )
                h = h + mix
        return nn.RMSNorm(dtype=self.dtype, name="norm_out")(h)
