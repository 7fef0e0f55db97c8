"""Ring attention: sequence-parallel exact attention over the ICI ring.

The reference never feeds whole meetings to a model — recordings are
chunked and re-stitched (SURVEY.md §5 long-context). On TPU the native
alternative is to shard the sequence over a mesh axis and rotate K/V
blocks around the ring with `lax.ppermute`, accumulating flash-style
online softmax — exact attention over sequences far beyond one chip's
HBM, with compute/communication overlap handled by XLA.

`ring_attention` is the shard_map-able primitive; `ring_self_attention`
wraps it over a Mesh for (B, T, H, D) activations sharded on T. Validated
bit-for-bit (5e-5) against single-device full attention on the CPU mesh in
tests/test_ring_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ring_attention_local(q, k, v, axis_name: str):
    """Per-shard body: q/k/v (B, T_loc, H, D) — full sequence = ring of shards."""
    axis_size = jax.lax.psum(1, axis_name)
    B, Tq, H, D = q.shape
    scale = D ** -0.5
    qh = q.astype(jnp.float32) * scale

    def step(i, carry):
        acc, m, l, k_blk, v_blk = carry
        # scores vs the K/V block currently resident on this device
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, k_blk.astype(jnp.float32))
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, v_blk.astype(jnp.float32))
        # rotate K/V to the next device on the ring
        perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return acc, m_new, l, k_blk, v_blk

    # derive initial accumulators from q so shard_map marks them as varying
    # over the ring axis (a plain jnp.zeros would be an unvarying constant
    # and fail the lax.scan carry-type check)
    zero_like_q = qh.transpose(0, 2, 1, 3) * 0.0  # (B, H, Tq, D)
    acc0 = zero_like_q
    m0 = zero_like_q[..., 0] - jnp.inf
    l0 = zero_like_q[..., 0]
    acc, m, l, _, _ = jax.lax.fori_loop(0, axis_size, step, (acc0, m0, l0, k, v))
    out = acc / jnp.maximum(l[..., None], 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (B, T_loc, H, D)


def ring_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "data",
):
    """Exact multi-head self-attention with the sequence sharded over
    `seq_axis`. q/k/v: (B, T, H, D) global arrays; returns (B, T, H, D)
    with the same sharding."""
    from jax import shard_map

    spec = P(None, seq_axis, None, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=seq_axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
