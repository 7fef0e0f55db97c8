"""Device mesh + sharding helpers (pjit/GSPMD over ICI).

The reference's distributed story is NCCL data-parallel DDP
(`/root/reference/speaker_diarization/dist.py:24-42`); the TPU-native
equivalent is a `jax.sharding.Mesh` with a `data` axis (batch sharding, grad
all-reduce compiled by XLA as psum over ICI) and an optional `model` axis for
GSPMD parameter sharding of encoders that exceed one chip. Multi-host uses
the same code path — `jax.distributed.initialize()` then the global mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_spec(ndim: int) -> P:
    """PartitionSpec sharding the leading (batch) axis over 'data'."""
    return P("data", *([None] * (ndim - 1)))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Multi-process (multi-host): each process passes its HOST-LOCAL batch
    shard — the per-host data-loading contract of the reference's DDP
    (each NCCL rank loads its own batch slice); the global batch is
    assembled across processes (global batch = local batch × process
    count along 'data').
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        sharding = NamedSharding(mesh, batch_spec(np.ndim(x)))
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh.

    Multi-process: every process must pass the same host values (e.g.
    params initialized from the same seed); each contributes its local
    devices' replicas.
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        sharding = NamedSharding(mesh, P())
        if multiprocess:
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


# ---------------------------------------------------------------------------
# Parameter partitioning (GSPMD tensor parallelism over the 'model' axis)
# ---------------------------------------------------------------------------

# Default rules for the transformer trunk: shard the FF hidden dim and the
# attention head projections over 'model'; everything else replicated. Rules
# are (path-regex, PartitionSpec) pairs matched against '/'-joined param paths.
DEFAULT_TP_RULES = (
    (r"FeedForward_\d+/Dense_0/kernel", P(None, "model")),
    (r"FeedForward_\d+/Dense_0/bias", P("model")),
    (r"FeedForward_\d+/Dense_1/kernel", P("model", None)),
    (r"(query|key|value)/kernel", P(None, "model", None)),
    (r"(query|key|value)/bias", P("model", None)),
    (r"out/kernel", P("model", None, None)),
)


def partition_params(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """Pytree of NamedShardings for `params` from path-regex rules.

    Any parameter whose sharded dimension is not divisible by the mesh axis
    size falls back to replication (safe default for tiny test models).
    """
    import re

    flat = jax.tree_util.tree_flatten_with_path(params)
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        for pat, spec in rules:
            if re.search(pat, name):
                ok = True
                for dim, ax in enumerate(spec):
                    if ax is None:
                        continue
                    size = axis_sizes.get(ax, 1)
                    if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                        ok = False
                        break
                if ok:
                    return NamedSharding(mesh, spec)
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, P())

    leaves, treedef = jax.tree_util.tree_flatten(params)
    specs = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh, rules=DEFAULT_TP_RULES):
    """Device-put params according to partition_params."""
    shardings = partition_params(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
