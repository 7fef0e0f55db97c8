"""The single unified trainer for every model family.

Replaces the reference's four coexisting harnesses (hand-rolled DDP,
Accelerate, Lightning, DiariZen — SURVEY.md §1 L3) with one pjit/GSPMD
trainer: params replicated (or model-sharded) on a Mesh, batches sharded over
the 'data' axis, gradients all-reduced by XLA as psum over ICI, bf16 compute
with f32 params/optimizer, optional gradient accumulation (optax.MultiSteps),
global-norm clipping, and an online Polyak-averaged parameter copy
(the icefall-style averaged model of ts_vad2/checkpoint.py:472-504).

The task plugs in as a pure `loss_fn(params, batch, rng, train) → (loss, aux)`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import shard_batch, replicate
from .schedules import noam_schedule, polynomial_decay_schedule


@dataclass
class TrainerConfig:
    optimizer: str = "adam"  # adam | adamw | sgd
    learning_rate: float = 1.0  # noam: scale; others: peak lr
    schedule: str = "noam"  # noam | poly | const
    d_model: int = 256  # for noam
    warmup_steps: int = 25000
    total_steps: int = 100000
    end_lr: float = 0.0
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = 5.0
    # AutoClip (DiariZen trainer_single_opt.py:34-40): clip at this percentile
    # of the rolling grad-norm history instead of a fixed norm. Overrides
    # grad_clip_norm when set (e.g. 10.0).
    auto_clip_percentile: Optional[float] = None
    grad_history_size: int = 1000
    # skip updates whose gradients are non-finite (DiariZen
    # trainer_single_opt.py:60-61 skips NaN-loss batches)
    skip_nonfinite: bool = False
    grad_accum_steps: int = 1
    model_avg_decay: Optional[float] = None  # e.g. 0.999; None disables
    seed: int = 0
    # Bitwise-reproducible data parallelism: compute per-shard gradients under
    # shard_map, then all_gather + fixed-order local sum instead of relying on
    # XLA's psum reduction tree (whose floating-point order varies with the
    # process topology — 2 procs × 2 devices vs 1 proc × 4 devices differ at
    # ~1 ulp). With this on, an N-process run is bitwise-identical to a
    # single-process run over the same global mesh (SURVEY §7 contract).
    # Requires has_mutable=False and a pure per-sample-mean loss.
    deterministic_reduce: bool = False


class AutoClipState(flax.struct.PyTreeNode):
    history: jnp.ndarray  # (H,) grad norms, filled sequentially then ring
    count: jnp.ndarray  # total norms recorded


def auto_clip_by_percentile(percentile: float, history_size: int = 1000) -> optax.GradientTransformation:
    """Adaptive gradient clipping: clip at the given percentile of the last
    `history_size` gradient norms (AutoClip; DiariZen auto_clip_grad_norm_,
    trainer_single_opt.py:34-40). Pure on-device state — no host sync."""

    def init_fn(params):
        del params
        return AutoClipState(
            history=jnp.zeros((history_size,), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        del params
        gnorm = optax.global_norm(updates).astype(jnp.float32)
        pos = jnp.mod(state.count, history_size)
        hist = state.history.at[pos].set(gnorm)
        n = jnp.minimum(state.count + 1, history_size)
        # linear-interpolated percentile over the n valid entries
        # (invalid tail sorts to +inf and is never indexed)
        masked = jnp.where(jnp.arange(history_size) < n, hist, jnp.inf)
        srt = jnp.sort(masked)
        f = percentile / 100.0 * (n - 1).astype(jnp.float32)
        i0 = jnp.floor(f).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        w = f - i0.astype(jnp.float32)
        clip = srt[i0] * (1.0 - w) + srt[i1] * w
        scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
        updates = jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), updates)
        return updates, AutoClipState(history=hist, count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    avg_params: Any = None
    rng: Any = None
    mutable: Any = None  # non-trained model state (e.g. BatchNorm batch_stats)


def build_optimizer(cfg: TrainerConfig) -> tuple[optax.GradientTransformation, Callable]:
    if cfg.schedule == "noam":
        sched = noam_schedule(cfg.learning_rate, cfg.d_model, cfg.warmup_steps)
    elif cfg.schedule == "poly":
        sched = polynomial_decay_schedule(cfg.learning_rate, cfg.warmup_steps, cfg.total_steps, cfg.end_lr)
    elif cfg.schedule == "const":
        sched = lambda step: cfg.learning_rate  # noqa: E731
    else:
        raise ValueError(cfg.schedule)

    if cfg.optimizer == "adam":
        opt = optax.adam(sched)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(sched)
    else:
        raise ValueError(cfg.optimizer)

    chain = []
    if cfg.auto_clip_percentile is not None:
        chain.append(auto_clip_by_percentile(cfg.auto_clip_percentile, cfg.grad_history_size))
    elif cfg.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(opt)
    tx = optax.chain(*chain)
    if cfg.skip_nonfinite:
        # non-finite grads leave params/opt state untouched (NaN-batch skip)
        tx = optax.apply_if_finite(tx, max_consecutive_errors=10**6)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accum_steps)
    return tx, sched


class Trainer:
    """jit-compiled train/eval steps over a device mesh.

    loss_fn(params, batch, rng, train: bool) → (loss, aux_dict); must be pure.
    With has_mutable=True the signature becomes
    loss_fn(params, mutable, batch, rng, train) → (loss, (aux_dict, new_mutable))
    — used for models carrying BatchNorm batch_stats.
    """

    def __init__(
        self,
        loss_fn: Callable,
        cfg: TrainerConfig,
        mesh: Optional[Mesh] = None,
        has_mutable: bool = False,
    ):
        self.loss_fn = loss_fn
        self.cfg = cfg
        self.mesh = mesh
        self.has_mutable = has_mutable
        self.tx, self.schedule = build_optimizer(cfg)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------
    def init_state(self, params, mutable=None) -> TrainState:
        # Defensive copy: train_step donates the state (donate_argnums=(0,)),
        # so without it the FIRST step would delete the caller's own arrays —
        # any later use of the params/mutable passed in here (a second
        # Trainer over the same init, a comparison against step 0) would
        # raise "Array has been deleted".
        params = jax.tree_util.tree_map(jnp.array, params)
        if mutable is not None:
            mutable = jax.tree_util.tree_map(jnp.array, mutable)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            avg_params=params if self.cfg.model_avg_decay is not None else None,
            rng=jax.random.PRNGKey(self.cfg.seed),
            mutable=mutable,
        )
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def init_state_sharded(self, params, mesh: Mesh, mutable=None) -> TrainState:
        """Init state for already-sharded (GSPMD tensor-parallel) params.

        The optimizer state is created under jit so XLA propagates each
        parameter's sharding to its mirrored moment buffers.
        """
        opt_state = jax.jit(self.tx.init)(params)
        scalar = NamedSharding(mesh, P())
        return TrainState(
            step=jax.device_put(jnp.zeros((), jnp.int32), scalar),
            params=params,
            opt_state=opt_state,
            avg_params=params if self.cfg.model_avg_decay is not None else None,
            rng=jax.device_put(jax.random.PRNGKey(self.cfg.seed), scalar),
            mutable=mutable if mutable is None else replicate(mutable, mesh),
        )

    # ------------------------------------------------------------------
    def _train_step_impl(self, state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        new_mutable = state.mutable
        if self.has_mutable:
            (loss, (aux, new_mutable)), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                state.params, state.mutable, batch, step_rng, True
            )
        elif self.cfg.deterministic_reduce and self.mesh is not None and self.mesh.shape.get("data", 1) > 1:
            loss, aux, grads = self._deterministic_value_and_grad(state.params, batch, step_rng)
        else:
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                state.params, batch, step_rng, True
            )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        avg_params = state.avg_params
        if avg_params is not None:
            d = self.cfg.model_avg_decay
            avg_params = jax.tree_util.tree_map(
                lambda a, p: a * d + p.astype(a.dtype) * (1.0 - d), avg_params, params
            )
        aux = dict(aux)
        aux["loss"] = loss
        aux["grad_norm"] = optax.global_norm(grads)
        aux["lr"] = self.schedule(state.step)
        return (
            TrainState(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                avg_params=avg_params,
                rng=rng,
                mutable=new_mutable,
            ),
            aux,
        )

    def _deterministic_value_and_grad(self, params, batch, step_rng):
        """Topology-independent grad reduction (cfg.deterministic_reduce).

        Each data shard computes its local loss/grads; the cross-device
        reduction is an explicit all_gather followed by a fixed-order local
        mean, so the floating-point summation order is identical however the
        global mesh is split across processes.
        """
        from jax.experimental.shard_map import shard_map

        n_data = self.mesh.shape["data"]

        def local_step(params, batch):
            (loss, aux), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, batch, step_rng, True
            )
            gathered = jax.lax.all_gather((loss, aux, grads), "data")

            def fixed_order_mean(x):
                acc = x[0]
                for i in range(1, n_data):
                    acc = acc + x[i]
                return acc / n_data

            return jax.tree_util.tree_map(fixed_order_mean, gathered)

        batch_specs = jax.tree_util.tree_map(lambda _: P("data"), batch)
        param_specs = jax.tree_util.tree_map(lambda _: P(), params)
        return shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(param_specs, batch_specs),
            out_specs=P(),
            check_rep=False,
        )(params, batch)

    def _eval_step_impl(self, params, mutable, batch):
        if self.has_mutable:
            loss, (aux, _) = self.loss_fn(params, mutable, batch, jax.random.PRNGKey(0), False)
        else:
            loss, aux = self.loss_fn(params, batch, jax.random.PRNGKey(0), False)
        aux = dict(aux)
        aux["loss"] = loss
        return aux

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState, batch):
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return self._train_step(state, batch)

    def eval_step(self, params, batch, mutable=None):
        if self.mesh is not None:
            batch = shard_batch(batch, self.mesh)
        return self._eval_step(params, mutable, batch)
