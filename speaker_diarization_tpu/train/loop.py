"""Generic training loop: epochs, periodic validation, checkpointing, logging.

One loop for every family (reference equivalents: eend_train.py:21-222,
train_accelerate_ddp2.py:556-700). Metrics stream to stdout and a JSONL
file; checkpoints go through train.checkpoints.CheckpointManager with
best-by-valid-loss retention.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Iterator, Optional

import jax
import numpy as np

from .checkpoints import CheckpointManager
from .trainer import Trainer, TrainState

log = logging.getLogger(__name__)


def prefetch_iterator(it: Iterator[dict], depth: int = 6) -> Iterator[dict]:
    """Run the (host-side) batch iterator in a background thread with a
    bounded queue, overlapping wav reads / slicing / augmentation with the
    device step. The reference gets this from torch DataLoader workers
    (ts_vad_dataset num_workers); here the item-level work inside each
    batch is already fanned out over the shared thread pool
    (data/parallel_fetch.py), so one queue-feeder thread suffices."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface exceptions in the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def run_training(
    trainer: Trainer,
    state: TrainState,
    make_train_iter: Callable[[int], Iterator[dict]],
    num_steps: int,
    make_valid_iter: Optional[Callable[[], Iterator[dict]]] = None,
    ckpt_manager: Optional[CheckpointManager] = None,
    log_every: int = 50,
    valid_every: int = 500,
    save_every: Optional[int] = None,
    metrics_path: Optional[str] = None,
    early_stop_patience: Optional[int] = None,
    early_stop_min_delta: float = 0.0,
    profile_dir: Optional[str] = None,
    profile_start: int = 10,
    profile_steps: int = 5,
) -> TrainState:
    """`early_stop_patience`: stop after this many consecutive validations
    without the valid loss improving by more than `early_stop_min_delta`
    (DiariZen trainer_single_opt.py:147 early-stop semantics).

    `profile_dir`: capture a jax.profiler trace (TensorBoard/Perfetto) of
    steps [profile_start, profile_start + profile_steps)."""
    save_every = save_every or valid_every
    mf = open(metrics_path, "a") if metrics_path else None
    step = int(np.asarray(state.step))
    epoch = 0
    t0 = time.time()
    window = []
    best_vloss = float("inf")
    bad_validations = 0
    stop = False
    probe_next = True  # time one fully-drained step per log interval
    device_probe_ms = None
    try:
        while step < num_steps and not stop:
            for batch in prefetch_iterator(make_train_iter(epoch)):
                if profile_dir is not None and step == profile_start:
                    jax.profiler.start_trace(profile_dir)
                if probe_next:
                    # queue was just drained at the log boundary, so
                    # dispatch→value time ≈ one device step (+ transfer)
                    tp = time.perf_counter()
                    state, aux = trainer.train_step(state, batch)
                    jax.block_until_ready(aux["loss"])
                    device_probe_ms = (time.perf_counter() - tp) * 1e3
                    probe_next = False
                else:
                    # no per-step host sync: losses are fetched in bulk at
                    # the log boundary so device steps pipeline freely
                    state, aux = trainer.train_step(state, batch)
                step += 1
                if profile_dir is not None and step == profile_start + profile_steps:
                    jax.block_until_ready(aux)
                    jax.profiler.stop_trace()
                    log.info("profiler trace for steps [%d, %d) → %s",
                             profile_start, step, profile_dir)
                    profile_dir = None
                window.append(aux["loss"])
                if step % log_every == 0:
                    losses = [float(np.asarray(x)) for x in window]  # drains queue
                    dt = time.time() - t0
                    dev_s = (device_probe_ms or 0.0) * 1e-3 * len(losses)
                    msg = {
                        "step": step,
                        "epoch": epoch,
                        "loss": round(float(np.mean(losses)), 5),
                        "lr": round(float(aux["lr"]), 7),
                        "grad_norm": round(float(aux["grad_norm"]), 4),
                        "steps_per_s": round(len(losses) / max(dt, 1e-9), 3),
                        "device_step_ms": round(device_probe_ms or 0.0, 2),
                        # fraction of wall time the chip was doing steps;
                        # (1 - util) is host-input-pipeline stall
                        "device_util": round(min(1.0, dev_s / max(dt, 1e-9)), 3),
                    }
                    for k, v in aux.items():
                        if k not in ("loss", "lr", "grad_norm"):
                            msg[k] = round(float(v), 5)
                    log.info("train %s", msg)
                    probe_next = True
                    if mf:
                        mf.write(json.dumps({"kind": "train", **msg}) + "\n")
                        mf.flush()
                    window = []
                    t0 = time.time()
                if make_valid_iter is not None and step % valid_every == 0:
                    vloss = validate(trainer, state, make_valid_iter())
                    log.info("valid step=%d loss=%.5f", step, vloss)
                    if mf:
                        mf.write(json.dumps({"kind": "valid", "step": step, "loss": vloss}) + "\n")
                        mf.flush()
                    if ckpt_manager is not None:
                        ckpt_manager.save(state, metric=vloss)
                    if vloss < best_vloss - early_stop_min_delta:
                        best_vloss = vloss
                        bad_validations = 0
                    else:
                        bad_validations += 1
                        if early_stop_patience is not None and bad_validations >= early_stop_patience:
                            log.info(
                                "early stop at step %d: %d validations without improvement",
                                step, bad_validations,
                            )
                            stop = True
                            break
                elif ckpt_manager is not None and step % save_every == 0:
                    ckpt_manager.save(state)
                if step >= num_steps:
                    break
            epoch += 1
    finally:
        if mf:
            mf.close()
    if ckpt_manager is not None:
        ckpt_manager.save(state)
    return state


def validate(trainer: Trainer, state: TrainState, batches: Iterator[dict]) -> float:
    losses = []
    for b in batches:
        aux = trainer.eval_step(state.params, b, mutable=state.mutable)
        losses.append(float(aux["loss"]))
    if not losses:
        log.warning("validation iterator yielded no batches (dataset smaller than batch size?)")
        return float("nan")
    return float(np.mean(losses))
