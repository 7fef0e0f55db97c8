"""Learning-rate schedules used across the reference recipes.

- Noam (inverse-sqrt with warmup): EEND/EEND-EDA
  (`/root/reference/speaker_diarization/eend_eda/lr_scheduler.py:6-33`).
- Polynomial decay with warmup: TS-VAD
  (`/root/reference/egs/alimeeting/ts_vad2/polynomial.py`).
"""

from __future__ import annotations


def noam_schedule(base_lr: float, d_model: int, warmup_steps: int = 25000):
    """lr(step) = base_lr * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)."""
    import jax.numpy as jnp

    def schedule(step):
        s = jnp.maximum(step + 1, 1).astype(jnp.float32)  # 1-indexed like the reference
        return base_lr * (d_model ** -0.5) * jnp.minimum(s ** -0.5, s * (warmup_steps ** -1.5))

    return schedule


def polynomial_decay_schedule(
    base_lr: float,
    warmup_steps: int,
    total_steps: int,
    end_lr: float = 0.0,
    power: float = 1.0,
):
    """Linear warmup then polynomial decay to end_lr at total_steps."""
    import jax.numpy as jnp

    def schedule(step):
        s = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warm = base_lr * jnp.minimum(s / jnp.maximum(warmup_steps, 1), 1.0)
        frac = jnp.clip((s - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0)
        decay = (base_lr - end_lr) * (1 - frac) ** power + end_lr
        return jnp.where(s < warmup_steps, warm, decay)

    return schedule
