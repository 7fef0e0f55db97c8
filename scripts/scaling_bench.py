"""Multi-chip scaling benchmark (run on a real pod slice).

Measures TS-VAD training-step throughput (audio-s/s) at 1..N chips with
data-parallel batch sharding, reporting scaling efficiency vs 1 chip —
the BASELINE.md ≥85%-at-2-hosts target. On a single-chip or CPU machine it
still runs (fake devices via --fake-devices) to validate the measurement
path; the numbers are only meaningful on real hardware.

Usage:
    python scripts/scaling_bench.py [--fake-devices 8] [--batch-per-chip 8]
Multi-host: run under `jax.distributed.initialize()` (one process per host)
with no code changes — the Mesh spans all hosts.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fake-devices", type=int, default=0)
    ap.add_argument("--batch-per-chip", type=int, default=8)
    ap.add_argument("--chunk-s", type=float, default=4.0)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax

    if args.fake_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.fake_devices)

    import jax.numpy as jnp
    import numpy as np

    from speaker_diarization_tpu.models import TSVADConfig, TSVADModel
    from speaker_diarization_tpu.parallel import make_mesh
    from speaker_diarization_tpu.train import Trainer, TrainerConfig
    from speaker_diarization_tpu.train.tasks import make_tsvad_loss

    n_dev = len(jax.devices())
    cfg = TSVADConfig() if not args.fake_devices else TSVADConfig(
        transformer_ffn_embed_dim=256, num_transformer_layer=1, encoder_block_layers=(2, 2)
    )
    T = int(args.chunk_s * cfg.label_rate)
    model = TSVADModel(cfg=cfg, dtype=jnp.bfloat16 if not args.fake_devices else jnp.float32)
    results = {}
    sizes = sorted({1, 2, n_dev} & set(range(1, n_dev + 1)))
    for nd in sizes:
        mesh = make_mesh(n_data=nd, n_model=1, devices=jax.devices()[:nd])
        B = args.batch_per_chip * nd
        rng = np.random.default_rng(0)
        batch = dict(
            audio=rng.standard_normal((B, int(args.chunk_s * cfg.sample_rate))).astype(np.float32) * 0.1,
            target_embs=rng.standard_normal((B, cfg.max_num_speaker, cfg.speaker_embed_dim)).astype(np.float32),
            labels=(rng.random((B, T, cfg.max_num_speaker)) < 0.3).astype(np.float32),
        )
        trainer = Trainer(make_tsvad_loss(model, T), TrainerConfig(schedule="const", learning_rate=1e-4), mesh=mesh, has_mutable=True)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(batch["audio"][:1]), jnp.asarray(batch["target_embs"][:1]), T
        )
        state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        state, _ = trainer.train_step(state, batch)  # compile
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, aux = trainer.train_step(state, batch)
        jax.block_until_ready(aux["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        results[nd] = B * args.chunk_s / dt
        print(f"{nd} chips: {results[nd]:.0f} audio-s/s  ({dt*1e3:.1f} ms/step, batch {B})", file=sys.stderr)

    base = results[min(results)]
    out = {
        "metric": "train_scaling",
        "audio_s_per_s": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency": {
            str(k): round(results[k] / (base * k / min(results)), 3) for k in results
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
