"""Benchmark: diarization inference throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): reference TS-VAD2 inference ≈ 1.02 it/s at batch 64 ×
4 s chunks ⇒ ~256 audio-seconds/s per V100 GPU. We measure the same quantity
— processed audio seconds per wall second per chip — for the current
flagship forward path (batch 64 × 4 s chunks, bf16), steady-state, after
compile. The flagship model upgrades as the framework grows (EEND transformer
now; TS-VAD with speaker encoder once that stack lands).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from speaker_diarization_tpu.models import TSVADConfig, TSVADModel

    cfg = TSVADConfig()  # full-size: CAM++ (12,24,16) + 2×2-layer d384 backends
    model = TSVADModel(cfg=cfg, dtype=jnp.bfloat16)
    B, chunk_s = 64, 4.0
    T = int(chunk_s * cfg.label_rate)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, int(chunk_s * cfg.sample_rate))).astype(np.float32) * 0.1)
    embs = jnp.asarray(
        rng.standard_normal((B, cfg.max_num_speaker, cfg.speaker_embed_dim)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), audio, embs, T)

    @jax.jit
    def forward(variables, audio, embs):
        return jax.nn.sigmoid(model.apply(variables, audio, embs, T, train=False))

    # warmup/compile
    forward(variables, audio, embs).block_until_ready()
    forward(variables, audio, embs).block_until_ready()

    # the TPU is reached through a relay with variable latency; take the
    # best of several repetitions as the speed-of-light estimate
    iters, reps = 10, 5
    best_dt = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = forward(variables, audio, embs)
        out.block_until_ready()
        best_dt = min(best_dt, time.perf_counter() - t0)

    audio_seconds = iters * B * chunk_s
    value = audio_seconds / best_dt
    baseline = 256.0  # audio-s/s per V100 GPU (run_ts_vad2.sh:198,230)
    print(
        json.dumps(
            {
                "metric": "inference_audio_seconds_per_second_per_chip",
                "value": round(value, 1),
                "unit": "audio_s/s/chip",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
