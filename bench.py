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
    from speaker_diarization_tpu.models import EENDModel
    from speaker_diarization_tpu.models.eend import FrontendConfig

    fe = FrontendConfig(sample_rate=16000, frame_size=400, frame_shift=160)
    B, chunk_s = 64, 4.0
    T = int(chunk_s * fe.sample_rate / fe.frame_shift / fe.subsampling)  # subsampled frames
    model = EENDModel(
        n_speakers=4, d_model=256, n_layers=4, n_heads=4, d_ff=1024, frontend=fe, dtype=jnp.bfloat16
    )
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, fe.chunk_samples(T))).astype(np.float32) * 0.1
    )
    params = model.init(jax.random.PRNGKey(0), audio)

    @jax.jit
    def forward(params, audio):
        return jax.nn.sigmoid(model.apply(params, audio, deterministic=True))

    # warmup/compile
    forward(params, audio).block_until_ready()
    forward(params, audio).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = forward(params, audio)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    audio_seconds = iters * B * (fe.chunk_samples(T) / fe.sample_rate)
    value = audio_seconds / dt
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
