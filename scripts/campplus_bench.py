"""CAM++ stage-level microbench: where the encoder's 14.8 ms/call goes.

Round-3 found the flagship inference encoder-bound (CAM++ at MFU 0.10 =
88% of wall, RESULTS.md round-3). This times each stage separately with
the witness methodology (distinct buffers, value-fetch completion) so the
round-4 MXU reformulation lands where the time is.

Stages (reference cam_pplus_wespeaker.py structure):
  fbank  — kaldi fbank front-end (on-device)
  fcm    — 2-D residual front-end (B,T,80)→(B,T,320)
  tdnn   — k5 s2 TDNN (→ 50 Hz, 128 ch)
  block1/2/3 + transit — the dense CAM blocks (12/24/16 layers)

Usage: python scripts/campplus_bench.py [batch]
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import os

import jax

# persist XLA executables across runs — relay compiles are minutes long
_cache = os.path.join(os.path.expanduser("~"), ".cache", "sdt_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.models.campplus import (
    BNReLU,
    CAMDenseTDNNBlock,
    CAMPPlus,
    FCM,
    TDNNLayer,
    TransitLayer,
)
from speaker_diarization_tpu.ops import features as F

PEAK = 197e12


def timeit(fn, iters=10, reps=3):
    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = None
        for i in range(iters):
            s = fn(i)
            acc = s if acc is None else acc + s
        float(acc)
        dts.append((time.perf_counter() - t0) / iters)
    return statistics.median(dts)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64
    secs, rate = 4, 16000
    T = secs * 100  # 100 Hz fbank frames
    model = CAMPPlus(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    n_bufs = 4
    fb_bufs = [
        jax.device_put(rng.standard_normal((B, T, 80)).astype(np.float32))
        for _ in range(n_bufs)
    ]
    variables = model.init(jax.random.PRNGKey(0), fb_bufs[0], False, "frames")
    params, stats = variables["params"], variables.get("batch_stats", {})

    def sub(name, module, x_shape):
        v = {"params": params[name]}
        if name in stats:
            v["batch_stats"] = stats[name]
        xs = [
            jax.device_put(rng.standard_normal(x_shape).astype(np.float32))
            for _ in range(n_bufs)
        ]
        f = jax.jit(lambda x: jnp.sum(module.apply(v, x, False).astype(jnp.float32)))
        try:
            ca = f.lower(xs[0]).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
        except Exception:
            flops = 0.0
        float(f(xs[0]))  # compile+run
        dt = timeit(lambda i: f(xs[i % n_bufs]))
        print(json.dumps({
            "stage": name, "ms": round(dt * 1e3, 3),
            "gflops": round(flops / 1e9, 2),
            "mfu": round(flops / dt / PEAK, 4) if flops else None,
        }), flush=True)
        return dt

    # fbank front-end
    audio_bufs = [
        jax.device_put(rng.standard_normal((B, secs * rate)).astype(np.float32) * 0.1)
        for _ in range(n_bufs)
    ]
    fbank = jax.jit(lambda a: jnp.sum(F.kaldi_fbank_jax(a, sample_rate=rate, mean_norm=True)))
    float(fbank(audio_bufs[0]))
    dt = timeit(lambda i: fbank(audio_bufs[i % n_bufs]))
    print(json.dumps({"stage": "fbank", "ms": round(dt * 1e3, 3)}), flush=True)

    total = 0.0
    total += sub("head", FCM(dtype=jnp.bfloat16), (B, T, 80))
    total += sub("tdnn", TDNNLayer(128, 5, stride=2, dtype=jnp.bfloat16), (B, T, 320))
    channels = 128
    T2 = T // 2
    for i, (nl, dil) in enumerate(zip((12, 24, 16), (1, 2, 2))):
        total += sub(
            f"block{i+1}",
            CAMDenseTDNNBlock(num_layers=nl, out_channels=32, bn_channels=128,
                              kernel_size=3, dilation=dil, dtype=jnp.bfloat16),
            (B, T2, channels),
        )
        channels += nl * 32
        total += sub(f"transit{i+1}", TransitLayer(channels // 2, dtype=jnp.bfloat16), (B, T2, channels))
        channels //= 2
    total += sub("out_nonlinear", BNReLU(dtype=jnp.bfloat16), (B, T2, channels))

    # whole encoder for cross-check
    whole = jax.jit(lambda x: jnp.sum(model.apply(variables, x, False, "frames").astype(jnp.float32)))
    float(whole(fb_bufs[0]))
    dt = timeit(lambda i: whole(fb_bufs[i % n_bufs]))
    print(json.dumps({"stage": "whole_encoder", "ms": round(dt * 1e3, 3),
                      "sum_of_stages_ms": round(total * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()


def bench_fused():
    """Fused dense-block inference path vs the standard module."""
    from speaker_diarization_tpu.kernels.cam_block_fused import campplus_frames_fused

    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    T = 400
    model = CAMPPlus(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    n_bufs = 4
    fb_bufs = [jax.device_put(rng.standard_normal((B, T, 80)).astype(np.float32)) for _ in range(n_bufs)]
    variables = model.init(jax.random.PRNGKey(0), fb_bufs[0], False, "frames")
    for name, f in (
        ("standard", jax.jit(lambda x: jnp.sum(model.apply(variables, x, False, "frames").astype(jnp.float32)))),
        ("fused", jax.jit(lambda x: jnp.sum(campplus_frames_fused(model, variables, x).astype(jnp.float32)))),
    ):
        try:
            ca = f.lower(fb_bufs[0]).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
        except Exception:
            flops = 0.0
        float(f(fb_bufs[0]))
        dt = timeit(lambda i: f(fb_bufs[i % n_bufs]))
        print(json.dumps({"encoder": name, "ms": round(dt * 1e3, 3), "batch": B,
                          "gflops": round(flops / 1e9, 2),
                          "mfu": round(flops / dt / PEAK, 4) if flops else None}), flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "fused":
    bench_fused()
    sys.exit(0)
