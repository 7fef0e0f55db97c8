"""Cumulative-prefix profile of the flagship TS-VAD inference forward.

Builds jitted prefixes of the full forward (fbank → FCM → tdnn → dense
blocks → transits → backends/head) and times each with the witness
methodology; consecutive differences give the in-context cost of each part
WITHOUT per-call dispatch floors (everything inside one jit).

Run after the round-4 queue drains (single TPU client at a time).
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

import os

import jax

_cache = os.path.join(os.path.expanduser("~"), ".cache", "sdt_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.kernels.cam_block_fused import (
    _bn_infer, _dense_block_auto, _fcm_auto, _fcm_infer, _tdnn_infer, _transit_infer,
    prepare_block_params,
)
from speaker_diarization_tpu.models import TSVADConfig, TSVADModel
from speaker_diarization_tpu.ops import features as F


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
    B, secs = 64, 4
    cfg = TSVADConfig()
    model = TSVADModel(cfg=cfg, dtype=jnp.bfloat16)
    T = secs * cfg.label_rate
    rng = np.random.default_rng(0)
    n_bufs = 4
    audios = [
        jax.device_put(rng.standard_normal((B, secs * cfg.sample_rate)).astype(np.float32) * 0.1)
        for _ in range(n_bufs)
    ]
    embss = [
        jax.device_put(rng.standard_normal((B, cfg.max_num_speaker, cfg.speaker_embed_dim)).astype(np.float32))
        for _ in range(n_bufs)
    ]
    variables = model.init(jax.random.PRNGKey(0), audios[0], embss[0], T)
    enc_vars = {
        "params": variables["params"]["speech_encoder"],
        "batch_stats": variables["batch_stats"]["speech_encoder"],
    }
    camp = model.cfg
    enc = TSVADModel(cfg=cfg, dtype=jnp.bfloat16)  # unused; keep cfg reference

    p, st = enc_vars["params"], enc_vars["batch_stats"]
    dt_ = jnp.bfloat16
    block_layers, block_dils = (12, 24, 16), (1, 2, 2)

    def prefix(stage):
        def run(audio):
            fb = F.kaldi_fbank_auto(audio, sample_rate=cfg.sample_rate, num_mel_bins=80, mean_norm=True)
            h = fb.astype(dt_)
            if stage == "fbank":
                return h
            h = (_fcm_infer(h, p["head"], st["head"]) if os.environ.get("SDT_NAIVE_FCM") == "1"
                 else _fcm_auto(h, p["head"], st["head"], dt_))
            if stage == "fcm":
                return h
            h = _tdnn_infer(h, p["tdnn"], st["tdnn"])
            if stage == "tdnn":
                return h
            ch = 128
            for i, (nl, dil) in enumerate(zip(block_layers, block_dils)):
                cmax = ch + nl * 32
                bp = prepare_block_params(p[f"block{i+1}"], st[f"block{i+1}"], nl, ch, cmax)
                h = _dense_block_auto(h, bp, dil, dt_)
                ch = cmax
                if stage == f"block{i+1}":
                    return h
                h = _transit_infer(h, p[f"transit{i+1}"], st[f"transit{i+1}"])
                ch //= 2
            h = _bn_infer(h, p["out_nonlinear"]["bn"], st["out_nonlinear"]["bn"])
            return h

        return jax.jit(lambda a: jnp.sum(run(a).astype(jnp.float32)))

    stages = ["fbank", "fcm", "tdnn", "block1", "block2", "block3", "encoder"]
    prev = 0.0
    for stg in stages:
        f = prefix(stg)
        float(f(audios[0]))
        dt = timeit(lambda i: f(audios[i % n_bufs]))
        print(json.dumps({"prefix": stg, "ms": round(dt * 1e3, 3),
                          "delta_ms": round((dt - prev) * 1e3, 3)}), flush=True)
        prev = dt

    # full model forward for the total
    full = jax.jit(
        lambda a, e: jnp.sum(jax.nn.sigmoid(model.apply(variables, a, e, T, train=False)))
    )
    float(full(audios[0], embss[0]))
    dt = timeit(lambda i: full(audios[i % n_bufs], embss[i % n_bufs]))
    print(json.dumps({"prefix": "full_forward", "ms": round(dt * 1e3, 3),
                      "delta_ms": round((dt - prev) * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
