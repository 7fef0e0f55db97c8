"""OTS-VAD online inference: self-enrolled block-wise decoding.

Reference: `egs/alimeeting/ots_vad/test_inference_case1.py` (Algorithm 1):
the first block bootstraps speaker slot 0 as active everywhere; each later
block is scored against the running masked-mean embeddings of every active
slot; when every active slot stays below `lower` for a whole block and a
free slot remains, a NEW speaker is activated on that block (the
lower-threshold new-speaker rule). Decisions above `upper` update the
embedding accumulators.

The forwards (frame embedding + per-speaker backend) are jit-compiled with
static shapes; the slot bookkeeping is a tiny host loop per recording.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def ots_vad_infer_dataset(
    model,
    variables,
    kd,
    rate: int,
    rs_len: float,
    upper: float = 0.6,
    lower: float = 0.3,
) -> Dict[str, np.ndarray]:
    """kd: KaldiData over the eval dir. Returns {rec: (n_frames25, S) probs}
    on the 25 Hz label grid (model frame rate is 12.5 Hz, repeated ×2)."""
    S = model.cfg.num_speakers
    block = int(rs_len * rate)

    @jax.jit
    def embed(a):
        return model.apply(variables, a, method=model.embed_frames)

    @jax.jit
    def score(emb, targets):
        logits = model.apply(variables, emb, targets, method=model.backend)
        return jax.nn.sigmoid(logits)

    out: Dict[str, np.ndarray] = {}
    for rec in sorted(kd.wavs):
        audio, r = kd.load_wav(rec)
        assert r == rate
        if audio.ndim > 1:
            audio = audio[:, 0]
        n_blocks = max(1, -(-len(audio) // block))
        padded = np.zeros((n_blocks * block,), np.float32)
        padded[: len(audio)] = audio

        d_model = model.cfg.d_model
        sums = np.zeros((S, d_model), np.float64)
        counts = np.zeros((S, 1), np.float64)
        n_active = 0
        probs = []
        for b in range(n_blocks):
            emb = np.asarray(embed(jnp.asarray(padded[None, b * block : (b + 1) * block])))[0]
            T = emb.shape[0]
            if n_active == 0:
                # bootstrap: the first block is attributed to slot 0
                p = np.zeros((S, T), np.float32)
                p[0] = 1.0
                dec = p > 0.5
                n_active = 1
            else:
                targets = np.where(counts > 0, sums / np.maximum(counts, 1e-8), 0.0)
                p = np.array(score(jnp.asarray(emb[None]), jnp.asarray(targets[None], dtype=jnp.float32)))[0]
                p[n_active:] = 0.0  # inactive slots stay silent
                if n_active < S and (p[:n_active] < lower).all():
                    # new-speaker rule: nobody known is talking → enroll a slot
                    p[n_active] = 1.0
                    n_active += 1
                dec = p > upper
            sums += dec @ emb.astype(np.float64)
            counts += dec.sum(axis=1, keepdims=True)
            probs.append(p.T)  # (T, S)

        pr = np.concatenate(probs, axis=0)  # (T12 total, S)
        pr = np.repeat(pr, 2, axis=0)  # 12.5 Hz → 25 Hz grid
        n25 = int(len(audio) / rate * 25)
        out[rec] = pr[:n25]
    return out
