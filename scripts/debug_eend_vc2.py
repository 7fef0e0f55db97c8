"""Round-5 EEND-VC stitching experiments on the trained checkpoint (CPU).

Round-4 shipped decode (oracle-k AHC + sil 0.2) = 16.79% on the full test
set vs oracle-stitch 12.51% — the ~4.3-point gap is SC from AHC label
errors. Variants here target that gap:

  base            sil0.2 + oracle-k AHC (the shipped decode)
  norm            same but vectors L2-normalized before the euclidean AHC
                  (euclidean-on-unit-sphere == monotone in cosine)
  refine          base + centroid refinement: per-chunk Hungarian
                  reassignment of channels to distinct clusters by cosine
                  similarity to cluster centroids, 3 iterations
  norm_refine     both

Run: SDT_CPU=1 NREC=40 python scripts/debug_eend_vc2.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SDT_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.data.kaldi_io import KaldiData
from speaker_diarization_tpu.data.rttm import read_rttm_by_rec, write_rttm
from speaker_diarization_tpu.infer.eend_vc import cluster_chunk_vectors, stitch
from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.models.eend_vc import EENDVCModel
from speaker_diarization_tpu.postproc import probs_to_turns
from speaker_diarization_tpu.score.der import score_der
from speaker_diarization_tpu.train.checkpoints import CheckpointManager

WORK = os.environ.get("WORK", "exp/hermetic_tsvad")
RATE = 8000
CHUNK = 200


def refine_labels(actis, svecs, labels, k, iters=3):
    """Per-chunk Hungarian reassignment of non-silent channels to distinct
    clusters by cosine similarity to current centroids."""
    from scipy.optimize import linear_sum_assignment

    n_chunks = len(actis)
    S = labels.shape[1]
    labels = labels.copy()
    for _ in range(iters):
        # centroids from current labels
        cent = np.zeros((k, svecs[0].shape[1]), np.float64)
        cnt = np.zeros(k)
        for c in range(n_chunks):
            for s in range(S):
                l = labels[c, s]
                if l < k:
                    cent[l] += svecs[c][s]
                    cnt[l] += 1
        cent /= np.maximum(cnt[:, None], 1)
        cent /= np.linalg.norm(cent, axis=1, keepdims=True) + 1e-8
        changed = 0
        for c in range(n_chunks):
            ch = [s for s in range(S) if labels[c, s] < k]
            if not ch:
                continue
            V = np.stack([svecs[c][s] for s in ch]).astype(np.float64)
            V /= np.linalg.norm(V, axis=1, keepdims=True) + 1e-8
            sim = V @ cent.T  # (n_ch, k)
            rows, cols = linear_sum_assignment(-sim)
            for r, cl in zip(rows, cols):
                if labels[c, ch[r]] != cl:
                    changed += 1
                labels[c, ch[r]] = cl
        if changed == 0:
            break
    return labels


def main():
    fe = FrontendConfig(sample_rate=RATE, n_mels=23)
    model = EENDVCModel(
        n_speakers=3, d_model=256, n_layers=4, n_heads=4, d_ff=1024,
        frontend=fe, dtype=jnp.bfloat16,
    )
    mgr = CheckpointManager(os.path.join(WORK, "eend_vc"))
    state = mgr.restore(None)
    params = state["params"] if isinstance(state, dict) else state.params
    if "params" not in params:
        params = {"params": params}

    @jax.jit
    def predict(a, m):
        logits, vecs = model.apply(params, a, frame_mask=m, deterministic=True)
        return jax.nn.sigmoid(logits) * m[..., None], vecs

    data_dir = os.path.join(WORK, "test", "data")
    kd = KaldiData(data_dir)
    ref_turns = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
    fs = fe.frame_shift * fe.subsampling / fe.sample_rate
    recs = sorted(kd.wavs)[: int(os.environ.get("NREC", "40"))]
    thr = float(os.environ.get("DECODE_THR", "0.9"))

    chunk_cache = {}

    def get_chunks(rec):
        if rec in chunk_cache:
            return chunk_cache[rec]
        audio, rate = kd.load_wav(rec)
        assert rate == RATE
        ss, shift = fe.subsampling, fe.frame_shift
        chunk_samples = fe.chunk_samples(CHUNK)
        n_sub = max(len(audio) // (ss * shift), 1)
        n_chunks = (n_sub + CHUNK - 1) // CHUNK
        need = n_chunks * chunk_samples
        audio_p = np.pad(audio.astype(np.float32), (0, max(0, need - len(audio))))
        actis, svecs, starts = [], [], []
        for ci in range(n_chunks):
            s = ci * chunk_samples
            a = audio_p[s : s + chunk_samples][None]
            valid = min(CHUNK, n_sub - ci * CHUNK)
            m = np.zeros((1, CHUNK), np.float32)
            m[0, :valid] = 1.0
            p, v = predict(jnp.asarray(a), jnp.asarray(m))
            actis.append(np.asarray(p)[0, :valid])
            svecs.append(np.asarray(v)[0])
            starts.append(ci * CHUNK)
        chunk_cache[rec] = (actis, svecs, starts, n_sub)
        return chunk_cache[rec]

    variants = ["base", "norm", "refine", "norm_refine"]
    for name in variants:
        all_turns = []
        for rec in recs:
            actis, svecs, starts, n_sub = get_chunks(rec)
            actis = [a.copy() for a in actis]
            use_svecs = svecs
            if name.startswith("norm"):
                use_svecs = [v / (np.linalg.norm(v, axis=1, keepdims=True) + 1e-8) for v in svecs]
            labels, k = cluster_chunk_vectors(
                actis, use_svecs, n_clusters=3, sil_spk_th=0.2
            )
            if name.endswith("refine"):
                labels = refine_labels(actis, use_svecs, labels, max(k, 1))
            p = stitch(actis, labels, max(k, 1), starts, n_sub)
            all_turns += probs_to_turns(p, rec, fs, threshold=thr, median=11)
        hyp = os.path.join(WORK, f"debug2_vc_{name}.rttm")
        write_rttm(hyp, all_turns)
        res = score_der({r: ref_turns[r] for r in recs}, hyp, collar=0.25)
        print(
            f"{name:12s} DER {res.der*100:6.2f}  MS {res.miss_rate*100:5.2f} "
            f"FA {res.falarm_rate*100:5.2f}  SC {res.confusion_rate*100:5.2f}", flush=True,
        )


if __name__ == "__main__":
    main()
