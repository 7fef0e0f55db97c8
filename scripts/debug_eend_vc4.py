"""Round-5 EEND-VC two-tier clustering experiment (cache-driven, fast).

base = sil0.2 + oracle-k AHC (16.79% / SC 4.27 on the full test set).
two_tier(lo, hi): channels with mean activity > hi are "confident" and
drive the constrained AHC; channels in (lo, hi] are "weak" — excluded
from AHC (their vectors are noisy) but NOT silenced: they are assigned
per chunk to the remaining clusters by cosine to cluster centroids
(Hungarian, distinctness preserved). Channels <= lo stay silent.

Run: SDT_CPU=1 python scripts/debug_eend_vc4.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORK = os.environ.get("WORK", "exp/hermetic_tsvad")
RATE = 8000
CHUNK = 200
CACHE = os.path.join(WORK, "vc_chunk_cache.npz")


def two_tier_labels(actis, svecs, k=3, lo=0.2, hi=0.4):
    from scipy.optimize import linear_sum_assignment

    from speaker_diarization_tpu.infer.eend_vc import constrained_ahc

    n_chunks = len(actis)
    S = actis[0].shape[1]
    mean_acti = np.array([a.mean(axis=0) for a in actis])  # (n_chunks, S)

    conf_idx, conf_vecs = [], []
    for c in range(n_chunks):
        for s in range(S):
            if mean_acti[c, s] > hi:
                conf_idx.append((c, s))
                conf_vecs.append(svecs[c][s])
    if len(conf_vecs) < k:
        # fall back to one-tier
        lo_idx = [(c, s) for c in range(n_chunks) for s in range(S) if mean_acti[c, s] > lo]
        conf_idx = lo_idx
        conf_vecs = [svecs[c][s] for c, s in lo_idx]
    pos = {cs: i for i, cs in enumerate(conf_idx)}
    cls = []
    for c in range(n_chunks):
        act = [s for s in range(S) if (c, s) in pos]
        for i in range(len(act)):
            for j in range(i + 1, len(act)):
                cls.append((pos[(c, act[i])], pos[(c, act[j])]))
    lab_flat = constrained_ahc(np.stack(conf_vecs), cls, n_clusters=min(k, len(conf_vecs)))
    kk = int(lab_flat.max()) + 1

    labels = np.full((n_chunks, S), kk, np.int32)
    for (c, s), l in zip(conf_idx, lab_flat):
        labels[c, s] = l

    # centroids from confident members
    D = svecs[0].shape[1]
    cent = np.zeros((kk, D), np.float64)
    cnt = np.zeros(kk)
    for (c, s), l in zip(conf_idx, lab_flat):
        cent[l] += svecs[c][s]
        cnt[l] += 1
    cent /= np.maximum(cnt[:, None], 1)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True) + 1e-8

    # weak channels: per-chunk Hungarian to clusters not already used
    for c in range(n_chunks):
        weak = [s for s in range(S) if lo < mean_acti[c, s] <= hi and labels[c, s] == kk]
        if not weak:
            continue
        used = {labels[c, s] for s in range(S) if labels[c, s] < kk}
        free = [l for l in range(kk) if l not in used]
        if not free:
            continue
        V = np.stack([svecs[c][s] for s in weak]).astype(np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True) + 1e-8
        sim = V @ cent[free].T  # (n_weak, n_free)
        rows, cols = linear_sum_assignment(-sim)
        for r, f in zip(rows, cols):
            labels[c, weak[r]] = free[f]
    return labels, kk


def main():
    from speaker_diarization_tpu.data.rttm import read_rttm_by_rec, write_rttm
    from speaker_diarization_tpu.infer.eend_vc import cluster_chunk_vectors, stitch
    from speaker_diarization_tpu.models.eend import FrontendConfig
    from speaker_diarization_tpu.postproc import probs_to_turns
    from speaker_diarization_tpu.score.der import score_der

    z = np.load(CACHE)
    recs = sorted({kk.split("__")[0] for kk in z.files})
    fe = FrontendConfig(sample_rate=RATE, n_mels=23)
    fs = fe.frame_shift * fe.subsampling / fe.sample_rate
    ref_turns = read_rttm_by_rec(os.path.join(WORK, "test", "data", "rttm"))
    thr = float(os.environ.get("DECODE_THR", "0.9"))

    def chunks_of(rec):
        actis = [a.copy() for a in z[f"{rec}__acti"]]
        n_sub = int(z[f"{rec}__nsub"])
        lens = [min(CHUNK, n_sub - i * CHUNK) for i in range(len(actis))]
        actis = [a[:l] for a, l in zip(actis, lens)]
        svecs = list(z[f"{rec}__svec"])
        return actis, svecs, [i * CHUNK for i in range(len(actis))], n_sub

    def run(name, label_fn):
        all_turns = []
        for rec in recs:
            actis, svecs, starts, n_sub = chunks_of(rec)
            labels, kk = label_fn(actis, svecs)
            p = stitch(actis, labels, max(kk, 1), starts, n_sub)
            all_turns += probs_to_turns(p, rec, fs, threshold=thr, median=11)
        hyp = os.path.join(WORK, "debug4_vc.rttm")
        write_rttm(hyp, all_turns)
        res = score_der({r: ref_turns[r] for r in recs}, hyp, collar=0.25)
        print(
            f"{name:22s} DER {res.der*100:6.2f}  MS {res.miss_rate*100:5.2f} "
            f"FA {res.falarm_rate*100:5.2f}  SC {res.confusion_rate*100:5.2f}", flush=True,
        )

    run("base(sil0.2,k3)", lambda a, v: cluster_chunk_vectors(a, v, n_clusters=3, sil_spk_th=0.2))
    for lo, hi in ((0.2, 0.3), (0.2, 0.4), (0.2, 0.5), (0.1, 0.4), (0.15, 0.5)):
        run(f"two_tier(lo{lo},hi{hi})", lambda a, v, lo=lo, hi=hi: two_tier_labels(a, v, 3, lo, hi))


if __name__ == "__main__":
    main()
