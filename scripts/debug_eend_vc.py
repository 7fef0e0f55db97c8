"""Diagnose the round-3 EEND-VC leaderboard failure (DER 51.5%, FA 30%).

Decodes held-out hermetic-corpus recordings from the round-3 checkpoint
three ways to separate model quality from stitching quality (VERDICT r3
next-round #1b):
  a) current path (AHC, threshold clustering);
  b) AHC with the oracle cluster count (3);
  c) oracle stitching — chunk channel → reference speaker by per-chunk
     overlap with the reference labels (upper bound given the chunk probs).
Scores each with the md-eval-parity scorer.

Run on CPU: JAX_PLATFORMS=cpu python scripts/debug_eend_vc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
if os.environ.get("SDT_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.cli.main import _frontend_from_cfg  # noqa
from speaker_diarization_tpu.data.kaldi_io import KaldiData
from speaker_diarization_tpu.data.rttm import read_rttm_by_rec
from speaker_diarization_tpu.infer.eend_vc import (
    cluster_chunk_vectors,
    eend_vc_infer_recording,
    stitch,
)
from speaker_diarization_tpu.models.eend_vc import EENDVCModel
from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.data.rttm import frames_from_turns
from speaker_diarization_tpu.postproc import probs_to_turns
from speaker_diarization_tpu.data.rttm import write_rttm
from speaker_diarization_tpu.score.der import score_der
from speaker_diarization_tpu.train.checkpoints import CheckpointManager

WORK = os.environ.get("WORK", "exp/hermetic_tsvad")
RATE = 8000
CHUNK = 200


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

    recs = sorted(kd.wavs)[: int(os.environ.get("NREC", "10"))]

    variants = {
        "current(thr=1.0)": dict(mode="ahc", n_clusters=None, dist_threshold=1.0),
        "ahc_oracle_k3": dict(mode="ahc", n_clusters=3),
        "sil0.2_k3": dict(mode="ahc", n_clusters=3, sil_spk_th=0.2),
        "thr=0.8": dict(mode="ahc", n_clusters=None, dist_threshold=0.8),
        "oracle_stitch": dict(mode="oracle"),
    }
    results = {}
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

    for name, v in variants.items():
        all_turns = []
        ks = []
        for rec in recs:
            actis, svecs, starts, n_sub = get_chunks(rec)
            actis = [a.copy() for a in actis]
            speakers = sorted({t.speaker for t in ref_turns[rec]})
            if v["mode"] == "oracle":
                # oracle chunk-permutation: channel -> ref speaker with max
                # frame-overlap inside the chunk (greedy per chunk)
                n_spk = len(speakers)
                labels = np.full((len(actis), actis[0].shape[1]), n_spk, np.int32)
                for ci, (a, st) in enumerate(zip(actis, starts)):
                    ref = frames_from_turns(
                        ref_turns[rec], speakers, fs, a.shape[0], st * fs
                    )  # (T, n_spk)
                    ov = (a > 0.5).astype(np.float32).T @ ref  # (S, n_spk)
                    for _ in range(min(a.shape[1], n_spk)):
                        s, r = np.unravel_index(np.argmax(ov), ov.shape)
                        if ov[s, r] <= 0:
                            break
                        labels[ci, s] = r
                        ov[s, :] = -1
                        ov[:, r] = -1
                p = stitch(actis, labels, n_spk, starts, n_sub)
                ks.append(n_spk)
            else:
                labels, k = cluster_chunk_vectors(
                    actis, svecs, v.get("n_clusters"), v.get("sil_spk_th", 0.05),
                    v.get("dist_threshold", 1.0)
                )
                p = stitch(actis, labels, max(k, 1), starts, n_sub)
                ks.append(k)
            all_turns += probs_to_turns(
                p, rec, fs, threshold=float(os.environ.get("DECODE_THR", "0.5")), median=11
            )
        hyp = os.path.join(WORK, f"debug_vc_{name.replace('/', '_')}.rttm")
        write_rttm(hyp, all_turns)
        ref_sub = {rec: ref_turns[rec] for rec in recs}
        best = None
        for thr in [0.3, 0.4, 0.5, 0.6, 0.7]:
            turns2 = []
            for rec in recs:
                actis, svecs, starts, n_sub = chunk_cache[rec]
                pass
            # threshold sweep over the cached stitched probs is cheap but we
            # already rendered at 0.5; just score that
            break
        res = score_der(ref_sub, hyp, collar=0.25)
        results[name] = (res, float(np.mean(ks)))
        print(
            f"{name:22s} DER {res.der*100:6.2f}  MS {res.miss_rate*100:5.2f} "
            f"FA {res.falarm_rate*100:5.2f}  SC {res.confusion_rate*100:5.2f}  mean_k {np.mean(ks):.1f}"
        )


if __name__ == "__main__":
    main()
