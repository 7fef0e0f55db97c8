"""Round-5 EEND-VC per-recording diagnosis + clustering variants.

Caches chunk predictions (actis/svecs) to disk so clustering-only
experiments iterate in seconds. Prints per-recording DER for the shipped
decode and scores several clustering variants.

Run: SDT_CPU=1 python scripts/debug_eend_vc3.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORK = os.environ.get("WORK", "exp/hermetic_tsvad")
RATE = 8000
CHUNK = 200
CACHE = os.path.join(WORK, "vc_chunk_cache.npz")


def compute_cache():
    import jax

    if os.environ.get("SDT_CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from speaker_diarization_tpu.data.kaldi_io import KaldiData
    from speaker_diarization_tpu.models.eend import FrontendConfig
    from speaker_diarization_tpu.models.eend_vc import EENDVCModel
    from speaker_diarization_tpu.train.checkpoints import CheckpointManager

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

    kd = KaldiData(os.path.join(WORK, "test", "data"))
    out = {}
    for rec in sorted(kd.wavs):
        audio, rate = kd.load_wav(rec)
        assert rate == RATE
        ss, shift = fe.subsampling, fe.frame_shift
        chunk_samples = fe.chunk_samples(CHUNK)
        n_sub = max(len(audio) // (ss * shift), 1)
        n_chunks = (n_sub + CHUNK - 1) // CHUNK
        need = n_chunks * chunk_samples
        audio_p = np.pad(audio.astype(np.float32), (0, max(0, need - len(audio))))
        actis, svecs = [], []
        for ci in range(n_chunks):
            s = ci * chunk_samples
            a = audio_p[s : s + chunk_samples][None]
            valid = min(CHUNK, n_sub - ci * CHUNK)
            m = np.zeros((1, CHUNK), np.float32)
            m[0, :valid] = 1.0
            p, v = predict(jnp.asarray(a), jnp.asarray(m))
            ap = np.zeros((CHUNK, p.shape[-1]), np.float32)
            ap[:valid] = np.asarray(p)[0, :valid]
            actis.append(ap)
            svecs.append(np.asarray(v)[0])
        out[f"{rec}__acti"] = np.stack(actis)  # (n_chunks, CHUNK, S)
        out[f"{rec}__svec"] = np.stack(svecs)  # (n_chunks, S, D)
        out[f"{rec}__nsub"] = np.array(n_sub)
        print("cached", rec, flush=True)
    np.savez(CACHE, **out)


def main():
    if not os.path.exists(CACHE):
        compute_cache()
    z = np.load(CACHE)
    recs = sorted({k.split("__")[0] for k in z.files})

    from speaker_diarization_tpu.data.rttm import read_rttm_by_rec, write_rttm
    from speaker_diarization_tpu.infer.eend_vc import cluster_chunk_vectors, stitch
    from speaker_diarization_tpu.models.eend import FrontendConfig
    from speaker_diarization_tpu.postproc import probs_to_turns
    from speaker_diarization_tpu.score.der import score_der

    fe = FrontendConfig(sample_rate=RATE, n_mels=23)
    fs = fe.frame_shift * fe.subsampling / fe.sample_rate
    ref_turns = read_rttm_by_rec(os.path.join(WORK, "test", "data", "rttm"))
    thr = float(os.environ.get("DECODE_THR", "0.9"))

    def decode(rec, **kw):
        actis = [a.copy() for a in z[f"{rec}__acti"]]
        # trim: last chunk may be padded
        n_sub = int(z[f"{rec}__nsub"])
        lens = [min(CHUNK, n_sub - i * CHUNK) for i in range(len(actis))]
        actis = [a[:l] for a, l in zip(actis, lens)]
        svecs = list(z[f"{rec}__svec"])
        labels, k = cluster_chunk_vectors(actis, svecs, **kw)
        starts = [i * CHUNK for i in range(len(actis))]
        return stitch(actis, labels, max(k, 1), starts, n_sub)

    # per-recording DER for the shipped decode
    print("== per-rec DER (base: sil0.2, k=3) ==")
    per = []
    for rec in recs:
        p = decode(rec, n_clusters=3, sil_spk_th=0.2)
        turns = probs_to_turns(p, rec, fs, threshold=thr, median=11)
        hyp = os.path.join(WORK, "debug3_tmp.rttm")
        write_rttm(hyp, turns)
        res = score_der({rec: ref_turns[rec]}, hyp, collar=0.25)
        per.append((res.der, res.confusion_rate, rec))
    per.sort(reverse=True)
    for der, sc, rec in per[:10]:
        print(f"  {rec}  DER {der*100:6.2f}  SC {sc*100:6.2f}")
    print(f"  median DER {np.median([d for d,_,_ in per])*100:.2f}")

    # variants
    variants = {
        "base(sil0.2,k3)": dict(n_clusters=3, sil_spk_th=0.2),
        "sil0.1": dict(n_clusters=3, sil_spk_th=0.1),
        "sil0.3": dict(n_clusters=3, sil_spk_th=0.3),
        "sil0.4": dict(n_clusters=3, sil_spk_th=0.4),
    }
    for name, kw in variants.items():
        all_turns = []
        for rec in recs:
            p = decode(rec, **kw)
            all_turns += probs_to_turns(p, rec, fs, threshold=thr, median=11)
        hyp = os.path.join(WORK, f"debug3_vc.rttm")
        write_rttm(hyp, all_turns)
        res = score_der({r: ref_turns[r] for r in recs}, hyp, collar=0.25)
        print(
            f"{name:16s} DER {res.der*100:6.2f}  MS {res.miss_rate*100:5.2f} "
            f"FA {res.falarm_rate*100:5.2f}  SC {res.confusion_rate*100:5.2f}", flush=True,
        )


if __name__ == "__main__":
    main()
