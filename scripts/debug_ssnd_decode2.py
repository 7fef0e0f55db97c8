"""SSND round-5 decode triage: separate detection quality from the online
discovery protocol on the trained round-4 checkpoint (CPU).

Variants:
  oracle_enroll  aux = the true speakers' E_all rows (test voices come from
                 the same source pool as training, so every test speaker
                 has a training gid) — measures pure held-out detection
                 quality with in-distribution queries, no discovery at all.
  snap           online discovery, but each promoted memory embedding is
                 snapped to its nearest E_all row (cosine) — detection then
                 always sees in-distribution queries; near-duplicate rows
                 merge instead of promoting.
  raw            the round-4 online decode (raw rep-decoder running means).

Run: SDT_CPU=1 python scripts/debug_ssnd_decode2.py
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
from speaker_diarization_tpu.infer.ssnd_online import ssnd_online_infer
from speaker_diarization_tpu.models.ssnd import SSNDConfig, SSNDModel
from speaker_diarization_tpu.postproc import probs_to_turns
from speaker_diarization_tpu.score.der import score_der
from speaker_diarization_tpu.train.checkpoints import CheckpointManager

WORK = os.environ.get("WORK", "exp/hermetic_tsvad")
RATE = 8000


def main():
    exp = os.environ.get("SSND_EXP", os.path.join(WORK, "ssnd"))
    mgr = CheckpointManager(exp)
    state = mgr.restore(None)
    params = state["params"] if isinstance(state, dict) else state.params
    mutable = state.get("mutable") if isinstance(state, dict) else state.mutable
    n_all = int(np.asarray(params["E_all"]).shape[0])
    cfg = SSNDConfig(sample_rate=RATE, extractor_blocks=(4, 8, 4), n_all_speakers=n_all)
    model = SSNDModel(cfg=cfg)

    @jax.jit
    def predict(a, aux):
        return model.apply({"params": params, **(mutable or {})}, a, aux, False)

    pf = lambda a, x: predict(jnp.asarray(a), jnp.asarray(x))  # noqa: E731
    E_all = np.asarray(params["E_all"])
    e_pse = np.asarray(params["e_pse"])[0]
    e_non = np.asarray(params["e_non"])[0]
    block_samples = int(cfg.vad_out_len / 25 * RATE)

    # gid map: sorted speakers of the training source pool (SimuDiarMixer)
    src = KaldiData(os.path.join(WORK, "src"))
    speakers = sorted(src.spk2utt or {})
    spk_to_gid = {s: i for i, s in enumerate(speakers)}

    data_dir = os.path.join(WORK, "test", "data")
    kd = KaldiData(data_dir)
    ref = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
    recs = sorted(kd.wavs)[: int(os.environ.get("NREC", "8"))]

    def oracle_enroll(audio, rec_speakers):
        S = cfg.max_speakers
        aux = np.tile(e_non[None], (S, 1)).astype(np.float32)
        for i, s in enumerate(rec_speakers[:S]):
            aux[i] = E_all[spk_to_gid[s]]
        n_blocks = int(np.ceil(len(audio) / block_samples))
        audio = np.pad(audio.astype(np.float32), (0, n_blocks * block_samples - len(audio)))
        outs = []
        for bi in range(n_blocks):
            block = audio[bi * block_samples : (bi + 1) * block_samples][None]
            vad, _ = pf(block, aux[None])
            outs.append(1 / (1 + np.exp(-np.asarray(vad)[0][: len(rec_speakers)].T)))
        return np.concatenate(outs, axis=0)

    def snap_online(audio, act, new, merge_cos=0.6):
        """Online discovery with E_all-snapped memory + cosine dedup."""
        S = cfg.max_speakers
        n_blocks = int(np.ceil(len(audio) / block_samples))
        audio = np.pad(audio.astype(np.float32), (0, n_blocks * block_samples - len(audio)))
        mem_rows = []  # snapped E_all row indices
        outputs = []
        En = E_all / (np.linalg.norm(E_all, axis=1, keepdims=True) + 1e-8)
        for bi in range(n_blocks):
            block = audio[bi * block_samples : (bi + 1) * block_samples][None]
            aux = np.tile(e_non[None], (S, 1)).astype(np.float32)
            known = min(len(mem_rows), S - 1)
            for i in range(known):
                aux[i] = E_all[mem_rows[i]]
            pse = known
            aux[pse] = e_pse
            vad, emb = pf(block, aux[None])
            vad = 1 / (1 + np.exp(-np.asarray(vad)[0]))
            emb = np.asarray(emb)[0]
            promoted = None
            if vad[pse].mean() > new and len(mem_rows) < 16:
                e = emb[pse] / (np.linalg.norm(emb[pse]) + 1e-8)
                cos = En @ e
                row = int(np.argmax(cos))
                if row not in mem_rows:
                    mem_rows.append(row)
                    promoted = len(mem_rows) - 1
            frame = np.zeros((vad.shape[1], max(len(mem_rows), 1)), np.float32)
            for i in range(known):
                frame[:, i] = vad[i]
            if promoted is not None:
                frame[:, promoted] = vad[pse]
            outputs.append(frame)
        n_spk = max(len(mem_rows), 1)
        total = np.zeros((sum(o.shape[0] for o in outputs), n_spk), np.float32)
        pos = 0
        for o in outputs:
            total[pos : pos + o.shape[0], : o.shape[1]] = o
            pos += o.shape[0]
        return total

    variants = {
        "oracle_enroll": lambda audio, spks: oracle_enroll(audio, spks),
        "snap_0.4_0.6": lambda audio, spks: snap_online(audio, 0.4, 0.6),
        "snap_0.3_0.4": lambda audio, spks: snap_online(audio, 0.3, 0.4),
        "raw_0.3_0.5": lambda audio, spks: ssnd_online_infer(
            pf, audio, block_samples, cfg.vad_out_len, cfg.max_speakers,
            e_pse, e_non, active_threshold=0.3, new_speaker_threshold=0.5,
        ),
    }
    for name, fn in variants.items():
        probs = {}
        for rec in recs:
            audio, r = kd.load_wav(rec)
            assert r == RATE
            if audio.ndim > 1:
                audio = audio[:, 0]
            rec_speakers = sorted({t.speaker for t in ref[rec]})
            probs[rec] = fn(audio, rec_speakers)
        best = None
        for thr in (0.3, 0.5, 0.7, 0.9):
            turns = []
            for rec in recs:
                turns += probs_to_turns(probs[rec], rec, 1.0 / 25, threshold=thr, median=11)
            hyp = os.path.join(WORK, f"debug2_ssnd_{name}.rttm")
            write_rttm(hyp, turns)
            res = score_der({r: ref[r] for r in recs}, hyp, collar=0.25)
            if best is None or res.der < best[1].der:
                best = (thr, res)
        thr, res = best
        print(
            f"{name:16s} thr={thr:.1f} DER {res.der*100:6.2f}  MS {res.miss_rate*100:6.2f} "
            f"FA {res.falarm_rate*100:6.2f}  SC {res.confusion_rate*100:5.2f}", flush=True,
        )


if __name__ == "__main__":
    main()
