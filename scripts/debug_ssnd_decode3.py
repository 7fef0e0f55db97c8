"""Round-5 SSND decode tuning on the retrained (dual-source) checkpoint.

The working rescore decode lands 24.93% with SC ~15 dominating. Sweeps
the discovery thresholds (active, new) and tests a memory-merge variant:
after pass 1, memory entries whose embeddings' cosine exceeds a merge
threshold are pooled (count-weighted) before the pass-2 re-decode — the
SC failure mode is one true speaker split across two discovered slots.

Run: SDT_CPU=1 NREC=12 python scripts/debug_ssnd_decode3.py
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


def rescore_with_merge(pf, audio, block_samples, vad_out_len, S, e_pse, e_non,
                       act, new, merge_cos=None):
    _, memory = ssnd_online_infer(
        pf, audio, block_samples, vad_out_len, S, e_pse, e_non,
        active_threshold=act, new_speaker_threshold=new, return_memory=True,
    )
    embs = [e.copy() for e in memory.embeddings]
    cnts = list(memory.counts)
    if merge_cos is not None and len(embs) > 1:
        # greedy count-weighted agglomeration of near-duplicate speakers
        merged = True
        while merged and len(embs) > 1:
            merged = False
            E = np.stack(embs)
            En = E / (np.linalg.norm(E, axis=1, keepdims=True) + 1e-8)
            sim = En @ En.T
            np.fill_diagonal(sim, -1)
            i, j = np.unravel_index(np.argmax(sim), sim.shape)
            if sim[i, j] > merge_cos:
                wi, wj = cnts[i], cnts[j]
                embs[i] = (embs[i] * wi + embs[j] * wj) / (wi + wj)
                cnts[i] = wi + wj
                del embs[j], cnts[j]
                merged = True
    n_spk = len(embs)
    n_blocks = int(np.ceil(len(audio) / block_samples))
    if n_spk == 0:
        return np.zeros((n_blocks * vad_out_len, 1), np.float32)
    aux = np.tile(e_non[None], (S, 1)).astype(np.float32)
    for i in range(min(n_spk, S)):
        aux[i] = embs[i]
    padded = np.pad(audio.astype(np.float32), (0, n_blocks * block_samples - len(audio)))
    outs = []
    for bi in range(n_blocks):
        block = padded[bi * block_samples : (bi + 1) * block_samples][None]
        vad, _ = pf(block, aux[None])
        vad = 1 / (1 + np.exp(-np.asarray(vad)[0]))
        outs.append(vad[: min(n_spk, S)].T)
    return np.concatenate(outs, axis=0)


def main():
    exp = os.environ.get("SSND_EXP", os.path.join(WORK, "ssnd_r5"))
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
    e_pse = np.asarray(params["e_pse"])[0]
    e_non = np.asarray(params["e_non"])[0]
    block_samples = int(cfg.vad_out_len / 25 * RATE)

    kd = KaldiData(os.path.join(WORK, "test", "data"))
    ref = read_rttm_by_rec(os.path.join(WORK, "test", "data", "rttm"))
    recs = sorted(kd.wavs)[: int(os.environ.get("NREC", "12"))]
    audios = {}
    for rec in recs:
        a, r = kd.load_wav(rec)
        assert r == RATE
        audios[rec] = a[:, 0] if a.ndim > 1 else a

    variants = []
    for act, new in ((0.3, 0.5), (0.2, 0.4), (0.4, 0.6), (0.3, 0.7)):
        variants.append((f"resc_a{act}_n{new}", act, new, None))
    for mc in (0.5, 0.7, 0.85):
        variants.append((f"resc_a0.3_n0.5_m{mc}", 0.3, 0.5, mc))

    for name, act, new, mc in variants:
        probs = {
            rec: rescore_with_merge(
                pf, audios[rec], block_samples, cfg.vad_out_len, cfg.max_speakers,
                e_pse, e_non, act, new, mc,
            )
            for rec in recs
        }
        best = None
        for thr in (0.5, 0.55, 0.6, 0.65, 0.7):
            turns = []
            for rec in recs:
                turns += probs_to_turns(probs[rec], rec, 1.0 / 25, threshold=thr, median=11)
            hyp = os.path.join(WORK, "debug3_ssnd.rttm")
            write_rttm(hyp, turns)
            res = score_der({r: ref[r] for r in recs}, hyp, collar=0.25)
            if best is None or res.der < best[1].der:
                best = (thr, res)
        thr, res = best
        print(
            f"{name:22s} thr={thr:.2f} DER {res.der*100:6.2f}  MS {res.miss_rate*100:5.2f} "
            f"FA {res.falarm_rate*100:6.2f}  SC {res.confusion_rate*100:5.2f}", flush=True,
        )


if __name__ == "__main__":
    main()
