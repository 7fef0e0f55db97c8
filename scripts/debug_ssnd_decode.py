"""SSND decode variants on the trained round-4 checkpoint (CPU).

Sweeps the online-inference protocol knobs (active/new-speaker
thresholds, two-pass rescore) that the round-4 retrain exposed as the
remaining failure surface (FA 140% at the default knobs).
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
from speaker_diarization_tpu.infer.ssnd_online import ssnd_offline_rescore, ssnd_online_infer
from speaker_diarization_tpu.models.ssnd import SSNDConfig, SSNDModel
from speaker_diarization_tpu.postproc import probs_to_turns
from speaker_diarization_tpu.score.der import score_der
from speaker_diarization_tpu.train.checkpoints import CheckpointManager

WORK = os.environ.get("WORK", "exp/hermetic_tsvad")
RATE = 8000


def main():
    mgr = CheckpointManager(os.path.join(WORK, "ssnd"))
    state = mgr.restore(None)
    params = state["params"] if isinstance(state, dict) else state.params
    mutable = state.get("mutable") if isinstance(state, dict) else state.mutable
    n_all = int(np.asarray(params["E_all"]).shape[0])
    cfg = SSNDConfig(sample_rate=RATE, extractor_blocks=(4, 8, 4), n_all_speakers=n_all)
    model = SSNDModel(cfg=cfg)

    @jax.jit
    def predict(a, aux):
        return model.apply({"params": params, **(mutable or {})}, a, aux, False)

    e_pse = np.asarray(params["e_pse"])[0]
    e_non = np.asarray(params["e_non"])[0]
    block_samples = int(cfg.vad_out_len / 25 * RATE)

    data_dir = os.path.join(WORK, "test", "data")
    kd = KaldiData(data_dir)
    ref = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
    recs = sorted(kd.wavs)[: int(os.environ.get("NREC", "8"))]

    variants = {
        "online_0.3_0.5": (ssnd_online_infer, 0.3, 0.5),
        "online_0.5_0.7": (ssnd_online_infer, 0.5, 0.7),
        "rescore_0.3_0.5": (ssnd_offline_rescore, 0.3, 0.5),
        "rescore_0.5_0.7": (ssnd_offline_rescore, 0.5, 0.7),
    }
    for name, (fn, act, new) in variants.items():
        probs = {}
        for rec in recs:
            audio, r = kd.load_wav(rec)
            assert r == RATE
            if audio.ndim > 1:
                audio = audio[:, 0]
            probs[rec] = fn(
                lambda a, x: predict(jnp.asarray(a), jnp.asarray(x)), audio,
                block_samples, cfg.vad_out_len, cfg.max_speakers, e_pse, e_non,
                active_threshold=act, new_speaker_threshold=new,
            )
        best = None
        for thr in (0.5, 0.7, 0.9):
            turns = []
            for rec in recs:
                turns += probs_to_turns(probs[rec], rec, 1.0 / 25, threshold=thr, median=11)
            hyp = os.path.join(WORK, f"debug_ssnd_{name}.rttm")
            write_rttm(hyp, turns)
            res = score_der({r: ref[r] for r in recs}, hyp, collar=0.25)
            if best is None or res.der < best[1].der:
                best = (thr, res)
        thr, res = best
        print(
            f"{name:18s} thr={thr:.1f} DER {res.der*100:6.2f}  MS {res.miss_rate*100:5.2f} "
            f"FA {res.falarm_rate*100:6.2f}  SC {res.confusion_rate*100:5.2f}", flush=True,
        )


if __name__ == "__main__":
    main()
