"""System-RTTM → TS-VAD target prep (reference system_rttm_to_generate_
target_speaker_wav_and_label_for_ts_vad.py + the run_ts_vad2_based_on_
system_sad.sh composition)."""

import json
import os

import numpy as np

from speaker_diarization_tpu.cli.main import main
from speaker_diarization_tpu.data.prep import (
    merge_intervals,
    prepare_targets_from_rttm,
    subtract_intervals,
)
from speaker_diarization_tpu.data.rttm import read_rttm_by_rec
from speaker_diarization_tpu.data.simulate import simulate_corpus
from speaker_diarization_tpu.data.wav import load_wav_maybe_piped


def _brute_subtract(a, b, grid=1e-3):
    lo = min(s for s, _ in a)
    hi = max(e for _, e in a)
    n = int((hi - lo) / grid) + 2
    t = lo + np.arange(n) * grid + grid / 2
    ina = np.zeros(n, bool)
    for s, e in a:
        ina |= (t >= s) & (t < e)
    for s, e in b:
        ina &= ~((t >= s) & (t < e))
    return ina, t


class TestIntervalOps:
    def test_subtract_matches_brute_force(self):
        rng = np.random.default_rng(0)
        for _ in range(50):
            a = sorted(rng.uniform(0, 10, size=(rng.integers(1, 5), 2)).tolist())
            a = [(min(x), max(x)) for x in a if abs(x[0] - x[1]) > 0.01]
            b = sorted(rng.uniform(0, 10, size=(rng.integers(0, 5), 2)).tolist())
            b = [(min(x), max(x)) for x in b if abs(x[0] - x[1]) > 0.01]
            if not a:
                continue
            res = subtract_intervals(merge_intervals(a), b)
            want, t = _brute_subtract(merge_intervals(a), b)
            got = np.zeros_like(want)
            for s, e in res:
                got |= (t >= s) & (t < e)
            assert (got == want).all()
            # result is sorted and non-overlapping
            for (s1, e1), (s2, e2) in zip(res, res[1:]):
                assert e1 <= s2
                assert s1 < e1

    def test_disjoint_b(self):
        assert subtract_intervals([(0.0, 4.0)], [(1.0, 2.0), (3.0, 3.5)]) == [
            (0.0, 1.0), (2.0, 3.0), (3.5, 4.0),
        ]


class TestPrepareTargets:
    def test_targets_are_overlap_free(self, tmp_path):
        data_dir = simulate_corpus(
            str(tmp_path / "corpus"), n_mixtures=2, n_speakers=2, rate=8000,
            seed=0, src_speakers=4, utts_per_speaker=3, with_noise=False,
        )
        out = str(tmp_path / "targets")
        rc = main([
            "prepare-targets", "--rttm", os.path.join(data_dir, "rttm"),
            "--data-dir", data_dir, "--out", out,
        ])
        assert rc == 0
        turns = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
        # wav.scp keys rec-spk; target length == overlap-free speech duration
        scp = dict(
            line.split(None, 1) for line in open(os.path.join(out, "wav.scp"))
        )
        assert scp
        for key, path in scp.items():
            rec, spk = key.rsplit("-", 1)
            own = merge_intervals(
                [(t.start, t.end) for t in turns[rec] if t.speaker == spk]
            )
            others = [
                (t.start, t.end) for t in turns[rec] if t.speaker != spk
            ]
            clean = subtract_intervals(own, others)
            want_s = sum(e - s for s, e in clean)
            audio, rate = load_wav_maybe_piped(path.strip())
            assert abs(len(audio) / rate - want_s) < 0.01
        # labels manifest: 25 Hz activity from the FULL intervals
        lines = [json.loads(l) for l in open(os.path.join(out, "labels.jsonl"))]
        assert {l["filename"] for l in lines} == set(turns)
        one = lines[0]
        labels = np.array(one["labels"])
        own = [
            (t.start, t.end)
            for t in turns[one["filename"]]
            if t.speaker == one["speaker_id"]
        ]
        active_s = sum(e - s for s, e in merge_intervals(own))
        # the reference labels each turn through int(e*25)+1 — up to one
        # extra frame per turn
        assert abs(labels.sum() / 25.0 - active_s) < 0.2 + len(own) / 25.0
