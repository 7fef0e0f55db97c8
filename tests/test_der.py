"""DER scorer tests: golden parity with SCTK md-eval.pl.

Fixtures in tests/fixtures/ were scored once with the reference
`SCTK-2.4.12/src/md-eval/md-eval.pl` (the exact Perl scorer every reference
recipe calls); its DER/MS/FA/SC outputs are frozen in mdeval_golden.json.
The fixture set includes overlapping same-speaker turns, a recording missing
from the hypothesis, heavy overlap, and a near-perfect system.
"""

import json
import os

import numpy as np
import pytest

from speaker_diarization_tpu.data.rttm import Turn, read_rttm_by_rec, turns_from_frames, frames_from_turns, write_rttm
from speaker_diarization_tpu.score import score_der
from speaker_diarization_tpu.score.der import score_file

pytestmark = pytest.mark.quick

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


class TestMdEvalGoldenParity:
    @pytest.mark.parametrize("collar", ["0.0", "0.25", "0.5"])
    def test_matches_golden(self, collar):
        with open(os.path.join(FIX, "mdeval_golden.json")) as f:
            golden = json.load(f)[collar]
        res = score_der(
            os.path.join(FIX, "ref.rttm"), os.path.join(FIX, "hyp.rttm"), collar=float(collar)
        )
        assert abs(100 * res.der - golden["der"]) < 0.015
        assert abs(100 * res.miss_rate - golden["ms"]) < 0.015
        assert abs(100 * res.falarm_rate - golden["fa"]) < 0.015
        assert abs(100 * res.confusion_rate - golden["sc"]) < 0.015


class TestScoreFileBasics:
    def test_perfect_zero(self):
        ref = [Turn("r", 0, 5, "A"), Turn("r", 10, 5, "B"), Turn("r", 12, 2, "A")]
        hyp = [Turn("r", 0, 5, "x"), Turn("r", 10, 5, "y"), Turn("r", 12, 2, "x")]
        res, m = score_file(ref, hyp, collar=0.0)
        assert res.der == pytest.approx(0.0, abs=1e-9)
        assert m == {"A": "x", "B": "y"}

    def test_pure_miss(self):
        ref = [Turn("r", 0, 10, "A")]
        res, _ = score_file(ref, [], collar=0.0)
        assert res.der == pytest.approx(1.0)
        assert res.missed_speaker_time == pytest.approx(10.0)

    def test_fa_outside_speech_counts(self):
        # hyp speaks during ref silence inside the UEM
        ref = [Turn("r", 0, 2, "A"), Turn("r", 8, 2, "A")]
        hyp = [Turn("r", 0, 2, "x"), Turn("r", 4, 1, "x"), Turn("r", 8, 2, "x")]
        res, _ = score_file(ref, hyp, collar=0.0)
        assert res.falarm_speaker_time == pytest.approx(1.0)
        assert res.missed_speaker_time == pytest.approx(0.0)
        assert res.der == pytest.approx(0.25)

    def test_confusion(self):
        ref = [Turn("r", 0, 10, "A"), Turn("r", 10, 10, "B")]
        # system uses one label throughout: second half is speaker confusion
        hyp = [Turn("r", 0, 20, "x")]
        res, m = score_file(ref, hyp, collar=0.0)
        assert m == {"A": "x"}
        assert res.speaker_error_time == pytest.approx(10.0)
        assert res.der == pytest.approx(0.5)

    def test_collar_removes_boundary_errors(self):
        ref = [Turn("r", 0, 10, "A")]
        hyp = [Turn("r", 0.2, 9.6, "x")]  # 0.2 late on, 0.2 early off
        res, _ = score_file(ref, hyp, collar=0.25)
        assert res.der == pytest.approx(0.0, abs=1e-9)
        res0, _ = score_file(ref, hyp, collar=0.0)
        assert res0.missed_speaker_time == pytest.approx(0.4)

    def test_overlap_limit_flag(self):
        # A and B overlap on [4,6]; -1 mode excludes that region
        ref = [Turn("r", 0, 6, "A"), Turn("r", 4, 6, "B")]
        hyp = [Turn("r", 0, 6, "x"), Turn("r", 4, 6, "y")]
        res, _ = score_file(ref, hyp, collar=0.0, overlap_limit=True)
        assert res.scored_speaker_time == pytest.approx(8.0)  # 10s total − 2s overlap ×2spk... 4+4
        assert res.der == pytest.approx(0.0, abs=1e-9)

    def test_uem_restriction(self):
        ref = [Turn("r", 0, 10, "A")]
        hyp = [Turn("r", 0, 5, "x")]
        res, _ = score_file(ref, hyp, collar=0.0, uem=[(0.0, 5.0)])
        assert res.der == pytest.approx(0.0, abs=1e-9)


class TestRttmRoundtrip:
    def test_frames_turns_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        act = (rng.random((200, 3)) < 0.2).astype(np.int32)
        turns = turns_from_frames(act, "rec", ["s0", "s1", "s2"], 0.04)
        back = frames_from_turns(turns, ["s0", "s1", "s2"], 0.04, 200)
        np.testing.assert_array_equal(act, back)
        p = tmp_path / "x.rttm"
        write_rttm(p, turns)
        by_rec = read_rttm_by_rec(p)
        assert sorted(by_rec) == ["rec"]
        t2 = sorted(by_rec["rec"], key=lambda t: (t.start, t.speaker))
        t1 = sorted(turns, key=lambda t: (t.start, t.speaker))
        assert len(t1) == len(t2)
        for a, b in zip(t1, t2):
            assert a.speaker == b.speaker
            assert a.start == pytest.approx(b.start, abs=1e-3)
            assert a.dur == pytest.approx(b.dur, abs=1e-3)


@pytest.mark.skipif(
    not os.path.exists("/root/reference/SCTK-2.4.12/src/md-eval/md-eval.pl"),
    reason="reference md-eval.pl not mounted",
)
class TestLiveMdEval:
    def test_random_cases_match_live(self, tmp_path):
        import subprocess

        rng = np.random.default_rng(123)
        turns_r, turns_h = [], []
        for rec in ["a", "b"]:
            for _ in range(30):
                turns_r.append(Turn(rec, round(float(rng.uniform(0, 60)), 2), round(float(rng.uniform(0.2, 4)), 2), f"R{rng.integers(3)}"))
                turns_h.append(Turn(rec, round(float(rng.uniform(0, 60)), 2), round(float(rng.uniform(0.2, 4)), 2), f"H{rng.integers(4)}"))
        rp, hp = tmp_path / "r.rttm", tmp_path / "h.rttm"
        write_rttm(rp, turns_r)
        write_rttm(hp, turns_h)
        for collar in (0.0, 0.25):
            res = score_der(str(rp), str(hp), collar=collar)
            out = subprocess.check_output(
                ["perl", "/root/reference/SCTK-2.4.12/src/md-eval/md-eval.pl", "-c", str(collar), "-r", str(rp), "-s", str(hp)],
                stderr=subprocess.DEVNULL,
            ).decode()
            der, ms, fa, sc = [float(x) for x in out.strip().splitlines()[-1].split("/")]
            assert abs(100 * res.der - der) < 0.015
            assert abs(100 * res.miss_rate - ms) < 0.015
            assert abs(100 * res.falarm_rate - fa) < 0.015
            assert abs(100 * res.confusion_rate - sc) < 0.015


class TestRegionRestrictedScoring:
    """spyder-style overlap-only / single-only DER (run_ts_vad2.sh:249-261)."""

    REF = [Turn("r", 0, 10, "A"), Turn("r", 5, 10, "B")]  # overlap in [5,10]

    def test_decomposition(self):
        # hyp misses the overlap entirely: exactly one speaker active at a
        # time, correct in both single-speaker regions
        hyp = [Turn("r", 0, 10, "x"), Turn("r", 10, 5, "y")]
        allr, _ = score_file(self.REF, hyp, collar=0.0, regions="all")
        single, _ = score_file(self.REF, hyp, collar=0.0, regions="single")
        over, _ = score_file(self.REF, hyp, collar=0.0, regions="overlap")
        # scored speaker time: all = single + overlap
        assert allr.scored_speaker_time == pytest.approx(
            single.scored_speaker_time + over.scored_speaker_time
        )
        assert over.scored_speaker_time == pytest.approx(10.0)  # 2 spk × 5 s
        # single regions are matched perfectly; all error lives in overlap
        assert single.der == pytest.approx(0.0, abs=1e-9)
        assert over.missed_speaker_time == pytest.approx(5.0)
        assert over.der == pytest.approx(0.5)

    def test_single_equals_overlap_limit(self):
        hyp = [Turn("r", 0, 8, "x"), Turn("r", 8, 7, "y")]
        a, _ = score_file(self.REF, hyp, collar=0.0, overlap_limit=True)
        b, _ = score_file(self.REF, hyp, collar=0.0, regions="single")
        assert a.der == pytest.approx(b.der)
        assert a.scored_speaker_time == pytest.approx(b.scored_speaker_time)

    def test_score_der_regions_plumbing(self, tmp_path):
        ref_p, hyp_p = str(tmp_path / "r.rttm"), str(tmp_path / "h.rttm")
        write_rttm(ref_p, self.REF)
        write_rttm(hyp_p, [Turn("r", 0, 15, "x")])
        res = score_der(ref_p, hyp_p, collar=0.0, regions="overlap")
        assert res.der == pytest.approx(0.5)
