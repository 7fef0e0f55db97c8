"""Native C++ DER core: build, cross-check vs pure Python, RTTM validation."""

import json
import os

import numpy as np
import pytest

from speaker_diarization_tpu.data.rttm import Turn, write_rttm
from speaker_diarization_tpu.score import score_der
from speaker_diarization_tpu.score.der import score_file, score_file_native
from speaker_diarization_tpu.score.native_build import build, native_available, validate_rttm_file

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module", autouse=True)
def built():
    assert build() is not None, "g++ compile of der_core.cpp failed"
    assert native_available()


def _rand_turns(rec, spks, n, seed):
    r = np.random.default_rng(seed)
    return [
        Turn(rec, round(float(r.uniform(0, 100)), 2), round(float(r.uniform(0.3, 6)), 2), str(r.choice(spks)))
        for _ in range(n)
    ]


class TestNativeMatchesPython:
    @pytest.mark.parametrize("collar", [0.0, 0.25])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_cases(self, collar, seed):
        ref = _rand_turns("m", ["A", "B", "C"], 40, seed)
        hyp = _rand_turns("m", ["x", "y", "z", "w"], 45, seed + 100)
        rn, mn = score_file(ref, hyp, collar=collar, use_native=True)
        rp, mp = score_file(ref, hyp, collar=collar, use_native=False)
        for attr in ("scored_speaker_time", "missed_speaker_time", "falarm_speaker_time", "speaker_error_time"):
            assert abs(getattr(rn, attr) - getattr(rp, attr)) < 1e-6, attr
        assert mn == mp

    def test_overlap_limit_and_uem(self):
        ref = _rand_turns("m", ["A", "B"], 25, 7)
        hyp = _rand_turns("m", ["x", "y"], 25, 8)
        for kwargs in ({"overlap_limit": True}, {"uem": [(10.0, 60.0)]}):
            rn, _ = score_file(ref, hyp, collar=0.25, use_native=True, **kwargs)
            rp, _ = score_file(ref, hyp, collar=0.25, use_native=False, **kwargs)
            assert abs(rn.der - rp.der) < 1e-9

    def test_golden_parity_through_native(self):
        with open(os.path.join(FIX, "mdeval_golden.json")) as f:
            golden = json.load(f)["0.25"]
        res = score_der(os.path.join(FIX, "ref.rttm"), os.path.join(FIX, "hyp.rttm"), collar=0.25)
        assert abs(100 * res.der - golden["der"]) < 0.015

    def test_empty_cases(self):
        ref = [Turn("m", 0, 10, "A")]
        rn, _ = score_file(ref, [], use_native=True)
        assert rn.der == pytest.approx(1.0)
        rn2, _ = score_file([], [Turn("m", 0, 5, "x")], use_native=True)
        assert rn2.scored_speaker_time == 0


class TestRttmValidator:
    def test_valid_file(self, tmp_path):
        p = tmp_path / "ok.rttm"
        write_rttm(p, _rand_turns("m", ["A"], 5, 0))
        bad, _ = validate_rttm_file(str(p))
        assert bad == 0

    def test_invalid_lines(self, tmp_path):
        p = tmp_path / "bad.rttm"
        with open(p, "w") as f:
            f.write("SPEAKER m 1 0.0 1.0 <NA> <NA> A <NA> <NA>\n")
            f.write("GARBAGE line here\n")
            f.write("SPEAKER m 1 abc 1.0 <NA> <NA> A <NA> <NA>\n")
            f.write("SPEAKER m 1 5.0 -1.0 <NA> <NA> A <NA> <NA>\n")
        bad, first = validate_rttm_file(str(p))
        assert bad == 3
        assert first == 2
