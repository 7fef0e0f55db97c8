"""CDER (utterance-level conversational DER) unit tests with hand-computed
expectations following the reference CSSDErrorRate algorithm."""

import pytest

from speaker_diarization_tpu.data.rttm import Turn
from speaker_diarization_tpu.score.cder import cder_file, score_cder

pytestmark = pytest.mark.quick


def T(rec, s, d, spk):
    return Turn(rec, s, d, spk)


class TestCderFile:
    def test_perfect(self):
        ref = [T("r", 0, 2, "A"), T("r", 3, 2, "B"), T("r", 6, 1, "A")]
        hyp = [T("r", 0, 2, "s1"), T("r", 3, 2, "s2"), T("r", 6, 1, "s1")]
        assert cder_file(ref, hyp) == 0.0

    def test_empty_hyp_all_errors(self):
        ref = [T("r", 0, 2, "A"), T("r", 3, 2, "B")]
        assert cder_file(ref, []) == pytest.approx(1.0)

    def test_one_missed_utterance(self):
        ref = [T("r", 0, 2, "A"), T("r", 3, 2, "A"), T("r", 6, 2, "A"), T("r", 9, 2, "A")]
        hyp = [T("r", 0, 2, "x"), T("r", 3, 2, "x"), T("r", 6, 2, "x")]
        # label A matched 3 utterances; the 4th ref utt is NOT counted
        # (reference quirk: only fully-unmatched labels add their refs)
        assert cder_file(ref, hyp) == pytest.approx(0.0)

    def test_fully_unmatched_label(self):
        ref = [T("r", 0, 2, "A"), T("r", 10, 2, "B"), T("r", 13, 2, "B")]
        hyp = [T("r", 0, 2, "x")]  # maps to A; B never matched
        assert cder_file(ref, hyp) == pytest.approx(2 / 3)

    def test_false_alarm_utterance(self):
        ref = [T("r", 0, 2, "A")]
        hyp = [T("r", 0, 2, "x"), T("r", 5, 1, "x")]  # second hyp utt has no IoU>=.5 ref
        assert cder_file(ref, hyp) == pytest.approx(1.0)  # 1 err / 1 ref

    def test_low_iou_not_matched(self):
        ref = [T("r", 0, 4, "A")]
        hyp = [T("r", 3, 4, "x")]  # inter=1, union=7 → IoU 1/7 < 0.5 → miss + label unmatched
        # hyp utt unmatched (+1), label A fully unmatched (+1) → 2 errors / 1 ref
        assert cder_file(ref, hyp) == pytest.approx(2.0)

    def test_duplicate_claims_counted(self):
        ref = [T("r", 0, 2, "A")]
        hyp = [T("r", 0, 2, "x"), T("r", 0.1, 2, "x")]  # both IoU>=0.5 with same ref
        # best kept, duplicate → +1 error
        assert cder_file(ref, hyp) == pytest.approx(1.0)

    def test_confused_speaker_label(self):
        ref = [T("r", 0, 2, "A"), T("r", 3, 2, "B")]
        hyp = [T("r", 0, 2, "x"), T("r", 3, 2, "x")]  # x maps to one label only
        # say x→A (overlap equal → first); B fully unmatched (+1);
        # hyp utt at 3 s has no A ref with IoU>=0.5 (+1) → 2/2
        assert cder_file(ref, hyp) == pytest.approx(1.0)


class TestScoreCder:
    def test_multi_file_average(self):
        ref = {
            "a": [T("a", 0, 2, "A")],
            "b": [T("b", 0, 2, "A"), T("b", 3, 2, "A")],
            "c": [T("c", 0, 2, "A")],
        }
        hyp = {
            "a": [T("a", 0, 2, "x")],
            "b": [T("b", 0, 2, "x")],
            # c missing → skipped
        }
        out = score_cder(ref, hyp)
        assert out["a"] == 0.0
        assert out["b"] == pytest.approx(0.0)  # partial-label quirk
        assert "c" not in out
        assert out["avg"] == pytest.approx(0.0)
