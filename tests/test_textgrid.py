"""TextGrid parsing + AliMeeting-style prep."""

import os

import numpy as np
import pytest

from speaker_diarization_tpu.data import wav as wavio
from speaker_diarization_tpu.data.textgrid import parse_textgrid, prepare_alimeeting_dir, textgrid_to_turns

LONG_TG = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 10.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "SPK_A"
        xmin = 0
        xmax = 10.0
        intervals: size = 3
        intervals [1]:
            xmin = 0
            xmax = 1.5
            text = ""
        intervals [2]:
            xmin = 1.5
            xmax = 4.0
            text = "hello there"
        intervals [3]:
            xmin = 4.0
            xmax = 10.0
            text = ""
    item [2]:
        class = "IntervalTier"
        name = "SPK_B"
        xmin = 0
        xmax = 10.0
        intervals: size = 2
        intervals [1]:
            xmin = 0
            xmax = 3.0
            text = "hi"
        intervals [2]:
            xmin = 3.0
            xmax = 10.0
            text = ""
'''


class TestParse:
    def test_long_format(self):
        tiers = parse_textgrid(LONG_TG)
        assert sorted(tiers) == ["SPK_A", "SPK_B"]
        assert tiers["SPK_A"] == [(1.5, 4.0, "hello there")]
        assert tiers["SPK_B"] == [(0.0, 3.0, "hi")]

    def test_to_turns(self, tmp_path):
        p = tmp_path / "m1.TextGrid"
        p.write_text(LONG_TG)
        turns = textgrid_to_turns(str(p), "m1")
        assert len(turns) == 2
        assert turns[0].speaker == "SPK_B" and turns[0].start == 0.0
        assert turns[1].speaker == "SPK_A" and turns[1].dur == pytest.approx(2.5)


class TestPrep:
    def test_prepare_dir(self, tmp_path):
        tg = tmp_path / "tg"
        wv = tmp_path / "wav"
        tg.mkdir()
        wv.mkdir()
        (tg / "meet1.TextGrid").write_text(LONG_TG)
        wavio.write_wav(wv / "meet1.wav", np.zeros(16000 * 10, np.float32), 16000)
        out = prepare_alimeeting_dir(str(tg), str(wv), str(tmp_path / "data"))
        assert os.path.exists(os.path.join(out, "wav.scp"))
        assert os.path.exists(os.path.join(out, "rttm"))
        import json

        lines = [json.loads(l) for l in open(os.path.join(out, "labels.jsonl"))]
        assert len(lines) == 2  # two speakers
        a = [l for l in lines if l["speaker_id"] == "SPK_A"][0]
        labels = np.array(a["labels"])
        assert labels.shape == (250,)  # 10 s × 25 Hz
        assert labels[int(2.0 * 25)] == 1 and labels[int(5.0 * 25)] == 0

        from speaker_diarization_tpu.data.kaldi_io import KaldiData

        kd = KaldiData(out)
        assert list(kd.wavs) == ["meet1"]
        assert len(kd.segments["meet1"]) == 2
