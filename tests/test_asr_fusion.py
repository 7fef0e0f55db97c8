"""ASR-diarization fusion (mlc_slm asr_speaker_fusion semantics)."""

from speaker_diarization_tpu.data.rttm import Turn
from speaker_diarization_tpu.postproc.asr_fusion import (
    FusedWord,
    Word,
    fuse_words,
    fused_words_to_stm,
    read_stm,
    write_stm,
)

TURNS = [
    Turn("rec", 0.0, 2.0, "A"),   # 0-2
    Turn("rec", 1.5, 2.5, "B"),   # 1.5-4
    Turn("rec", 6.0, 2.0, "A"),   # 6-8
]


class TestFuseWords:
    def test_overlap_wins_biggest(self):
        # word 1.4-1.7: overlaps A (0.6) and B (0.2) → A
        out = fuse_words([Word("hi", 1.4, 2.0)], TURNS)
        assert out[0].speaker == "A" and out[0].method == "overlap"
        # word 1.9-3.0: overlaps A (0.1) and B (1.1) → B
        out = fuse_words([Word("yo", 1.9, 3.0)], TURNS)
        assert out[0].speaker == "B"

    def test_distance_fallback(self):
        # word 4.5-5.0 overlaps nothing; distance to B-turn end (4.0) = 0.5,
        # to A second turn (6.0) = 1.0 → B
        out = fuse_words([Word("gap", 4.5, 5.0)], TURNS)
        assert out[0].speaker == "B" and out[0].method == "distance"
        out = fuse_words([Word("gap2", 5.6, 5.9)], TURNS)
        assert out[0].speaker == "A"

    def test_stm_grouping_and_io(self, tmp_path):
        fused = [
            FusedWord("hello", 0.1, 0.4, "A", "overlap"),
            FusedWord("world", 0.5, 0.8, "A", "overlap"),
            FusedWord("ok", 2.5, 2.8, "B", "overlap"),  # speaker change
            FusedWord("then", 6.1, 6.4, "A", "overlap"),  # gap > 1 s
            FusedWord("bye", 6.5, 6.9, "A", "overlap"),
        ]
        segs = fused_words_to_stm(fused, "rec")
        assert [(s.speaker, s.text) for s in segs] == [
            ("A", "hello world"), ("B", "ok"), ("A", "then bye"),
        ]
        assert segs[0].start == 0.1 and segs[0].end == 0.8
        p = str(tmp_path / "hyp.stm")
        write_stm(p, segs)
        back = read_stm(p)
        assert [(s.speaker, s.text) for s in back] == [(s.speaker, s.text) for s in segs]


class TestTextNormalizationAndSrt:
    def test_normalize_text(self):
        from speaker_diarization_tpu.postproc.asr_fusion import normalize_text

        assert normalize_text("Hello,  World!") == "hello world"
        assert normalize_text("好的。谢谢、你！") == "好的谢谢你"
        assert normalize_text("it's A-OK") == "it's a-ok"  # ' and - kept

    def test_normalize_text_file(self, tmp_path):
        from speaker_diarization_tpu.postproc.asr_fusion import normalize_text_file

        src = tmp_path / "text"
        src.write_text("utt1 Hello, World!\nutt2 OK.\n")
        dst = tmp_path / "text.tn"
        normalize_text_file(str(src), str(dst))
        assert dst.read_text() == "utt1 hello world\nutt2 ok\n"

    def test_srt_to_stm(self, tmp_path):
        from speaker_diarization_tpu.postproc.asr_fusion import srt_file_to_stm

        srt = tmp_path / "Rec_01.srt"
        srt.write_text(
            "230\n00:18:48,533 --> 00:18:51,417\n[SPEAKER_01]: But I hope so.\n"
            "\n231\n00:18:51,958 --> 00:18:52,178\nYeah, yeah.\n"
        )
        segs = srt_file_to_stm(str(srt))
        assert segs[0].rec == "Rec_01"
        assert segs[0].speaker == "SPEAKER_01"
        assert segs[0].start == 1128.533 and segs[0].end == 1131.417
        assert segs[0].text == "but i hope so"
        assert segs[1].speaker == "SPEAKER_empty"
        assert segs[1].text == "yeah yeah"
