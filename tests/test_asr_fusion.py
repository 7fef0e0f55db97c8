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
