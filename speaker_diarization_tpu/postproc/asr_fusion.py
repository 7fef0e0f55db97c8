"""Speaker-attributed ASR fusion: word timestamps × diarization → STM.

Reference: `egs/mlc_slm/fusion/asr_speaker_fusion.py` (word→speaker
assignment: biggest temporal overlap, falling back to smallest temporal
distance when a word overlaps no speaker segment) and
`generate_hyp_stm_from_whisperx_output.py` (STM emission). This is the
final stage of the mlc_slm speaker-attributed-ASR pipeline: TS-VAD RTTM +
ASR word list in, `<rec> <chan> <speaker> <start> <end> <text>` STM out
for tcpWER scoring.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..data.rttm import Turn


@dataclass
class Word:
    word: str
    start: float
    end: float
    confidence: Optional[float] = None


@dataclass
class FusedWord:
    word: str
    start: float
    end: float
    speaker: str
    method: str  # 'overlap' | 'distance'
    confidence: Optional[float] = None


@dataclass
class StmSegment:
    rec: str
    channel: str
    speaker: str
    start: float
    end: float
    text: str


def fuse_words(words: Sequence[Word], turns: Sequence[Turn]) -> List[FusedWord]:
    """Assign each ASR word to a diarization speaker
    (asr_speaker_fusion.py:159-189): max-overlap first, min-distance
    fallback. Vectorized over the (words × turns) grid."""
    if not turns:
        raise ValueError("no speaker turns to fuse against")
    ws = np.array([w.start for w in words])
    we = np.array([w.end for w in words])
    ts = np.array([t.start for t in turns])
    te = np.array([t.end for t in turns])
    ov = np.maximum(0.0, np.minimum(we[:, None], te[None, :]) - np.maximum(ws[:, None], ts[None, :]))
    # temporal distance between disjoint intervals (0 when overlapping)
    dist = np.maximum(0.0, np.maximum(ts[None, :] - we[:, None], ws[:, None] - te[None, :]))
    best_ov = ov.argmax(axis=1)
    best_dist = dist.argmin(axis=1)
    out = []
    for i, w in enumerate(words):
        if ov[i, best_ov[i]] > 0:
            out.append(FusedWord(w.word, w.start, w.end, turns[best_ov[i]].speaker, "overlap", w.confidence))
        else:
            out.append(FusedWord(w.word, w.start, w.end, turns[best_dist[i]].speaker, "distance", w.confidence))
    return out


def fused_words_to_stm(
    fused: Sequence[FusedWord], rec: str, channel: str = "1", max_gap: float = 1.0
) -> List[StmSegment]:
    """Group time-ordered fused words into STM utterances: a new segment
    starts on speaker change or a silence gap > max_gap seconds."""
    segs: List[StmSegment] = []
    for w in sorted(fused, key=lambda w: w.start):
        if segs and segs[-1].speaker == w.speaker and w.start - segs[-1].end <= max_gap:
            last = segs[-1]
            segs[-1] = StmSegment(rec, channel, last.speaker, last.start, max(last.end, w.end),
                                  f"{last.text} {w.word}")
        else:
            segs.append(StmSegment(rec, channel, w.speaker, w.start, w.end, w.word))
    return segs


def write_stm(path: str, segments: Sequence[StmSegment]) -> None:
    with open(path, "w") as f:
        for s in segments:
            f.write(f"{s.rec} {s.channel} {s.speaker} {s.start:.3f} {s.end:.3f} {s.text}\n")


def read_stm(path: str) -> List[StmSegment]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split(" ", 5)
            if len(parts) < 6:
                continue
            rec, ch, spk, st, en, text = parts
            out.append(StmSegment(rec, ch, spk, float(st), float(en), text))
    return out
