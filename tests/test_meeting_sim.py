"""LibriCSS-style meeting simulation (gen_mixspec_mtg/mixaudio_mtg parity)."""

import os

import numpy as np

from speaker_diarization_tpu.data import kaldi_io
from speaker_diarization_tpu.data.rttm import read_rttm
from speaker_diarization_tpu.data.simulate import (
    give_timing,
    make_meeting_mixtures,
    meeting_mixture_specs,
    synthesize_noise_corpus,
    synthesize_speaker_corpus,
)

import random


class TestGiveTiming:
    def _utts(self, rnd, n=12, n_spk=4):
        return [
            dict(utt=f"u{i}", speaker_id=f"s{rnd.randrange(n_spk)}", length_in_seconds=rnd.uniform(1.0, 4.0))
            for i in range(n)
        ]

    def test_no_self_overlap_and_max_twofold(self):
        for seed in range(5):
            rnd = random.Random(seed)
            utts = self._utts(rnd)
            timed = give_timing(utts, rnd, overlap_time_ratio=0.4, sil_prob=0.1)
            # same speaker never overlaps themself; ≤ 2-fold global overlap
            events = []
            by_spk = {}
            for u in timed:
                st, en = u["offset"], u["offset"] + u["length_in_seconds"]
                assert st >= -1e-9
                by_spk.setdefault(u["speaker_id"], []).append((st, en))
                events.append((st, 1))
                events.append((en, -1))
            for ivs in by_spk.values():
                ivs.sort()
                for (s1, e1), (s2, _e2) in zip(ivs, ivs[1:]):
                    assert s2 >= e1 - 1e-6
            depth, worst = 0, 0
            for _, d in sorted(events, key=lambda t: (t[0], t[1])):
                depth += d
                worst = max(worst, depth)
            assert worst <= 2

    def test_overlap_budget_roughly_met(self):
        rnd = random.Random(0)
        utts = self._utts(rnd, n=40, n_spk=8)
        timed = give_timing(utts, rnd, overlap_time_ratio=0.3, sil_prob=0.0)
        total = sum(u["length_in_seconds"] for u in timed)
        span = max(u["offset"] + u["length_in_seconds"] for u in timed)
        actual = (total - span) / span  # overlap time ratio vs single-layer time
        assert 0.0 <= actual <= 0.35


class TestMeetingPipeline:
    def test_end_to_end(self, tmp_path):
        src = synthesize_speaker_corpus(str(tmp_path / "src"), n_speakers=6, utts_per_speaker=5, rate=8000, seed=0)
        noise = synthesize_noise_corpus(str(tmp_path / "noise"), n_noises=2, rate=8000)
        specs = meeting_mixture_specs(src, noise_dir=noise, seed=3)
        # every utterance consumed exactly once
        used = [u["utt"] for s in specs for u in s["utterances"]]
        assert sorted(used) == sorted(kaldi_io.load_scp(os.path.join(src, "wav.scp")))
        out = make_meeting_mixtures(specs, str(tmp_path / "data"), str(tmp_path / "wavdir"), rate=8000)
        wavs = kaldi_io.load_scp(os.path.join(out, "wav.scp"))
        assert len(wavs) == len(specs)
        turns = read_rttm(os.path.join(out, "rttm"))
        assert len(turns) == len(used)
        # rendered audio has energy where labels say speech
        from speaker_diarization_tpu.data import wav as wavio

        rec = specs[0]["recid"]
        y, sr = wavio.read_wav(wavs[rec])
        assert sr == 8000 and np.abs(y).max() > 0.01
        rec_turns = [t for t in turns if t.rec == rec]
        for t in rec_turns[:3]:
            seg = y[int(t.start * sr) : int(t.end * sr)]
            assert np.sqrt(np.mean(seg**2)) > 1e-3
