"""Data-plane tests: wav I/O, Kaldi data dirs."""

import numpy as np
import pytest

from speaker_diarization_tpu.data import kaldi_io, wav as wavio


class TestWav:
    def test_pcm16_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        x = (rng.uniform(-0.9, 0.9, 16000)).astype(np.float32)
        p = tmp_path / "a.wav"
        wavio.write_wav(p, x, 16000)
        y, rate = wavio.read_wav(p)
        assert rate == 16000
        np.testing.assert_allclose(y, x, atol=1.0 / 32768)

    def test_float32_roundtrip(self, tmp_path):
        x = np.linspace(-1, 1, 1000).astype(np.float32)
        p = tmp_path / "f.wav"
        wavio.write_wav(p, x, 8000, subtype="FLOAT")
        y, rate = wavio.read_wav(p)
        np.testing.assert_array_equal(y, x)

    def test_partial_read(self, tmp_path):
        x = np.arange(1000, dtype=np.float32) / 1000
        p = tmp_path / "p.wav"
        wavio.write_wav(p, x, 8000, subtype="FLOAT")
        y, _ = wavio.read_wav(p, start=100, stop=200)
        np.testing.assert_array_equal(y, x[100:200])

    def test_stereo(self, tmp_path):
        x = np.stack([np.ones(100), -np.ones(100)], axis=1).astype(np.float32) * 0.5
        p = tmp_path / "s.wav"
        wavio.write_wav(p, x, 8000)
        y, _ = wavio.read_wav(p)
        assert y.shape == (100, 2)
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_int16_dtype(self, tmp_path):
        x = np.array([0.0, 0.5, -0.5], dtype=np.float32)
        p = tmp_path / "i.wav"
        wavio.write_wav(p, x, 8000)
        y, _ = wavio.read_wav(p, dtype="int16")
        assert y.dtype == np.int16
        assert y[1] == 16384

    def test_piped_command(self, tmp_path):
        x = np.sin(np.arange(500) / 10).astype(np.float32) * 0.3
        p = tmp_path / "c.wav"
        wavio.write_wav(p, x, 8000)
        y, rate = wavio.load_wav_maybe_piped(f"cat {p} |")
        assert rate == 8000
        np.testing.assert_allclose(y, x, atol=1e-3)

    def test_wav_info(self, tmp_path):
        p = tmp_path / "d.wav"
        wavio.write_wav(p, np.zeros(4000, np.float32), 8000)
        info = wavio.wav_info(p)
        assert info["rate"] == 8000 and info["frames"] == 4000
        assert info["duration"] == pytest.approx(0.5)


class TestKaldiData:
    def _make_dir(self, d):
        rng = np.random.default_rng(1)
        for rec in ["rec1", "rec2"]:
            wavio.write_wav(d / f"{rec}.wav", rng.standard_normal(8000).astype(np.float32) * 0.1, 8000)
        kaldi_io.save_data_dir(
            str(d),
            wavs={rec: str(d / f"{rec}.wav") for rec in ["rec1", "rec2"]},
            segments=[
                dict(utt="rec1-u1", rec="rec1", st=0.0, et=0.5),
                dict(utt="rec1-u2", rec="rec1", st=0.4, et=1.0),
                dict(utt="rec2-u1", rec="rec2", st=0.1, et=0.9),
            ],
            utt2spk={"rec1-u1": "spkA", "rec1-u2": "spkB", "rec2-u1": "spkA"},
            reco2dur={"rec1": 1.0, "rec2": 1.0},
        )

    def test_load(self, tmp_path):
        self._make_dir(tmp_path)
        kd = kaldi_io.KaldiData(str(tmp_path))
        assert sorted(kd.wavs) == ["rec1", "rec2"]
        assert [s["utt"] for s in kd.segments["rec1"]] == ["rec1-u1", "rec1-u2"]
        assert kd.utt2spk["rec2-u1"] == "spkA"
        assert sorted(kd.spk2utt["spkA"]) == ["rec1-u1", "rec2-u1"]
        assert kd.reco2dur["rec1"] == 1.0
        assert kd.all_speakers() == ["spkA", "spkB"]

    def test_load_wav_slice(self, tmp_path):
        self._make_dir(tmp_path)
        kd = kaldi_io.KaldiData(str(tmp_path))
        full, rate = kd.load_wav("rec1")
        part, _ = kd.load_wav("rec1", 1000, 2000)
        assert rate == 8000
        np.testing.assert_array_equal(part, full[1000:2000])


class TestConcatChunkDataset:
    """Joint multi-corpus training support (reference egs/multi_datasets)."""

    def _two_corpora(self, tmp_path):
        from speaker_diarization_tpu.data.simulate import simulate_corpus

        d1 = simulate_corpus(str(tmp_path / "c1"), n_mixtures=2, n_speakers=2,
                             seed=1, src_speakers=3, utts_per_speaker=4, with_noise=False)
        d2 = simulate_corpus(str(tmp_path / "c2"), n_mixtures=2, n_speakers=2,
                             seed=2, src_speakers=3, utts_per_speaker=4, with_noise=False)
        return d1, d2

    def test_concat_indexing_and_remap(self, tmp_path):
        import numpy as np
        from speaker_diarization_tpu.data.eend_dataset import (
            ConcatChunkDataset, EendChunkDataset,
        )
        from speaker_diarization_tpu.models.eend import FrontendConfig

        d1, d2 = self._two_corpora(tmp_path)
        fe = FrontendConfig()
        a = EendChunkDataset(d1, 50, fe, 2)
        b = EendChunkDataset(d2, 50, fe, 2)
        cat = ConcatChunkDataset([a, b])
        assert len(cat) == len(a) + len(b)
        assert len(cat.chunks) == len(cat)
        # items round-trip; second dataset's items come from b
        first = cat[0]
        np.testing.assert_array_equal(first["labels"], a[0]["labels"])
        last = cat[len(a)]
        np.testing.assert_array_equal(last["labels"], b[0]["labels"])
        # merged global speaker table covers both corpora; remapped ids
        # point into it (padding -1 preserved)
        assert set(a.all_speakers) | set(b.all_speakers) == set(cat.all_speakers)
        gid = {s: i for i, s in enumerate(cat.all_speakers)}
        for k, (ds, item) in enumerate([(a, cat[0]), (b, cat[len(a)])]):
            for c, sid in enumerate(item["spk_ids"]):
                if sid >= 0:
                    local = ds[0]["spk_ids"][c]
                    assert sid == gid[ds.all_speakers[local]]
        # batch iterator runs over the concatenation
        from speaker_diarization_tpu.data.eend_dataset import batch_iterator

        batches = list(batch_iterator(cat, 2, shuffle=True, seed=0))
        assert len(batches) == len(cat) // 2
