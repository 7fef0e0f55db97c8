"""SimuDiarMixer + ERes2Net zoo tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.data.simulate import SimuDiarMixer, synthesize_noise_corpus, synthesize_speaker_corpus


@pytest.fixture(scope="module")
def src(tmp_path_factory):
    d = tmp_path_factory.mktemp("mixer")
    src = synthesize_speaker_corpus(str(d / "src"), n_speakers=5, utts_per_speaker=4, rate=16000, seed=0)
    noise = synthesize_noise_corpus(str(d / "noise"), rate=16000, seed=1)
    return src, noise


class TestSimuDiarMixer:
    def test_sample_shapes_and_labels(self, src):
        src_dir, noise_dir = src
        mixer = SimuDiarMixer(src_dir, noise_dir, duration=6.0, rate=16000, max_speakers=3, seed=0)
        s = mixer.sample()
        assert s["audio"].shape == (6 * 16000,)
        assert s["labels"].shape == (150, 3)
        assert s["spk_gids"].shape == (3,)
        # labels only where gid valid
        for i in range(3):
            if s["spk_gids"][i] < 0:
                assert s["labels"][:, i].sum() == 0
        assert np.abs(s["audio"]).max() <= 0.99 + 1e-6
        assert s["labels"].sum() > 0

    def test_batches_and_variety(self, src):
        src_dir, _ = src
        mixer = SimuDiarMixer(src_dir, None, duration=4.0, rate=16000, max_speakers=2, seed=1)
        it = mixer.batches(3)
        b1, b2 = next(it), next(it)
        assert b1["audio"].shape == (3, 64000)
        assert not np.allclose(b1["audio"], b2["audio"])  # fresh mixtures
        assert mixer.n_all_speakers == 5

    def test_speech_overlaps_labels(self, src):
        src_dir, _ = src
        mixer = SimuDiarMixer(src_dir, None, duration=6.0, max_speakers=2, seed=2, sil_scale=0.5)
        s = mixer.sample()
        # energy in labeled regions should dominate silence regions
        act = s["labels"].max(axis=1)
        frames = s["audio"][: 150 * 640].reshape(150, 640)
        e = (frames**2).mean(axis=1)
        if act.sum() > 5 and (1 - act).sum() > 5:
            assert e[act > 0].mean() > e[act == 0].mean()


class TestERes2Net:
    def test_modes(self):
        from speaker_diarization_tpu.models.eres2net import ERes2Net

        m = ERes2Net(feat_dim=24, embedding_size=32, m_channels=8, num_blocks=(1, 1, 1, 1))
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 24)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, False, "embedding")
        emb = m.apply(v, x, False, "embedding")
        frames = m.apply(v, x, False, "frames")
        assert emb.shape == (2, 32)
        assert frames.shape[1] == 8  # T/8
        assert np.isfinite(np.asarray(emb)).all()

    def test_zoo(self):
        from speaker_diarization_tpu.models.eres2net import ERes2Net
        from speaker_diarization_tpu.models.speaker_encoders import build_speaker_encoder

        m = build_speaker_encoder("eres2net", feat_dim=24, embedding_size=16, m_channels=8, num_blocks=(1, 1, 1, 1))
        assert isinstance(m, ERes2Net)


class TestRealDiarBlocks:
    def test_blocks_match_rttm(self, tmp_path):
        from speaker_diarization_tpu.data.simulate import RealDiarBlocks, simulate_corpus
        from speaker_diarization_tpu.data.rttm import read_rttm_by_rec
        import os

        data_dir = simulate_corpus(str(tmp_path), n_mixtures=2, n_speakers=2, rate=8000, seed=5)
        spk_to_gid = {f"spk{i:03d}": i for i in range(40)}
        ds = RealDiarBlocks(data_dir, spk_to_gid, duration=4.0, rate=8000, max_speakers=4, seed=0)
        turns = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
        speech_seen = 0
        for _ in range(8):
            s = ds.sample()
            assert s["audio"].shape == (4 * 8000,)
            assert s["labels"].shape == (100, 4)
            assert s["spk_gids"].shape == (4,)
            # empty slots carry gid -1 and zero labels; filled slots map to
            # real pool gids and are ordered most-active-first
            sums = s["labels"].sum(axis=0)
            for i in range(4):
                if s["spk_gids"][i] < 0:
                    assert sums[i] == 0
                else:
                    assert s["spk_gids"][i] in spk_to_gid.values()
            assert all(sums[i] >= sums[i + 1] or s["spk_gids"][i + 1] < 0 for i in range(3))
            speech_seen += sums.sum()
        assert speech_seen > 0  # windows are not all silence

    def test_label_alignment_against_rttm(self, tmp_path):
        """A window's per-frame labels equal frame states recomputed from
        the RTTM for a pinned window start."""
        import os

        import numpy as np

        from speaker_diarization_tpu.data.rttm import read_rttm_by_rec
        from speaker_diarization_tpu.data.simulate import RealDiarBlocks, simulate_corpus

        data_dir = simulate_corpus(str(tmp_path), n_mixtures=1, n_speakers=2, rate=8000, seed=6)
        spk_to_gid = {f"spk{i:03d}": i for i in range(40)}
        ds = RealDiarBlocks(data_dir, spk_to_gid, duration=4.0, rate=8000, max_speakers=4, seed=3)
        turns = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
        rec = ds.recs[0]
        start = 2.0

        class _Rng:
            def integers(self, n):
                return 0  # rec index

            def uniform(self, a, b):
                return start

        ds.rng = _Rng()
        s = ds.sample()
        # oracle frame states at 25 Hz over [start, start+4)
        gid_order = [int(g) for g in s["spk_gids"] if g >= 0]
        inv = {v: k for k, v in spk_to_gid.items()}
        for si, gid in enumerate(gid_order):
            spk = inv[gid]
            want = np.zeros(100, np.float32)
            for t in turns[rec]:
                if t.speaker != spk:
                    continue
                f0 = max(int((t.start - start) * 25), 0)
                f1 = min(int((t.end - start) * 25), 100)
                if f1 > f0:
                    want[f0:f1] = 1.0
            np.testing.assert_array_equal(s["labels"][:, si], want)
