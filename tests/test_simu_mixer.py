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
