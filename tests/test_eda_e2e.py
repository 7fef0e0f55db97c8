"""EEND-EDA end-to-end + checkpointing + clustering pipeline tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.data.eend_dataset import EendChunkDataset, batch_iterator
from speaker_diarization_tpu.data.rttm import read_rttm_by_rec, write_rttm
from speaker_diarization_tpu.data.simulate import simulate_corpus
from speaker_diarization_tpu.infer import eda_infer_dataset, select_speakers
from speaker_diarization_tpu.models import EendEdaModel
from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.postproc import probs_to_turns
from speaker_diarization_tpu.score import score_der
from speaker_diarization_tpu.train import Trainer, TrainerConfig
from speaker_diarization_tpu.train.checkpoints import CheckpointManager, average_checkpoints
from speaker_diarization_tpu.train.tasks import make_eda_loss

FE = FrontendConfig()
TINY = dict(d_model=64, n_layers=2, n_heads=2, d_ff=128, dropout=0.1)
CHUNK = 100


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("eda_sim")
    return simulate_corpus(str(d), n_mixtures=4, n_speakers=2, rate=8000, seed=11, sil_scale=1.5)


class TestEdaTraining:
    def test_loss_decreases_and_infer(self, corpus, tmp_path):
        ds = EendChunkDataset(corpus, chunk_frames=CHUNK, frontend=FE, n_speakers=2)
        model = EendEdaModel(n_speakers=2, max_attractors=4, frontend=FE, **TINY)
        trainer = Trainer(make_eda_loss(model), TrainerConfig(schedule="const", learning_rate=2e-3))
        batches = []
        ep = 0
        while len(batches) < 40:
            for b in batch_iterator(ds, 4, shuffle=True, seed=0, epoch=ep):
                batches.append(b)
            ep += 1
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(batches[0]["audio"]))
        state = trainer.init_state(params)
        losses, att_losses = [], []
        for b in batches[:40]:
            state, aux = trainer.train_step(state, b)
            losses.append(float(aux["loss"]))
            att_losses.append(float(aux["attractor_loss"]))
        assert np.mean(losses[-5:]) < 0.85 * np.mean(losses[:5])
        assert np.mean(att_losses[-5:]) < np.mean(att_losses[:5])

        # variable-speaker chunked inference
        @jax.jit
        def predict(audio, mask):
            logits, exist = model.apply(state.params, audio, frame_mask=mask, deterministic=True, method=model.infer)
            return jax.nn.sigmoid(logits) * mask[..., None], exist

        probs = eda_infer_dataset(
            lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), corpus, FE, chunk_frames=CHUNK, threshold=0.4
        )
        fs = FE.frame_shift * FE.subsampling / FE.sample_rate
        turns = []
        for rec, p in probs.items():
            assert p.shape[1] >= 1
            turns += probs_to_turns(p, rec, fs, threshold=0.5, median=11)
        hyp = tmp_path / "hyp.rttm"
        write_rttm(hyp, turns)
        res = score_der(os.path.join(corpus, "rttm"), str(hyp), collar=0.25)
        # pinned near the demonstrated toy-corpus performance (~0.32 DER at
        # this 40-step budget; family row 22.77% in RESULTS.md) so the EDA
        # path regression-guards like tsvad (0.5) and eend (0.8) do
        assert res.der < 0.6, f"eda e2e DER regressed: {res.der}"

    def test_select_speakers(self):
        assert select_speakers(np.array([0.9, 0.8, 0.3, 0.9]), 0.5) == 2
        assert select_speakers(np.array([0.2]), 0.5) == 0
        assert select_speakers(np.array([0.9, 0.9]), 0.5) == 2
        assert select_speakers(np.array([0.9, 0.9, 0.9]), 0.5, max_speakers=2) == 2


class TestCheckpointing:
    def test_save_restore_resume(self, corpus, tmp_path):
        ds = EendChunkDataset(corpus, chunk_frames=CHUNK, frontend=FE, n_speakers=2)
        model = EendEdaModel(n_speakers=2, frontend=FE, **{**TINY, "dropout": 0.0})
        trainer = Trainer(make_eda_loss(model), TrainerConfig(schedule="const", learning_rate=1e-3, seed=3))
        b = next(batch_iterator(ds, 4, shuffle=False))
        params = model.init(jax.random.PRNGKey(3), jnp.asarray(b["audio"]))
        state = trainer.init_state(params)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2, best_k=2)

        metrics = []
        for i in range(4):
            state, aux = trainer.train_step(state, b)
            metrics.append(float(aux["loss"]))
            mgr.save(state, metric=metrics[-1])
        assert mgr.latest_step() == 4
        assert mgr.best_step() == 4  # loss decreases → newest is best

        # restore into template and continue training: must equal uninterrupted run
        restored = mgr.restore(4, template=jax.device_get(state))
        s1, _ = trainer.train_step(restored, b)
        s2, _ = trainer.train_step(state, b)
        for a, c in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)

    def test_average_checkpoints(self, corpus, tmp_path):
        ds = EendChunkDataset(corpus, chunk_frames=CHUNK, frontend=FE, n_speakers=2)
        model = EendEdaModel(n_speakers=2, frontend=FE, **{**TINY, "dropout": 0.0})
        trainer = Trainer(make_eda_loss(model), TrainerConfig(schedule="const", learning_rate=1e-2))
        b = next(batch_iterator(ds, 2, shuffle=False))
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(b["audio"]))
        state = trainer.init_state(params)
        mgr = CheckpointManager(str(tmp_path / "ck2"), max_to_keep=5)
        snaps = []
        for _ in range(3):
            state, _ = trainer.train_step(state, b)
            mgr.save(state)
            snaps.append(jax.device_get(state.params))
        avg = average_checkpoints(mgr, [1, 2, 3], jax.device_get(state))
        leaf = jax.tree_util.tree_leaves(avg)[0]
        manual = np.mean([np.asarray(jax.tree_util.tree_leaves(s)[0]) for s in snaps], axis=0)
        np.testing.assert_allclose(np.asarray(leaf), manual, atol=1e-6)


class TestClusteringPipeline:
    def test_spectral_cluster_separates_blobs(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((20, 16)) * 0.05 + np.array([1.0] + [0.0] * 15)
        bb = rng.standard_normal((20, 16)) * 0.05 + np.array([0.0, 1.0] + [0.0] * 14)
        X = np.concatenate([a, bb])
        from speaker_diarization_tpu.infer import spectral_cluster

        labels = spectral_cluster(X, max_num_spks=5)
        assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
        assert labels[0] != labels[-1]

    def test_cluster_recording_pipeline(self, corpus, tmp_path):
        from speaker_diarization_tpu.data.kaldi_io import KaldiData
        from speaker_diarization_tpu.infer import cluster_recording, oracle_sad
        from speaker_diarization_tpu.ops import features as F

        kd = KaldiData(corpus)
        turns_by_rec = read_rttm_by_rec(os.path.join(corpus, "rttm"))

        # cheap embedding: mean log-mel over the window (spectral identity of
        # synthetic voices lives in the spectrum, so this separates them)
        def embed_fn(b):
            out = []
            for w in b:
                lm = F.transform(F.stft(w, 200, 80), "logmel23", sample_rate=8000)
                out.append(lm.mean(axis=0))
            return np.stack(out)

        all_turns = []
        for rec in sorted(kd.wavs)[:2]:
            audio, rate = kd.load_wav(rec)
            sad = oracle_sad(turns_by_rec[rec])
            all_turns += cluster_recording(audio, rate, embed_fn, rec, sad=sad, num_spks=2)
        assert all_turns
        hyp = tmp_path / "cluster_hyp.rttm"
        write_rttm(hyp, all_turns)
        ref_sub = {rec: turns_by_rec[rec] for rec in sorted(kd.wavs)[:2]}
        res = score_der(ref_sub, str(hyp), collar=0.25)
        # oracle SAD clustering should at least beat all-silence
        # pinned near demonstrated ~0.33 DER (oracle-SAD clustering on the
        # 2-rec toy subset)
        assert res.der < 0.6, f"cluster DER regressed: {res.der}"

    def test_density_cluster_fallback_runs(self):
        rng = np.random.default_rng(1)
        X = np.concatenate([
            rng.standard_normal((15, 8)) * 0.05 + 1.0,
            rng.standard_normal((15, 8)) * 0.05 - 1.0,
        ])
        from speaker_diarization_tpu.infer import density_cluster

        labels = density_cluster(X)
        assert labels.shape == (30,)
        assert (labels >= 0).all()


class TestEdaConformerEncoder:
    def test_forward_and_grad(self):
        """encoder_type='conformer' (reference models.py:495-504)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from speaker_diarization_tpu.models import EendEdaModel

        model = EendEdaModel(n_speakers=2, d_model=32, n_layers=1, n_heads=2,
                             d_ff=64, dropout=0.0, encoder_type="conformer",
                             frontend=None)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 30, 23)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" in v  # conformer conv module carries BN stats
        logits, exist = model.apply(v, x)
        assert logits.shape == (2, 30, 2) and exist.shape == (2, 3)

        def loss(p):
            lg, ex = model.apply({"params": p, "batch_stats": v["batch_stats"]}, x)
            return jnp.mean(lg**2) + jnp.mean(ex**2)

        g = jax.grad(loss)(v["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # the conformer conv path must actually be in the param tree
        names = str(jax.tree_util.tree_structure(v["params"]))
        assert "block_0" in names
