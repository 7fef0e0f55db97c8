"""EEND-VC: model/loss units + end-to-end chunk-cluster-stitch pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.data.eend_dataset import EendChunkDataset, batch_iterator
from speaker_diarization_tpu.data.rttm import write_rttm
from speaker_diarization_tpu.data.simulate import simulate_corpus
from speaker_diarization_tpu.infer.eend_vc import (
    cluster_chunk_vectors,
    constrained_ahc,
    eend_vc_infer_recording,
)
from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.models.eend_vc import EENDVCModel
from speaker_diarization_tpu.postproc import probs_to_turns
from speaker_diarization_tpu.score import score_der
from speaker_diarization_tpu.train import Trainer, TrainerConfig
from speaker_diarization_tpu.train.tasks import make_eend_vc_loss

FE = FrontendConfig()
CHUNK = 50  # 5 s chunks → several chunks per recording


class TestConstrainedAHC:
    def test_cannot_link_respected(self):
        rng = np.random.default_rng(0)
        # two tight groups; one cannot-link pair inside group 0
        g0 = rng.standard_normal((4, 8)) * 0.01 + 1.0
        g1 = rng.standard_normal((4, 8)) * 0.01 - 1.0
        X = np.concatenate([g0, g1])
        labels = constrained_ahc(X, [(0, 1)], n_clusters=3)
        assert labels[0] != labels[1]  # forced apart
        assert len(set(labels[4:])) == 1

    def test_cluster_chunk_vectors_silence(self):
        actis = [np.array([[0.9, 0.0], [0.8, 0.01]]), np.array([[0.0, 0.9], [0.02, 0.8]])]
        svecs = [np.array([[1.0, 0.0], [0.5, 0.5]]), np.array([[0.4, 0.6], [1.0, 0.05]])]
        labels, k = cluster_chunk_vectors(actis, svecs, n_clusters=1, sil_spk_th=0.05)
        # silent channels get label k
        assert labels[0, 1] == k and labels[1, 0] == k
        assert labels[0, 0] == 0 and labels[1, 1] == 0


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("vc_sim")
    return simulate_corpus(str(d), n_mixtures=4, n_speakers=2, rate=8000, seed=31, sil_scale=1.2)


class TestEndToEnd:
    def test_train_cluster_stitch(self, corpus, tmp_path):
        ds = EendChunkDataset(corpus, chunk_frames=CHUNK, frontend=FE, n_speakers=2)
        model = EENDVCModel(
            n_speakers=2, vec_dim=32, all_n_speakers=len(ds.all_speakers),
            d_model=64, n_layers=2, n_heads=2, d_ff=128, dropout=0.1, frontend=FE,
        )
        trainer = Trainer(make_eend_vc_loss(model), TrainerConfig(schedule="const", learning_rate=2e-3))
        batches = []
        ep = 0
        while len(batches) < 50:
            for b in batch_iterator(ds, 4, shuffle=True, seed=0, epoch=ep):
                batches.append(b)
            ep += 1
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(batches[0]["audio"]), method=model.init_all)
        state = trainer.init_state(params)
        losses, spk_losses = [], []
        for b in batches[:50]:
            state, aux = trainer.train_step(state, b)
            losses.append(float(aux["loss"]))
            spk_losses.append(float(aux["spk_loss"]))
        assert np.mean(losses[-5:]) < 0.85 * np.mean(losses[:5])
        assert np.mean(spk_losses[-5:]) < np.mean(spk_losses[:5])

        @jax.jit
        def predict(a, m):
            logits, vecs = model.apply(state.params, a, frame_mask=m, deterministic=True)
            return jax.nn.sigmoid(logits) * m[..., None], vecs

        from speaker_diarization_tpu.data.kaldi_io import KaldiData

        kd = KaldiData(corpus)
        turns = []
        fs = FE.frame_shift * FE.subsampling / FE.sample_rate
        for rec in sorted(kd.wavs):
            audio, rate = kd.load_wav(rec)
            probs = eend_vc_infer_recording(
                lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), audio, FE,
                chunk_frames=CHUNK, n_clusters=2, sil_spk_th=0.05,
            )
            assert np.isfinite(probs).all()
            turns += probs_to_turns(probs, rec, fs, threshold=0.5, median=11)
        hyp = tmp_path / "vc_hyp.rttm"
        write_rttm(hyp, turns)
        res = score_der(os.path.join(corpus, "rttm"), str(hyp), collar=0.25)
        assert res.der < 1.0
