"""End-to-end slice: simulate → train EEND → chunked infer → RTTM → DER.

The hermetic analogue of the reference's mini_librispeech recipe
(SURVEY.md §7 minimum slice): asserts the loss decreases, the pipeline emits
valid RTTM, and DER beats trivial baselines; plus data-parallel consistency
on the 8-fake-device CPU mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.data.eend_dataset import EendChunkDataset, batch_iterator
from speaker_diarization_tpu.data.simulate import simulate_corpus
from speaker_diarization_tpu.data.rttm import write_rttm
from speaker_diarization_tpu.infer import infer_dataset
from speaker_diarization_tpu.models import EENDModel
from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.ops import losses as L
from speaker_diarization_tpu.parallel import make_mesh
from speaker_diarization_tpu.postproc import probs_to_turns
from speaker_diarization_tpu.score import score_der
from speaker_diarization_tpu.train import Trainer, TrainerConfig

FE = FrontendConfig()
TINY = dict(d_model=64, n_layers=2, n_heads=2, d_ff=128, dropout=0.1)
CHUNK = 100  # subsampled frames per chunk = 10 s at 8 kHz


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("sim")
    data_dir = simulate_corpus(
        str(d), n_mixtures=4, n_speakers=2, rate=8000, seed=0, sil_scale=1.5, with_noise=True
    )
    return data_dir


def _make_loss_fn(model):
    def loss_fn(params, batch, rng, train):
        logits = model.apply(
            params,
            batch["audio"],
            frame_mask=batch["frame_mask"],
            deterministic=not train,
            rngs={"dropout": rng} if train else None,
        )
        loss, _, _ = L.pit_loss(
            logits, batch["labels"], frame_mask=batch["frame_mask"], spk_mask=batch["spk_mask"]
        )
        return loss, {}

    return loss_fn


def _train(model, dataset, steps=40, batch_size=4, mesh=None, seed=0):
    loss_fn = _make_loss_fn(model)
    trainer = Trainer(loss_fn, TrainerConfig(optimizer="adam", schedule="const", learning_rate=2e-3, seed=seed), mesh=mesh)
    batches = []
    epoch = 0
    while len(batches) < steps:
        for b in batch_iterator(dataset, batch_size, shuffle=True, seed=seed, epoch=epoch):
            batches.append(b)
            if len(batches) >= steps:
                break
        epoch += 1
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(batches[0]["audio"]))
    state = trainer.init_state(params)
    losses = []
    for b in batches:
        state, aux = trainer.train_step(state, b)
        losses.append(float(aux["loss"]))
    return state, losses


class TestEndToEnd:
    def test_train_infer_score(self, corpus, tmp_path):
        ds = EendChunkDataset(corpus, chunk_frames=CHUNK, frontend=FE, n_speakers=2)
        assert len(ds) >= 8, f"corpus too small: {len(ds)} chunks"
        model = EENDModel(n_speakers=2, frontend=FE, **TINY)
        state, losses = _train(model, ds, steps=50, batch_size=4)

        first, last = np.mean(losses[:5]), np.mean(losses[-5:])
        assert last < 0.8 * first, f"loss did not decrease: {first:.4f} → {last:.4f}"

        # chunked inference → RTTM → DER
        @jax.jit
        def predict(audio, frame_mask):
            logits = model.apply(state.params, audio, frame_mask=frame_mask, deterministic=True)
            return jax.nn.sigmoid(logits) * frame_mask[..., None]

        probs = infer_dataset(lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), corpus, FE, chunk_frames=CHUNK, batch_size=4)
        frame_shift_s = FE.frame_shift * FE.subsampling / FE.sample_rate
        turns = []
        for rec, p in probs.items():
            assert np.isfinite(p).all() and p.shape[1] == 2
            turns += probs_to_turns(p, rec, frame_shift_s, threshold=0.5, median=11)
        hyp = tmp_path / "hyp.rttm"
        write_rttm(hyp, turns)
        res = score_der(os.path.join(corpus, "rttm"), str(hyp), collar=0.25)
        # sanity: all-silence system has DER = 1.0; we must beat it after
        # 50 steps (speech detection alone gets most of the way)
        assert res.scored_speaker_time > 0
        assert res.der < 0.8, f"DER {res.der:.3f} (pinned round-4 regression bound)"

    def test_data_parallel_matches_single_device(self, corpus):
        ds = EendChunkDataset(corpus, chunk_frames=CHUNK, frontend=FE, n_speakers=2)
        model = EENDModel(n_speakers=2, frontend=FE, **{**TINY, "dropout": 0.0})
        mesh = make_mesh(n_data=8)
        state_dp, losses_dp = _train(model, ds, steps=6, batch_size=8, mesh=mesh, seed=1)
        state_sd, losses_sd = _train(model, ds, steps=6, batch_size=8, mesh=None, seed=1)
        np.testing.assert_allclose(losses_dp, losses_sd, rtol=2e-4, atol=2e-5)
        # Adam normalizes by sqrt(v), so f32 reduction-order noise in sharded
        # grad means grows to ~1e-4 absolute on near-zero params after a few
        # steps; the meaningful equivalence check is the model's behavior:
        # final-parameter predictions must agree.
        batch = next(batch_iterator(ds, 8, shuffle=False))
        y_dp = model.apply(jax.device_get(state_dp.params), jnp.asarray(batch["audio"]), deterministic=True)
        y_sd = model.apply(jax.device_get(state_sd.params), jnp.asarray(batch["audio"]), deterministic=True)
        np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_sd), atol=2e-3)
