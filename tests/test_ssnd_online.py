"""SSND online inference memory loop + gradient accumulation test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.infer.ssnd_online import SpeakerMemory, ssnd_online_infer


class TestSpeakerMemory:
    def test_running_mean(self):
        m = SpeakerMemory()
        i = m.add(np.array([1.0, 0.0]))
        m.update(i, np.array([0.0, 1.0]))
        np.testing.assert_allclose(m.embeddings[i], [0.5, 0.5])
        assert m.counts[i] == 2


class TestOnlineInfer:
    def test_discovers_speakers(self):
        # fake model: slot VAD is high iff aux emb ≈ e_pse (discover once)
        e_pse = np.ones(8, np.float32)
        e_non = np.zeros(8, np.float32)
        calls = []

        def predict(block, aux):
            aux = aux[0]
            vad = np.full((1, 4, 10), -10.0, np.float32)
            emb = np.zeros((1, 4, 8), np.float32)
            for s in range(4):
                if np.allclose(aux[s], e_pse) and len(calls) == 0:
                    vad[0, s] = 10.0  # pseudo fires on first block only
                    emb[0, s] = np.arange(8)
                elif np.allclose(aux[s], np.arange(8)):
                    vad[0, s] = 10.0  # recognized known speaker
                    emb[0, s] = np.arange(8)
            calls.append(1)
            return vad, emb

        audio = np.zeros(3000, np.float32)
        out = ssnd_online_infer(predict, audio, block_samples=1000, vad_out_len=10, max_speakers=4,
                                e_pse=e_pse, e_non=e_non)
        assert out.shape == (30, 1)  # one speaker discovered
        assert out[:10].mean() > 0.9  # active in first block
        assert out[10:20].mean() > 0.9  # tracked as known speaker afterwards


class TestGradAccum:
    def test_multisteps_equals_big_batch(self):
        from speaker_diarization_tpu.models import EENDModel
        from speaker_diarization_tpu.models.eend import FrontendConfig
        from speaker_diarization_tpu.train import Trainer, TrainerConfig
        from speaker_diarization_tpu.train.tasks import make_eend_loss

        FE = FrontendConfig()
        model = EENDModel(n_speakers=2, d_model=32, n_layers=1, n_heads=2, d_ff=64, dropout=0.0, frontend=FE)
        rng = np.random.default_rng(0)
        B, T = 4, 20

        def mk(b0, b1):
            return dict(
                audio=rng.standard_normal((b1 - b0, FE.chunk_samples(T))).astype(np.float32) * 0.1,
                labels=(rng.random((b1 - b0, T, 2)) < 0.3).astype(np.float32),
                frame_mask=np.ones((b1 - b0, T), np.float32),
                spk_mask=np.ones((b1 - b0, 2), np.float32),
            )

        full = mk(0, 4)
        halves = [
            {k: v[:2] for k, v in full.items()},
            {k: v[2:] for k, v in full.items()},
        ]
        loss_fn = make_eend_loss(model)
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(full["audio"]))

        # train_step donates its state, so give each trainer its own copy
        params_copy = jax.tree_util.tree_map(lambda x: jnp.array(x), params)
        tr_full = Trainer(loss_fn, TrainerConfig(schedule="const", learning_rate=1e-2, optimizer="sgd", grad_clip_norm=None))
        s_full = tr_full.init_state(params_copy)
        s_full, _ = tr_full.train_step(s_full, full)

        tr_acc = Trainer(loss_fn, TrainerConfig(schedule="const", learning_rate=1e-2, optimizer="sgd", grad_clip_norm=None, grad_accum_steps=2))
        s_acc = tr_acc.init_state(params)
        for h in halves:
            s_acc, _ = tr_acc.train_step(s_acc, h)
        for a, b in zip(jax.tree_util.tree_leaves(s_full.params), jax.tree_util.tree_leaves(s_acc.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestOfflineRescore:
    def test_early_blocks_see_late_speakers(self):
        """A speaker discovered in block 2 must be scored in block 1 by the
        rescore pass (the point of offline_rescore, ssnd_model.py:899)."""
        from speaker_diarization_tpu.infer.ssnd_online import ssnd_offline_rescore

        e_pse = np.ones(8, np.float32)
        e_non = np.zeros(8, np.float32)
        spk_emb = np.arange(8, dtype=np.float32)
        state = {"block": 0}

        def predict(block, aux):
            aux = aux[0]
            vad = np.full((1, 4, 10), -10.0, np.float32)
            emb = np.zeros((1, 4, 8), np.float32)
            bi = state["block"]
            state["block"] += 1
            for s in range(4):
                if np.allclose(aux[s], e_pse) and bi == 1:
                    vad[0, s] = 10.0  # discovered only in online block 1
                    emb[0, s] = spk_emb
                elif np.allclose(aux[s], spk_emb):
                    vad[0, s] = 10.0  # speaker active in EVERY block when queried
                    emb[0, s] = spk_emb
            return vad, emb

        audio = np.zeros(3000, np.float32)
        out = ssnd_offline_rescore(predict, audio, block_samples=1000, vad_out_len=10,
                                   max_speakers=4, e_pse=e_pse, e_non=e_non)
        assert out.shape == (30, 1)
        # online pass would leave block 0 silent; rescore recovers it
        assert out[:10].mean() > 0.9
        assert out.min() > 0.9
