"""DiCoW: FDDT conditioning semantics + conditioned-encoder/CTC flow."""

import jax
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.models.dicow import (
    DiCoWConfig,
    DiCoWEncoder,
    FDDT,
    ctc_greedy_decode,
    ctc_loss,
)
from speaker_diarization_tpu.models.whisper_encoder import WhisperEncoderConfig
from speaker_diarization_tpu.postproc.stno import stno_masks_for_all

TINY = WhisperEncoderConfig(n_mels=20, n_ctx=64, d_model=32, n_heads=4, n_layers=2, d_ff=64)


def _mask(B, T, row):
    m = np.zeros((B, 4, T), np.float32)
    m[:, row] = 1.0
    return jnp.asarray(m)


class TestFDDT:
    def test_init_semantics_full(self):
        # at init: target/overlap transforms are identity, silence/non-target 0.01·I
        m = FDDT(d_model=8, non_target_rate=0.01)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 8)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, _mask(2, 5, 1))
        np.testing.assert_allclose(np.asarray(m.apply(v, x, _mask(2, 5, 1))), np.asarray(x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.apply(v, x, _mask(2, 5, 0))), 0.01 * np.asarray(x), atol=1e-6)
        # soft mask mixes the class transforms
        mix = jnp.asarray(np.tile(np.array([0.5, 0.5, 0.0, 0.0], np.float32)[None, :, None], (2, 1, 5)))
        np.testing.assert_allclose(np.asarray(m.apply(v, x, mix)), 0.5 * 1.01 * np.asarray(x), atol=1e-6)

    def test_bias_only_is_identity_at_init(self):
        m = FDDT(d_model=8, bias_only=True)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 8)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, _mask(1, 4, 3))
        np.testing.assert_allclose(np.asarray(m.apply(v, x, _mask(1, 4, 3))), np.asarray(x), atol=1e-7)

    def test_diagonal_variant(self):
        m = FDDT(d_model=8, is_diagonal=True, non_target_rate=0.5)
        x = jnp.asarray(np.ones((1, 3, 8), np.float32))
        v = m.init(jax.random.PRNGKey(0), x, _mask(1, 3, 2))
        np.testing.assert_allclose(np.asarray(m.apply(v, x, _mask(1, 3, 2))), 0.5 * np.ones((1, 3, 8)), atol=1e-6)


class TestDiCoWEncoder:
    def test_conditioning_changes_output(self):
        cfg = DiCoWConfig(whisper=TINY, vocab_size=8)
        model = DiCoWEncoder(cfg=cfg)
        mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 50, 20)).astype(np.float32))
        T50 = 25
        v = model.init(jax.random.PRNGKey(0), mel, _mask(1, T50, 1))
        logits_t, h_t = model.apply(v, mel, _mask(1, T50, 1))
        logits_s, h_s = model.apply(v, mel, _mask(1, T50, 0))
        assert logits_t.shape == (1, T50, 8)
        assert h_t.shape == (1, T50, 32)
        assert not np.allclose(np.asarray(h_t), np.asarray(h_s), atol=1e-3)

    def test_per_speaker_batch_from_diarization(self):
        # (S, T) diarization → (S, 4, T) STNO → speakers folded into batch
        diar = np.zeros((2, 25), np.float32)
        diar[0, :10] = 1
        diar[1, 8:20] = 1
        stno = jnp.asarray(stno_masks_for_all(diar))  # (2, 4, 25)
        cfg = DiCoWConfig(whisper=TINY, vocab_size=8, fddt_is_diagonal=True)
        model = DiCoWEncoder(cfg=cfg)
        mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 50, 20)).astype(np.float32))
        mels = jnp.broadcast_to(mel, (2, 50, 20))
        v = model.init(jax.random.PRNGKey(0), mels, stno)
        logits, h = model.apply(v, mels, stno)
        assert logits.shape == (2, 25, 8)
        assert not np.allclose(np.asarray(h[0]), np.asarray(h[1]), atol=1e-3)

    def test_ctc_loss_and_grads(self):
        cfg = DiCoWConfig(whisper=TINY, vocab_size=8)
        model = DiCoWEncoder(cfg=cfg)
        mel = jnp.asarray(np.random.default_rng(2).standard_normal((2, 50, 20)).astype(np.float32))
        stno = _mask(2, 25, 1)
        v = model.init(jax.random.PRNGKey(0), mel, stno)
        labels = jnp.asarray(np.array([[1, 2, 3, 0], [4, 5, 0, 0]], np.int32))
        label_pad = jnp.asarray(np.array([[0, 0, 0, 1], [0, 0, 1, 1]], np.float32))
        logit_pad = jnp.zeros((2, 25), jnp.float32)

        def loss_fn(params):
            logits, _ = model.apply({"params": params}, mel, stno)
            return ctc_loss(logits, logit_pad, labels, label_pad)

        loss, grads = jax.value_and_grad(loss_fn)(v["params"])
        assert np.isfinite(float(loss))
        g = grads["initial_fddt"]["target_linear"]["kernel"]
        assert float(jnp.abs(g).max()) > 0.0

    def test_greedy_decode_collapse(self):
        V, T = 5, 7
        seq = [0, 1, 1, 0, 2, 2, 3]  # → [1, 2, 3]
        logits = np.full((T, V), -10.0, np.float32)
        for t, s in enumerate(seq):
            logits[t, s] = 10.0
        assert ctc_greedy_decode(jnp.asarray(logits)) == [[1, 2, 3]]


class TestCtcPrefixBeamSearch:
    def _brute_force_best(self, lp, blank=0):
        """Exact: enumerate all alignment paths, sum per collapsed label seq."""
        import itertools
        import numpy as np

        T, V = lp.shape
        scores = {}
        for path in itertools.product(range(V), repeat=T):
            s = sum(lp[t, v] for t, v in enumerate(path))
            # collapse
            out, prev = [], -1
            for v in path:
                if v != prev and v != blank:
                    out.append(v)
                prev = v
            key = tuple(out)
            scores[key] = np.logaddexp(scores.get(key, -np.inf), s)
        return max(scores.items(), key=lambda kv: kv[1])

    def test_matches_bruteforce(self):
        import numpy as np
        from speaker_diarization_tpu.models.dicow import ctc_prefix_beam_search

        rng = np.random.default_rng(0)
        for trial in range(5):
            T, V = 5, 3
            lp = np.log(rng.dirichlet(np.ones(V), size=T))
            best_seq, best_score = self._brute_force_best(lp)
            got = ctc_prefix_beam_search(lp, beam_size=32)
            nbest = ctc_prefix_beam_search(lp, beam_size=32, return_nbest=True)
            assert tuple(got) == best_seq, (trial, got, best_seq)
            assert abs(nbest[0][1] - best_score) < 1e-9 * abs(best_score)

    def test_beats_greedy_on_blank_split_mass(self):
        """Classic case: greedy picks the per-frame argmax path (blank),
        beam search sums the split non-blank mass."""
        import numpy as np
        from speaker_diarization_tpu.models.dicow import (
            ctc_greedy_decode,
            ctc_prefix_beam_search,
        )
        import jax.numpy as jnp

        # two frames: p(blank)=0.4, p(a)=0.35, p(b)=0.25 each frame
        p = np.array([[0.4, 0.35, 0.25], [0.4, 0.35, 0.25]])
        lp = np.log(p)
        greedy = ctc_greedy_decode(jnp.asarray(lp))[0]
        assert greedy == []  # blank argmax per frame
        beam = ctc_prefix_beam_search(lp, beam_size=8)
        # P("a") = 0.35*0.4 + 0.4*0.35 + 0.35*0.35 = 0.4025 > P("") = 0.16
        assert beam == [1]
