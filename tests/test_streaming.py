"""Streaming TS-VAD: chunk-masked training forward, cache-based decode,
and the key invariant — streaming chunk outputs == offline chunk-masked
forward on the same features."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speaker_diarization_tpu.models.streaming_tsvad import (
    StreamingTSVADConfig,
    StreamingTSVADModel,
)

CFG = StreamingTSVADConfig(
    max_num_speaker=4,
    speaker_embed_dim=64,
    d_model=128,
    d_ff=128,
    n_heads=2,
    n_layers=2,
    dropout=0.0,
    chunk_size=8,
    num_left_chunks=2,
)


@pytest.fixture(scope="module")
def model_and_vars():
    model = StreamingTSVADModel(cfg=CFG)
    rng = np.random.default_rng(0)
    B, T = 2, 40  # label frames (5 chunks of 8)
    audio = jnp.asarray(rng.standard_normal((B, T * 640)).astype(np.float32) * 0.1)
    embs = jnp.asarray(rng.standard_normal((B, 4, CFG.speaker_embed_dim)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, embs, T)
    return model, variables, audio, embs, B, T


class TestOfflineForward:
    def test_shapes(self, model_and_vars):
        model, variables, audio, embs, B, T = model_and_vars
        logits = model.apply(variables, audio, embs, T)
        assert logits.shape == (B, T, 4)
        assert np.isfinite(np.asarray(logits)).all()

    def test_chunk_mask_blocks_future(self, model_and_vars):
        # NOTE: probed at the 25 Hz feature level — the fbank front-end uses
        # whole-utterance mean-norm (like the reference), which is globally
        # non-causal by design.
        model, variables, audio, embs, B, T = model_and_vars
        mix = model.apply(variables, audio, method=model.encode_frames)[:, :T]

        def backends(mdl, mix):
            cat = mdl._fuse(mix, embs, False)
            Bx, S, Tx, D = cat.shape
            x = cat.reshape(Bx * S, Tx, D)
            x = mdl.single_backend(x, chunk_size=CFG.chunk_size, num_left_chunks=CFG.num_left_chunks)
            x = x.reshape(Bx, S, Tx, D).transpose(0, 2, 1, 3).reshape(Bx, Tx, S * D)
            x = mdl.backend_down(x)
            x = mdl.multi_backend(x, chunk_size=CFG.chunk_size, num_left_chunks=CFG.num_left_chunks)
            return mdl.fc(x).astype(jnp.float32)

        mix2 = np.asarray(mix).copy()
        mix2[:, T // 2 :] += 5.0  # perturb future features
        y1 = np.asarray(model.apply(variables, mix, method=backends))
        y2 = np.asarray(model.apply(variables, jnp.asarray(mix2), method=backends))
        np.testing.assert_allclose(y1[:, : CFG.chunk_size], y2[:, : CFG.chunk_size], atol=2e-4)


class TestStreamingEquivalence:
    def test_streaming_matches_offline_on_mix(self, model_and_vars):
        model, variables, audio, embs, B, T = model_and_vars
        # precompute 25 Hz mix features once; compare backends streaming vs
        # offline chunk-masked forward built on the same features
        mix = model.apply(variables, audio, method=model.encode_frames)[:, :T]

        def offline(mdl, mix):
            cat = mdl._fuse(mix, embs, False)
            Bx, S, Tx, D = cat.shape
            x = cat.reshape(Bx * S, Tx, D)
            x = mdl.single_backend(x, chunk_size=CFG.chunk_size, num_left_chunks=CFG.num_left_chunks)
            x = x.reshape(Bx, S, Tx, D).transpose(0, 2, 1, 3).reshape(Bx, Tx, S * D)
            x = mdl.backend_down(x)
            x = mdl.multi_backend(x, chunk_size=CFG.chunk_size, num_left_chunks=CFG.num_left_chunks)
            return mdl.fc(x).astype(jnp.float32)

        y_off = np.asarray(model.apply(variables, mix, method=offline))

        state = model.apply(variables, B, method=model.streaming_state)
        outs = []
        for ci in range(T // CFG.chunk_size):
            chunk = mix[:, ci * CFG.chunk_size : (ci + 1) * CFG.chunk_size]
            logits, state = model.apply(variables, chunk, embs, state, method=model.streaming_step_mix)
            outs.append(np.asarray(logits))
        y_str = np.concatenate(outs, axis=1)
        assert y_str.shape == y_off.shape
        np.testing.assert_allclose(y_str, y_off, atol=2e-4)

    def test_streaming_full_pipeline_runs(self, model_and_vars):
        model, variables, audio, embs, B, T = model_and_vars
        state = model.apply(variables, B, method=model.streaming_state)
        n_chunks = 3
        samples_per_chunk = CFG.chunk_size * 640
        for ci in range(n_chunks):
            a = audio[:, ci * samples_per_chunk : (ci + 1) * samples_per_chunk]
            logits, state = model.apply(variables, a, embs, state, method=model.streaming_step)
            assert logits.shape[1] >= CFG.chunk_size - 1  # fbank edge loses ≤1 frame
            assert np.isfinite(np.asarray(logits)).all()
        assert int(state["pos"]) > 0

    def test_jitted_streaming_step(self, model_and_vars):
        model, variables, audio, embs, B, T = model_and_vars
        mix = model.apply(variables, audio, method=model.encode_frames)[:, :T]
        state = model.apply(variables, B, method=model.streaming_state)

        @jax.jit
        def step(chunk, state):
            return model.apply(variables, chunk, embs, state, method=model.streaming_step_mix)

        l1, state = step(mix[:, :8], state)
        l2, state = step(mix[:, 8:16], state)
        assert l1.shape == (B, 8, 4)
        assert not np.allclose(np.asarray(l1), np.asarray(l2))


class TestStreamingInferHelper:
    def test_window_predict_matches_offline_forward(self, model_and_vars):
        """infer.chunked.make_streaming_window_predict == sigmoid of the
        offline chunk-masked __call__ on the same rs_len window (the CLI
        `infer --family tsvad_streaming` predictor; fresh caches per
        window, reference forward_chunk_by_chunk semantics)."""
        from speaker_diarization_tpu.infer.chunked import make_streaming_window_predict

        model, variables, audio, embs, B, T = model_and_vars
        predict = make_streaming_window_predict(model, variables, T)
        p = np.asarray(predict(audio, embs))
        assert p.shape == (B, T, CFG.max_num_speaker)

        logits = model.apply(variables, audio, embs, T, False)
        ref = 1.0 / (1.0 + np.exp(-np.asarray(logits)))
        np.testing.assert_allclose(p, ref, atol=2e-4)
