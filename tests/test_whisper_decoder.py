"""Whisper decoder: parity vs transformers torch WhisperDecoder + greedy
generation oracle + DiCoW-conditioned end-to-end text emission consumed by
the ASR fusion layer."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import WhisperConfig
    from transformers.models.whisper.modeling_whisper import WhisperDecoder as TorchWhisperDecoder

    from speaker_diarization_tpu.models.whisper_decoder import WhisperDecoder, WhisperDecoderConfig
    from speaker_diarization_tpu.utils.torch_convert import whisper_decoder_torch_to_flax

    torch.manual_seed(0)
    tcfg = WhisperConfig(
        vocab_size=64, d_model=32, decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=64, max_target_positions=48, num_mel_bins=24,
        encoder_layers=1, encoder_attention_heads=2, encoder_ffn_dim=64,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
    )
    tm = TorchWhisperDecoder(tcfg)
    tm.eval()
    fcfg = WhisperDecoderConfig(vocab_size=64, d_model=32, n_heads=2, n_layers=2, d_ff=64, max_positions=48)
    fm = WhisperDecoder(cfg=fcfg)
    params = whisper_decoder_torch_to_flax({k: v for k, v in tm.state_dict().items()})
    return tm, fm, params, fcfg


class TestWhisperDecoderParity:
    def test_logits_match_torch(self, pair):
        import jax.numpy as jnp
        import torch

        tm, fm, params, cfg = pair
        rng = np.random.default_rng(0)
        B, U, T = 2, 7, 11
        tokens = rng.integers(0, cfg.vocab_size, (B, U)).astype(np.int32)
        enc = rng.standard_normal((B, T, cfg.d_model)).astype(np.float32)
        with torch.no_grad():
            hid = tm(
                input_ids=torch.from_numpy(tokens.astype(np.int64)),
                encoder_hidden_states=torch.from_numpy(enc),
            ).last_hidden_state
            t_logits = (hid @ tm.embed_tokens.weight.T).numpy()
        f_logits = np.asarray(fm.apply({"params": params}, jnp.asarray(tokens), jnp.asarray(enc)))
        assert f_logits.shape == t_logits.shape == (B, U, cfg.vocab_size)
        np.testing.assert_allclose(f_logits, t_logits, atol=2e-4)

    def test_greedy_decode_matches_torch_oracle(self, pair):
        """Greedy conditioned generation step-by-step equals a hand-rolled
        torch greedy loop over the same decoder."""
        import jax.numpy as jnp
        import torch

        from speaker_diarization_tpu.models.whisper_decoder import greedy_decode

        tm, fm, params, cfg = pair
        rng = np.random.default_rng(1)
        B, T = 2, 9
        enc = rng.standard_normal((B, T, cfg.d_model)).astype(np.float32)
        bos, eos = 1, 2
        start = np.full((B, 1), bos, np.int32)

        # torch oracle: same greedy loop
        toks = torch.from_numpy(start.astype(np.int64))
        enc_t = torch.from_numpy(enc)
        with torch.no_grad():
            for _ in range(6):
                hid = tm(input_ids=toks, encoder_hidden_states=enc_t).last_hidden_state
                logits = hid[:, -1] @ tm.embed_tokens.weight.T
                nxt = logits.argmax(-1, keepdim=True)
                toks = torch.cat([toks, nxt], dim=1)
        oracle = toks.numpy()

        ours = greedy_decode(fm, params, jnp.asarray(enc), start, max_new_tokens=6, eos_id=eos)
        # compare up to the first eos in the oracle (greedy_decode pads after eos)
        for b in range(B):
            n = len(oracle[b])
            stop = np.where(oracle[b] == eos)[0]
            if len(stop):
                n = stop[0] + 1
            np.testing.assert_array_equal(ours[b][:n], oracle[b][:n])


class TestDiCoWEndToEnd:
    def test_conditioned_generation_feeds_asr_fusion(self):
        """DiCoW end-to-end on a toy vocab: STNO-conditioned encoder states →
        whisper decoder greedy text per speaker stream → asr_fusion aligns
        the emitted segments with the diarization into speaker-attributed
        output (reference egs/mlc_slm/dicow + fusion)."""
        import jax
        import jax.numpy as jnp

        from speaker_diarization_tpu.models.dicow import DiCoWConfig, DiCoWEncoder
        from speaker_diarization_tpu.models.whisper_encoder import WhisperEncoderConfig
        from speaker_diarization_tpu.models.whisper_decoder import (
            WhisperDecoder,
            WhisperDecoderConfig,
            greedy_decode,
        )
        from speaker_diarization_tpu.postproc.asr_fusion import Turn, Word

        rng = np.random.default_rng(0)
        enc_cfg = DiCoWConfig(
            whisper=WhisperEncoderConfig(n_mels=24, d_model=32, n_heads=2, n_layers=1, d_ff=64, n_ctx=64)
        )
        enc = DiCoWEncoder(cfg=enc_cfg)
        mel = jnp.asarray(rng.standard_normal((2, 64, 24)).astype(np.float32))
        # two speaker streams over the same audio: complementary STNO masks
        # (B, 4, T50) rows [silence, target, non-target, overlap]
        stno = np.zeros((2, 4, 32), np.float32)
        stno[0, 1, :16] = 1  # speaker A: target first half
        stno[0, 2, 16:] = 1
        stno[1, 1, 16:] = 1  # speaker B: target second half
        stno[1, 2, :16] = 1
        ep = enc.init(jax.random.PRNGKey(0), mel, jnp.asarray(stno))
        _ctc, states = enc.apply(ep, mel, jnp.asarray(stno))
        assert states.shape[0] == 2 and np.isfinite(np.asarray(states)).all()

        dec_cfg = WhisperDecoderConfig(vocab_size=16, d_model=states.shape[-1], n_heads=2, n_layers=1, d_ff=64, max_positions=16)
        dec = WhisperDecoder(cfg=dec_cfg)
        dp = dec.init(jax.random.PRNGKey(1), jnp.zeros((2, 1), jnp.int32), states)["params"]
        toks = greedy_decode(dec, dp, states, np.full((2, 1), 1, np.int32), max_new_tokens=5, eos_id=2)
        assert toks.shape[0] == 2 and toks.shape[1] <= 6
        # different conditioning → (almost surely) different token streams
        # is not guaranteed at random init; only require valid ids
        assert (toks >= 0).all() and (toks < 16).all()

        # a toy id→word map turns the streams into ASR words consumed by fusion
        vocab = [f"w{i}" for i in range(16)]
        words = []
        for spk, stream in enumerate(toks):
            for j, tid in enumerate(stream[1:]):
                if tid == 2:
                    break
                words.append(Word(word=vocab[tid], start=spk * 2.0 + 0.2 * j, end=spk * 2.0 + 0.2 * j + 0.15))
        turns = [
            Turn(rec="toy", start=0.0, dur=2.0, speaker="A"),
            Turn(rec="toy", start=2.0, dur=2.0, speaker="B"),
        ]
        from speaker_diarization_tpu.postproc.asr_fusion import fuse_words

        fused = fuse_words(words, turns)
        assert fused, "fusion produced no speaker-attributed words"
        assert {w.speaker for w in fused} <= {"A", "B"}
