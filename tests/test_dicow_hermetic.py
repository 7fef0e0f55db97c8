"""Hermetic DiCoW transcription: the diarization-conditioned ASR mechanism
TRAINED end-to-end on synthetic token speech (data/asr_sim.py) — the
training-free analogue of egs/mlc_slm/dicow, where pretrained Whisper is
fine-tuned with FDDT conditioning. Staged like the reference: (1) pretrain
the unconditioned CTC ASR on single-speaker utterances; (2) fine-tune with
STNO/FDDT conditioning on 2-speaker mixtures where the labels are ONE
speaker's tokens. Proves (a) the conditioned model transcribes the target
speaker from a mixture (low token error rate), and (b) conditioning is
load-bearing: with an all-target mask the same model transcribes both
speakers and the target-only TER collapses."""

import difflib

import numpy as np
import pytest


def _ter(hyp, ref):
    sm = difflib.SequenceMatcher(a=ref, b=hyp)
    return max(len(ref), len(hyp)) - sum(bl.size for bl in sm.get_matching_blocks()), len(ref)


@pytest.mark.slow
def test_conditioned_transcription_trains_hermetically():
    import jax
    import jax.numpy as jnp
    import optax

    from speaker_diarization_tpu.data.asr_sim import conditioned_batches, token_batches
    from speaker_diarization_tpu.models.dicow import (
        DiCoWConfig, DiCoWEncoder, ctc_greedy_decode, ctc_loss,
    )
    from speaker_diarization_tpu.models.whisper_encoder import WhisperEncoderConfig

    V, rate = 10, 16000
    cfg = DiCoWConfig(
        whisper=WhisperEncoderConfig(n_mels=40, d_model=64, n_heads=2, n_layers=2, d_ff=128, n_ctx=256),
        vocab_size=V + 1,
    )
    model = DiCoWEncoder(cfg=cfg)

    def make_step(tx, use_stno):
        @jax.jit
        def step(p, o, audio, stno, labels, lmask):
            def loss_fn(p):
                logits, _ = model.apply(p, audio, stno if use_stno else None)
                logit_pad = jnp.zeros((logits.shape[0], logits.shape[1]))
                return ctc_loss(logits, logit_pad, labels, 1.0 - lmask)

            l, g = jax.value_and_grad(loss_fn)(p)
            up, o2 = tx.update(g, o)
            return optax.apply_updates(p, up), o2, l

        return step

    # stage 1: unconditioned ASR, both synthetic voices
    it_a = token_batches(V, rate, batch_size=4, utt_s=3.0, speaker_shift=1.0, seed=0)
    it_b = token_batches(V, rate, batch_size=4, utt_s=3.0, speaker_shift=1.35, seed=1)
    b0 = next(it_a)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(b0["audio"]))
    tx1 = optax.adam(2e-3)
    opt = tx1.init(params)
    step1 = make_step(tx1, False)
    for _ in range(400):
        a, c = next(it_a), next(it_b)
        b = {k: np.concatenate([a[k], c[k]]) for k in a}
        params, opt, _l = step1(params, opt, jnp.asarray(b["audio"]), None,
                                jnp.asarray(b["labels"]), jnp.asarray(b["label_mask"]))

    # stage 2: conditioned fine-tune; FDDT params fresh (identity-init),
    # trunk + ctc head carried over from stage 1
    itc = conditioned_batches(V, rate, batch_size=8, seed=0)
    bc = next(itc)
    cond = model.init(jax.random.PRNGKey(1), jnp.asarray(bc["audio"]), jnp.asarray(bc["stno"]))
    merged = {"params": dict(cond["params"])}
    for k in params["params"]:
        merged["params"][k] = params["params"][k]
    tx2 = optax.adam(5e-4)
    opt = tx2.init(merged)
    step2 = make_step(tx2, True)
    for _ in range(300):
        b = next(itc)
        merged, opt, _l = step2(merged, opt, jnp.asarray(b["audio"]), jnp.asarray(b["stno"]),
                                jnp.asarray(b["labels"]), jnp.asarray(b["label_mask"]))

    def ter_of(stno, batch):
        logits, _ = model.apply(merged, jnp.asarray(batch["audio"]), stno)
        hyps = ctc_greedy_decode(np.asarray(logits))
        e = t = 0
        for h, ref, m in zip(hyps, batch["labels"], batch["label_mask"]):
            r = [int(x) for x, mm in zip(ref, m) if mm > 0]
            de, dt = _ter(list(h), r)
            e += de
            t += dt
        return e / max(t, 1)

    held = next(conditioned_batches(V, rate, batch_size=16, seed=777))
    ter_cond = ter_of(jnp.asarray(held["stno"]), held)
    assert ter_cond < 0.15, f"conditioned TER {ter_cond}"

    # ablation: all-target mask → the model transcribes BOTH speakers, so
    # scored against the target-only reference the TER collapses
    stno_all = np.zeros_like(held["stno"])
    stno_all[:, 1] = 1.0
    ter_all = ter_of(jnp.asarray(stno_all), held)
    assert ter_all > ter_cond + 0.2, (ter_cond, ter_all)
