"""DiCoW: Diarization-Conditioned Whisper encoder (target-speaker ASR).

Reference: `egs/mlc_slm/dicow/encoder.py` (DiCoWEncoder + FDDT, BUT-FIT
DiCoW v3) and `egs/mlc_slm/dicow/dicow_pipeline.py` (STNO mask pipeline).
A diarization output is converted to per-target-speaker STNO masks
(postproc/stno.py) at the encoder frame rate; FDDT (frame-level
diarization-dependent transformations) applies one learned affine
transform per STNO class — silence / target / non-target / overlap — as a
mask-weighted sum, once on the conv features and once before each of the
first N transformer layers (encoder.py:244-274). A CTC head over the
encoder output gives target-speaker transcripts (ctc_decoding.py); the
loss is `optax.ctc_loss`.

TPU-first: FDDT is 4 dense matmuls + a mask-weighted sum — fused by XLA
into the encoder's matmul chain; speakers fold into the batch axis
((B·S, T, D)) exactly like the TS-VAD backends.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from .whisper_encoder import WhisperEncoder, WhisperEncoderBlock, WhisperEncoderConfig, whisper_log_mel


def _scaled_eye_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        assert shape[0] == shape[1]
        return jnp.eye(shape[0], dtype=dtype) * scale

    return init


class FDDT(nn.Module):
    """Frame-level diarization-dependent transformation
    (encoder.py:352-478).

    One transform per STNO class, combined by the (B, 4, T) soft mask.
    Target/overlap transforms initialize to identity; silence/non-target to
    `non_target_rate`·I (attenuating frames the target doesn't own).
    `is_diagonal` uses per-channel scales; `bias_only` only adds a
    per-class bias vector.
    """

    d_model: int
    non_target_rate: float = 0.01
    is_diagonal: bool = False
    bias_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, stno_mask: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, D); stno_mask: (B, 4, T) rows [silence, target, non-target, overlap]
        m = stno_mask.astype(x.dtype)[..., None]  # (B, 4, T, 1)
        names = ("silence", "target", "non_target", "overlap")
        inits = (self.non_target_rate, 1.0, self.non_target_rate, 1.0)
        if self.bias_only:
            out = x
            for i, name in enumerate(names):
                b = self.param(f"{name}_bias", nn.initializers.zeros, (self.d_model,))
                out = out + m[:, i] * b.astype(x.dtype)
            return out
        if self.is_diagonal:
            out = jnp.zeros_like(x)
            for i, (name, iv) in enumerate(zip(names, inits)):
                w = self.param(f"{name}_scale", nn.initializers.constant(iv), (self.d_model,))
                b = self.param(f"{name}_bias", nn.initializers.zeros, (self.d_model,))
                out = out + m[:, i] * (x * w.astype(x.dtype) + b.astype(x.dtype))
            return out
        out = jnp.zeros_like(x)
        for i, (name, iv) in enumerate(zip(names, inits)):
            h = nn.Dense(
                self.d_model, dtype=self.dtype, name=f"{name}_linear",
                kernel_init=_scaled_eye_init(iv), bias_init=nn.initializers.zeros,
            )(x)
            out = out + m[:, i] * h
        return out


@dataclass(frozen=True)
class DiCoWConfig:
    whisper: WhisperEncoderConfig = field(default_factory=WhisperEncoderConfig)
    use_fddt: bool = True
    fddt_is_diagonal: bool = False
    fddt_bias_only: bool = False
    non_target_fddt_value: float = 0.01
    apply_fddt_to_n_layers: int = -1  # -1 → every layer
    vocab_size: int = 64  # CTC vocabulary (incl. blank at index 0)


class DiCoWEncoder(nn.Module):
    """Whisper encoder with STNO-mask FDDT conditioning + CTC head.

    Input audio/mel is shared per meeting; the per-speaker STNO masks fold
    speakers into the batch axis upstream. Returns (ctc_logits, hidden).
    """

    cfg: DiCoWConfig = DiCoWConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_or_audio: jnp.ndarray, stno_mask: jnp.ndarray | None = None):
        c = self.cfg.whisper
        if mel_or_audio.ndim == 2:
            mel = whisper_log_mel(mel_or_audio, c.n_mels)
        else:
            mel = mel_or_audio
        h = nn.Conv(c.d_model, (3,), padding=1, dtype=self.dtype, name="conv1")(mel.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(c.d_model, (3,), strides=(2,), padding=1, dtype=self.dtype, name="conv2")(h)
        h = nn.gelu(h, approximate=False)

        n_fddt = c.n_layers if self.cfg.apply_fddt_to_n_layers == -1 else self.cfg.apply_fddt_to_n_layers

        def fddt(name):
            return FDDT(
                c.d_model, non_target_rate=self.cfg.non_target_fddt_value,
                is_diagonal=self.cfg.fddt_is_diagonal, bias_only=self.cfg.fddt_bias_only,
                dtype=self.dtype, name=name,
            )

        if self.cfg.use_fddt and stno_mask is not None:
            # conditioning applied before positions (encoder.py:244-247)
            h = fddt("initial_fddt")(h, stno_mask[..., : h.shape[1]])

        from .transformer import sinusoidal_position_encoding

        pe = self.param(
            "embed_positions",
            lambda k: jnp.asarray(sinusoidal_position_encoding(c.n_ctx, c.d_model)),
        )
        h = h + pe[None, : h.shape[1]].astype(h.dtype)
        for i in range(c.n_layers):
            if self.cfg.use_fddt and stno_mask is not None and i < n_fddt:
                h = fddt(f"fddt_{i}")(h, stno_mask[..., : h.shape[1]])
            h = WhisperEncoderBlock(c, dtype=self.dtype, name=f"block_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(h)
        logits = nn.Dense(self.cfg.vocab_size, dtype=jnp.float32, name="ctc_head")(h.astype(jnp.float32))
        return logits, h


def ctc_loss(logits, logit_mask, labels, label_mask, blank_id: int = 0):
    """Mean CTC loss via optax (logits (B, T, V), labels (B, L) int32;
    masks 1 = padding as optax expects paddings)."""
    import optax

    per = optax.ctc_loss(logits, logit_mask, labels, label_mask, blank_id=blank_id)
    return jnp.mean(per)


def ctc_prefix_beam_search(
    log_probs,
    beam_size: int = 8,
    blank_id: int = 0,
    return_nbest: bool = False,
):
    """CTC prefix beam search over (T, V) log-probabilities.

    The host-side analogue of the reference's CTCPrefixScore rescoring
    (`egs/mlc_slm/dicow/ctc_decoding.py:11-211`): prefixes carry separate
    blank-ending / non-blank-ending probabilities, merged in log space.
    Returns the best label sequence (or the n-best list of
    (labels, logprob) when return_nbest=True)."""
    import numpy as np

    lp = np.asarray(log_probs, np.float64)
    T, V = lp.shape
    NEG = -np.inf

    def logsumexp2(a, b):
        if a == NEG:
            return b
        if b == NEG:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    # beams: prefix tuple → [p_blank, p_nonblank]
    beams = {(): [0.0, NEG]}
    for t in range(T):
        new: dict = {}

        def add(prefix, pb, pnb):
            cur = new.setdefault(prefix, [NEG, NEG])
            cur[0] = logsumexp2(cur[0], pb)
            cur[1] = logsumexp2(cur[1], pnb)

        for prefix, (pb, pnb) in beams.items():
            p_tot = logsumexp2(pb, pnb)
            # extend with blank: prefix unchanged, now blank-ending
            add(prefix, p_tot + lp[t, blank_id], NEG)
            # repeat last symbol: only the non-blank mass stays collapsed
            if prefix:
                add(prefix, NEG, pnb + lp[t, prefix[-1]])
            for v in range(V):
                if v == blank_id:
                    continue
                if prefix and v == prefix[-1]:
                    # new occurrence needs a blank in between
                    add(prefix + (v,), NEG, pb + lp[t, v])
                else:
                    add(prefix + (v,), NEG, p_tot + lp[t, v])
        beams = dict(
            sorted(new.items(), key=lambda kv: -logsumexp2(*kv[1]))[:beam_size]
        )
    nbest = sorted(
        ((list(k), logsumexp2(*v)) for k, v in beams.items()), key=lambda kv: -kv[1]
    )
    return nbest if return_nbest else nbest[0][0]


def ctc_greedy_decode(logits: jnp.ndarray, blank_id: int = 0):
    """Greedy CTC collapse: (T, V) or (B, T, V) → list of label lists."""
    import numpy as np

    arr = np.asarray(jnp.argmax(logits, axis=-1))
    if arr.ndim == 1:
        arr = arr[None]
    outs = []
    for seq in arr:
        prev = -1
        out = []
        for t in seq.tolist():
            if t != prev and t != blank_id:
                out.append(t)
            prev = t
        outs.append(out)
    return outs
