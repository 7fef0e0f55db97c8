"""Neural voice-activity detection (system SAD).

TPU-native stand-in for the silero-vad ONNX model the reference runs on host
(`egs/alimeeting/spectral_cluster/make_system_sad.py:32-57`: per-window speech
probabilities → `get_speech_timestamps` hysteresis → SAD segments). Since the
silero weights are not redistributable here, this is a small trainable
causal model with the same contract:

- `NeuralVAD` — log-mel front-end (on-device, MXU matmul DFT) → causal conv
  stack → unidirectional LSTM (`lax.scan`) → per-frame speech probability at
  the 10 ms feature rate. Fully causal, so it is streaming-capable.
- `get_speech_timestamps` — silero's post-processing semantics: trigger at
  `threshold`, release below `neg_threshold` (default threshold−0.15) after
  `min_silence_s`, drop islands shorter than `min_speech_s`, pad by `pad_s`.
- `neural_sad` — audio → [(start, end), ...] segments, pluggable as the `sad`
  argument of `infer.clustering.cluster_recording` and as the system SAD
  ahead of TS-VAD (the reference's system_rttm→ts_vad composition).

Train with `make_vad_labels` + BCE on any diarization corpus (oracle SAD
labels come free from RTTM).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.features import count_frames, logmel_frames_jax


@dataclass(frozen=True)
class NeuralVADConfig:
    sample_rate: int = 16000
    frame_size: int = 400  # 25 ms
    frame_shift: int = 160  # 10 ms → prob rate 100 Hz
    n_mels: int = 40
    conv_channels: Tuple[int, ...] = (48, 48)
    conv_kernel: int = 5
    lstm_hidden: int = 64

    @property
    def frame_shift_s(self) -> float:
        return self.frame_shift / self.sample_rate


class NeuralVAD(nn.Module):
    """(B, samples) audio → (B, T) per-frame speech logits at 100 Hz."""

    cfg: NeuralVADConfig = NeuralVADConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        n_frames = count_frames(audio.shape[-1], c.frame_shift)
        # mean_norm=False: utterance-level mean subtraction would leak the
        # future into every frame and break causality/streaming
        x = logmel_frames_jax(
            audio, n_frames, c.frame_size, c.frame_shift, c.sample_rate, c.n_mels,
            mean_norm=False,
        ).astype(self.dtype)
        for ch in c.conv_channels:
            x = nn.Conv(ch, (c.conv_kernel,), padding="CAUSAL", dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.relu(x)
        cell = nn.OptimizedLSTMCell(c.lstm_hidden, dtype=self.dtype, name="lstm")
        y = nn.RNN(cell, name="rnn")(x)
        logits = nn.Dense(1, dtype=self.dtype)(y)[..., 0]
        return logits.astype(jnp.float32)


def make_vad_labels(
    sad: List[Tuple[float, float]], n_frames: int, frame_shift_s: float
) -> np.ndarray:
    """(start, end) speech regions → per-frame 0/1 labels at the prob rate."""
    lab = np.zeros(n_frames, np.float32)
    for s, e in sad:
        lab[max(0, int(round(s / frame_shift_s))) : max(0, int(round(e / frame_shift_s)))] = 1.0
    return lab


def get_speech_timestamps(
    probs: np.ndarray,
    frame_shift_s: float,
    threshold: float = 0.5,
    neg_threshold: Optional[float] = None,
    min_speech_s: float = 0.25,
    min_silence_s: float = 0.10,
    pad_s: float = 0.03,
) -> List[Tuple[float, float]]:
    """Silero-style hysteresis over per-frame speech probabilities
    (silero_vad.get_speech_timestamps semantics, as driven by
    make_system_sad.py:50-68)."""
    if neg_threshold is None:
        neg_threshold = max(threshold - 0.15, 0.01)
    min_sil = int(round(min_silence_s / frame_shift_s))
    segs: List[Tuple[int, int]] = []
    triggered = False
    start = 0
    tmp_end = -1
    for i, p in enumerate(np.asarray(probs, np.float64)):
        if not triggered:
            if p >= threshold:
                triggered, start, tmp_end = True, i, -1
        else:
            if p >= threshold:
                tmp_end = -1
            elif p < neg_threshold:
                if tmp_end < 0:
                    tmp_end = i
                if i - tmp_end >= min_sil:
                    segs.append((start, tmp_end))
                    triggered, tmp_end = False, -1
    if triggered:
        segs.append((start, tmp_end if tmp_end > 0 else len(probs)))

    out: List[Tuple[float, float]] = []
    for s, e in segs:
        b, en = s * frame_shift_s, e * frame_shift_s
        if en - b < min_speech_s:
            continue
        out.append((max(0.0, b - pad_s), en + pad_s))
    # merge padding-induced overlaps
    merged: List[List[float]] = []
    for b, en in out:
        if merged and b <= merged[-1][1] + 1e-9:
            merged[-1][1] = max(merged[-1][1], en)
        else:
            merged.append([b, en])
    return [(b, en) for b, en in merged]


def save_vad_params(path: str, variables) -> None:
    """Serialize VAD variables (flax msgpack) for CLI `cluster --vad-ckpt`."""
    import flax.serialization

    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))


def load_vad_params(path: str, model: NeuralVAD, rate: int = 16000):
    """Load variables saved by save_vad_params."""
    import flax.serialization

    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, rate), jnp.float32))
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def neural_sad(
    audio: np.ndarray,
    rate: int,
    model: NeuralVAD,
    variables,
    threshold: float = 0.5,
    min_duration_s: float = 0.0,
    chunk_s: float = 30.0,
    apply_fn=None,
) -> List[Tuple[float, float]]:
    """Whole-recording system SAD: chunked jit forward → probs → timestamps.

    `min_duration_s` mirrors make_system_sad.py's --min-duration filter.
    """
    c = model.cfg
    assert rate == c.sample_rate, (rate, c.sample_rate)
    if apply_fn is None:
        apply_fn = jax.jit(model.apply)
    chunk = int(chunk_s * rate)
    # pad to a whole number of fixed-size chunks (one compiled shape)
    n_chunks = max(1, int(np.ceil(len(audio) / chunk)))
    padded = np.zeros(n_chunks * chunk, np.float32)
    padded[: len(audio)] = audio
    probs = []
    for i in range(n_chunks):
        logits = apply_fn(variables, jnp.asarray(padded[None, i * chunk : (i + 1) * chunk]))
        probs.append(np.asarray(jax.nn.sigmoid(logits))[0])
    p = np.concatenate(probs)[: count_frames(len(audio), c.frame_shift)]
    segs = get_speech_timestamps(p, c.frame_shift_s, threshold=threshold)
    return [(b, e) for b, e in segs if e - b >= min_duration_s]
