"""EEND-EDA variable-speaker inference.

Reference: `eend_eda/infer_eda.py:21-125` + attractor selection at
`eend_eda/models.py:639-651` — decode up to max_attractors per chunk, keep
attractors until the first whose existence probability drops below the
threshold, concatenate chunk posteriors over the recording.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from ..data.kaldi_io import KaldiData
from ..models.eend import FrontendConfig
from .chunked import _chunk_starts


def select_speakers(exist_probs: np.ndarray, threshold: float = 0.5, max_speakers: int | None = None) -> int:
    """Number of active attractors: index of first prob < threshold."""
    below = np.nonzero(exist_probs < threshold)[0]
    n = int(below[0]) if len(below) else len(exist_probs)
    if max_speakers is not None:
        n = min(n, max_speakers)
    return n


def eda_infer_recording(
    predict_fn: Callable[[np.ndarray, np.ndarray], tuple],
    audio: np.ndarray,
    frontend: FrontendConfig,
    chunk_frames: int = 500,
    threshold: float = 0.5,
    max_speakers: int | None = None,
) -> np.ndarray:
    """Chunked EDA inference → (n_sub_frames, n_spk_max_over_chunks) probs.

    predict_fn: (audio (1, chunk_samples), frame_mask (1, T)) →
    (probs (1, T, A), exist_probs (1, A)). Chunk speaker orders are
    concatenated as-is (the reference does the same; EEND-VC adds
    cross-chunk alignment).
    """
    ss, shift = frontend.subsampling, frontend.frame_shift
    chunk_samples = frontend.chunk_samples(chunk_frames)
    n_sub = max(len(audio) // (ss * shift), 1)
    n_chunks = (n_sub + chunk_frames - 1) // chunk_frames
    need = n_chunks * chunk_samples
    audio_p = np.pad(audio.astype(np.float32), (0, max(0, need - len(audio))))

    chunk_probs = []
    n_spks = []
    for ci in range(n_chunks):
        s = ci * chunk_samples
        a = audio_p[s : s + chunk_samples][None]
        valid = min(chunk_frames, n_sub - ci * chunk_frames)
        m = np.zeros((1, chunk_frames), np.float32)
        m[0, :valid] = 1.0
        probs, exist = predict_fn(a, m)
        probs, exist = np.asarray(probs)[0], np.asarray(exist)[0]
        n = select_speakers(exist, threshold, max_speakers)
        chunk_probs.append(probs[:valid, :n])
        n_spks.append(n)

    S = max(n_spks) if n_spks else 0
    out = np.zeros((n_sub, max(S, 1)), np.float32)
    pos = 0
    for p in chunk_probs:
        out[pos : pos + p.shape[0], : p.shape[1]] = p
        pos += p.shape[0]
    return out


def eda_infer_dataset(
    predict_fn,
    data_dir: str,
    frontend: FrontendConfig,
    chunk_frames: int = 500,
    threshold: float = 0.5,
    max_speakers: int | None = None,
) -> Dict[str, np.ndarray]:
    kd = KaldiData(data_dir)
    out = {}
    for rec in sorted(kd.wavs):
        audio, rate = kd.load_wav(rec)
        assert rate == frontend.sample_rate
        out[rec] = eda_infer_recording(predict_fn, audio, frontend, chunk_frames, threshold, max_speakers)
    return out
