"""Chunked sliding-window inference over long recordings.

Reference semantics: `eend_eda/infer_eda.py:21-125` — sequential fixed-size
chunks, per-chunk model probabilities concatenated over the recording.
TPU-first: chunks are batched to a static (B, chunk_samples) shape so one
compiled program processes the whole corpus; the tail chunk is zero-padded
and masked.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..data.kaldi_io import KaldiData
from ..models.eend import FrontendConfig


def _chunk_starts(n_sub: int, chunk_frames: int) -> List[int]:
    if n_sub <= 0:
        return []
    starts = list(range(0, max(n_sub - chunk_frames, 0) + 1, chunk_frames))
    if starts[-1] + chunk_frames < n_sub:
        starts.append(n_sub - chunk_frames if n_sub >= chunk_frames else 0)
    return starts


def infer_recording(
    predict_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    audio: np.ndarray,
    frontend: FrontendConfig,
    chunk_frames: int = 500,
    batch_size: int = 8,
) -> np.ndarray:
    """Run chunked inference over one recording's samples.

    predict_fn: (audio (B, chunk_samples), frame_mask (B, T)) → probs (B, T, S)
    Returns (n_sub_frames, S) probabilities for the whole recording.
    """
    ss, shift = frontend.subsampling, frontend.frame_shift
    chunk_samples = frontend.chunk_samples(chunk_frames)
    n_sub = len(audio) // (ss * shift)
    if n_sub == 0:
        n_sub = 1
    # pad audio so every chunk is full-size
    n_chunks = (n_sub + chunk_frames - 1) // chunk_frames
    need = n_chunks * chunk_samples
    audio_p = np.pad(audio.astype(np.float32), (0, max(0, need - len(audio))))

    chunks, masks = [], []
    for ci in range(n_chunks):
        s = ci * chunk_samples
        chunks.append(audio_p[s : s + chunk_samples])
        valid = min(chunk_frames, n_sub - ci * chunk_frames)
        m = np.zeros((chunk_frames,), np.float32)
        m[:valid] = 1.0
        masks.append(m)

    outs = []
    for i in range(0, n_chunks, batch_size):
        b_audio = np.stack(chunks[i : i + batch_size])
        b_mask = np.stack(masks[i : i + batch_size])
        if len(b_audio) < batch_size:  # keep shapes static for XLA
            pad = batch_size - len(b_audio)
            b_audio = np.concatenate([b_audio, np.zeros((pad,) + b_audio.shape[1:], np.float32)])
            b_mask = np.concatenate([b_mask, np.zeros((pad,) + b_mask.shape[1:], np.float32)])
        probs = np.asarray(predict_fn(b_audio, b_mask))
        outs.append(probs[: min(batch_size, n_chunks - i)])
    probs = np.concatenate(outs, axis=0)  # (n_chunks, T, S)
    flat = probs.reshape(-1, probs.shape[-1])[: n_sub]
    return flat


def tsvad_infer_dataset(
    predict_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    dataset,
    batch_size: int = 16,
) -> Dict[str, np.ndarray]:
    """Overlapped-window TS-VAD inference with per-frame probability voting.

    Reference: ts_vad2/model.py:957-968 (res_dict accumulation) +
    infer.py:86-94 (mean over overlap votes). `dataset` must be a
    TSVADChunkDataset with is_train=False (canonical speaker order) and a
    small segment_shift so windows overlap.

    predict_fn: (audio (B, N), target_embs (B, S, D)) → probs (B, T25, S).
    Returns {rec: (n_frames, n_speakers_rec) mean probabilities}.
    """
    lr = dataset.label_rate
    sums: Dict[str, np.ndarray] = {}
    counts: Dict[str, np.ndarray] = {}
    for rec in dataset.rec_speakers:
        if dataset.kd.reco2dur and rec in dataset.kd.reco2dur:
            n = int(dataset.kd.reco2dur[rec] * lr)
        else:
            from ..data.wav import wav_info

            n = int(wav_info(dataset.kd.wavs[rec])["frames"] / dataset.rate * lr)
        S = len(dataset.rec_speakers[rec])
        sums[rec] = np.zeros((n, S), np.float64)
        counts[rec] = np.zeros((n, 1), np.float64)

    n_items = len(dataset)
    for i in range(0, n_items, batch_size):
        idxs = list(range(i, min(i + batch_size, n_items)))
        items = [dataset[j] for j in idxs]
        audio = np.stack([it["audio"] for it in items])
        embs = np.stack([it["target_embs"] for it in items])
        if len(items) < batch_size:  # static shapes for XLA
            pad = batch_size - len(items)
            audio = np.concatenate([audio, np.zeros((pad,) + audio.shape[1:], np.float32)])
            embs = np.concatenate([embs, np.zeros((pad,) + embs.shape[1:], np.float32)])
        probs = np.asarray(predict_fn(audio, embs))[: len(items)]
        for it, p in zip(items, probs):
            rec = it["rec"]
            st = it["start_frame"]
            n_spk = len(it["speakers"])
            en = min(st + p.shape[0], sums[rec].shape[0])
            sums[rec][st:en, :n_spk] += p[: en - st, :n_spk]
            counts[rec][st:en] += 1.0
    return {rec: (sums[rec] / np.maximum(counts[rec], 1.0)).astype(np.float32) for rec in sums}


def infer_dataset(
    predict_fn,
    data_dir: str,
    frontend: FrontendConfig,
    chunk_frames: int = 500,
    batch_size: int = 8,
) -> Dict[str, np.ndarray]:
    """Chunked inference over every recording in a Kaldi data dir.

    Returns {rec: (T_sub, S) probabilities}.
    """
    kd = KaldiData(data_dir)
    out = {}
    for rec in sorted(kd.wavs):
        audio, rate = kd.load_wav(rec)
        assert rate == frontend.sample_rate, (rate, frontend.sample_rate)
        out[rec] = infer_recording(predict_fn, audio, frontend, chunk_frames, batch_size)
    return out


def streaming_tsvad_infer_dataset(
    encode_fn: Callable[[np.ndarray], np.ndarray],
    step_fn: Callable[[np.ndarray, np.ndarray, dict], Tuple[np.ndarray, dict]],
    init_state_fn: Callable[[], dict],
    dataset,
    chunk_size: int,
    pad_block_s: float = 40.0,
) -> Dict[str, np.ndarray]:
    """Chunk-by-chunk streaming TS-VAD decode over every recording.

    Reference: ts_vad2_streaming/model.py:368-462 `forward_chunk_by_chunk` —
    the whole recording is decoded left-to-right through the per-layer KV
    ring caches, one attention chunk at a time.

    encode_fn: audio (1, N) → 25 Hz mix features (1, T, D) (the conv
    front-end is run once over the full recording, so the streaming output
    equals the offline chunk-masked forward exactly);
    step_fn: (mix_chunk (1, chunk, D), embs (1, S, Dspk), state) →
    (logits (1, chunk, S), state); init_state_fn: fresh per-recording state.
    `dataset` is a TSVADChunkDataset(is_train=False) used for the corpus
    wiring (recordings, canonical speaker order, mean target embeddings).
    Audio is zero-padded to a multiple of pad_block_s to bound the number
    of distinct compiled shapes. Returns {rec: (T25, S_rec) probs}.
    """
    lr = dataset.label_rate
    S = dataset.max_speakers if hasattr(dataset, "max_speakers") else 4
    out: Dict[str, np.ndarray] = {}
    for rec in sorted(dataset.rec_speakers):
        audio, rate = dataset.kd.load_wav(rec)
        assert rate == dataset.rate, (rate, dataset.rate)
        if audio.ndim > 1:
            audio = audio[:, 0]
        n_frames = int(len(audio) / rate * lr)
        block = int(pad_block_s * rate)
        padded = int(np.ceil(max(len(audio), 1) / block) * block)
        audio = np.pad(audio.astype(np.float32), (0, padded - len(audio)))

        speakers = list(dataset.rec_speakers[rec])
        embs = np.zeros((1, S, dataset.embs.dim), np.float32)
        for i, spk in enumerate(speakers[:S]):
            embs[0, i] = dataset._target_embedding(rec, spk)

        mix = np.asarray(encode_fn(audio[None]))  # (1, T, D)
        T = mix.shape[1]
        n_chunks = int(np.ceil(T / chunk_size))
        mix = np.pad(mix, ((0, 0), (0, n_chunks * chunk_size - T), (0, 0)))
        state = init_state_fn()
        probs = []
        for ci in range(n_chunks):
            logits, state = step_fn(mix[:, ci * chunk_size : (ci + 1) * chunk_size], embs, state)
            probs.append(1.0 / (1.0 + np.exp(-np.asarray(logits)[0])))
        p = np.concatenate(probs, axis=0)[:n_frames]
        out[rec] = p[:, : len(speakers)].astype(np.float32)
    return out
