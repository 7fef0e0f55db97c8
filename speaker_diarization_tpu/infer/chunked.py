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
    emb_key: str = "target_embs",
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
        embs = np.stack([it[emb_key] for it in items])
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


def make_streaming_window_predict(model, variables, n_label_frames: int):
    """Window-wise streaming TS-VAD predictor for `tsvad_infer_dataset`.

    Reference streaming inference (run_ts_vad2_streaming.sh:70-128 +
    ts_vad2_streaming/model.py:368-462): the recording is cut into the same
    overlapped rs_len windows as offline TS-VAD; each window is decoded
    chunk-by-chunk through the per-layer KV caches from a FRESH state
    (decoding_chunk_size frames at a time), and window probabilities are
    overlap-voted. Decoding whole recordings in one cache pass would push
    the absolute positional encoding far beyond the trained window length.

    TPU-first shape: the chunk loop is a `lax.scan` inside ONE jitted call
    per window batch — not a Python loop of per-chunk dispatches (which a
    high-latency link turns into the bottleneck).

    Returns predict_fn: (audio (B, N), embs (B, S, D)) → probs (B, T25, S).
    """
    import jax
    import jax.numpy as jnp

    chunk = model.cfg.chunk_size
    n_chunks = -(-n_label_frames // chunk)
    t_pad = n_chunks * chunk

    @jax.jit
    def predict(audio, embs):
        mix = model.apply(variables, audio, method=model.encode_frames)[:, :n_label_frames]
        B, T, D = mix.shape
        mix = jnp.pad(mix, ((0, 0), (0, t_pad - T), (0, 0)))
        chunks = mix.reshape(B, n_chunks, chunk, D).transpose(1, 0, 2, 3)
        state = model.apply(variables, B, method=model.streaming_state)

        def step(st, ch):
            logits, st2 = model.apply(variables, ch, embs, st, method=model.streaming_step_mix)
            return st2, logits

        _, out = jax.lax.scan(step, state, chunks)  # (n_chunks, B, chunk, S)
        out = out.transpose(1, 0, 2, 3).reshape(B, t_pad, -1)[:, :n_label_frames]
        return jax.nn.sigmoid(out)

    return predict
