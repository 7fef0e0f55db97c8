"""Fused kaldi-fbank Pallas kernel: framing → preemphasis → window → DFT
(as MXU matmuls) → power → mel → log, one pass through VMEM.

The log-mel front-end is the per-sample preprocessing of every model family;
fusing it avoids materializing the (T, 400) frame tensor and the (T, 257)
spectrum in HBM. Framing uses a stride-decomposition trick: with
win = 2·shift + r, audio reshaped to (rows, shift) makes frame t the
concatenation of rows [t, t+1] and the first r columns of row t+2 — the
kernel receives three shifted views of the same row buffer (XLA aliases
them), so every access is a plain block load, no gather, no overlap.

Matches ops.features.kaldi_fbank_jax (same DFT/mel constants); validated in
tests/test_pallas_fbank.py; interpret mode runs on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import features as F

TILE_T = 128


@functools.lru_cache(maxsize=4)
def _consts(sample_rate: int, num_mel_bins: int, win: int, n_fft: int):
    cos_b, sin_b = F._dft_basis(n_fft)
    window = F._hamming_window(win).astype(np.float32)
    mel = F.kaldi_mel_banks(num_mel_bins, n_fft, sample_rate)  # (M, bins)
    # fold the hamming window into the DFT bases: (w ⊙ x)·B == x·(w[:,None]·B)
    cosw = (cos_b[:win] * window[:, None]).astype(np.float32)
    sinw = (sin_b[:win] * window[:, None]).astype(np.float32)
    return cosw, sinw, window, mel.T.copy()


def _fbank_kernel(r0_ref, r1_ref, r2_ref, cos_ref, sin_ref, mel_ref, out_ref, *, preemph):
    # r0/r1: (1, T, shift); r2: (1, T, r) — stride-decomposed frame pieces
    frames = jnp.concatenate([r0_ref[0], r1_ref[0], r2_ref[0]], axis=1)  # (T, win)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)  # remove DC
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - preemph * prev  # preemphasis (first sample vs itself)
    # window is folded into cos/sin bases; HIGHEST precision: bf16 MXU
    # passes lose ~0.4% on the spectrum, which explodes under the log at
    # near-floor mel bins
    hp = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32, precision=hp)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32, precision=hp)
    pspec = re * re + im * im
    melspec = jnp.dot(pspec, mel_ref[:], preferred_element_type=jnp.float32, precision=hp)
    out_ref[0] = jnp.log(jnp.maximum(melspec, np.finfo(np.float32).eps))


def fbank_pallas(
    audio: jnp.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    scale_to_int16: bool = True,
    mean_norm: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N) float audio → (B, T, num_mel_bins) kaldi fbank, fused on TPU."""
    win = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    r = win - 2 * shift
    assert 0 < r <= shift, f"need shift < win ≤ 3·shift, got win={win} shift={shift}"
    n_fft = F.fft_size_for(win)
    B, N = audio.shape
    T = 1 + (N - win) // shift

    x = audio.astype(jnp.float32)
    if scale_to_int16:
        x = x * 32768.0

    n_tiles = -(-T // TILE_T)
    rows_needed = n_tiles * TILE_T + 2
    pad_to = (rows_needed + 1) * shift
    x = jnp.pad(x, ((0, 0), (0, max(0, pad_to - N))))[:, :pad_to]
    rows = x.reshape(B, rows_needed + 1, shift)
    Trows = n_tiles * TILE_T
    rows0 = rows[:, 0:Trows]
    rows1 = rows[:, 1 : 1 + Trows]
    rows2 = rows[:, 2 : 2 + Trows, :r]

    cosw, sinw, _, melT = _consts(sample_rate, num_mel_bins, win, n_fft)

    out = pl.pallas_call(
        functools.partial(_fbank_kernel, preemph=preemphasis),
        out_shape=jax.ShapeDtypeStruct((B, Trows, num_mel_bins), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, TILE_T, shift), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, shift), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T, r), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, num_mel_bins), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rows0, rows1, rows2, jnp.asarray(cosw), jnp.asarray(sinw), jnp.asarray(melT))
    feats = out[:, :T]
    if mean_norm:
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    return feats
