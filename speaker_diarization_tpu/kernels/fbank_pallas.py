"""Fused spectral front-end Pallas kernels.

One kernel pattern serves both per-sample preprocessings in the framework:

- kaldi fbank (TS-VAD/SSND/OTS-VAD): hamming window, DC removal,
  preemphasis, kaldi mel, natural log (`fbank_pallas`);
- EEND log-mel ('logmel23'): centered hann window, slaney mel on the power
  spectrum, log10 (`logmel_pallas`).

Per tile: framing → elementwise preprocessing → windowed DFT as two MXU
matmuls → power → mel matmul → log, one pass through VMEM. Framing uses a
stride decomposition: audio reshaped to (rows, shift) makes frame t the
concatenation of rows t..t+k (plus a partial row), so the kernel receives
k+1 shifted views of one buffer (XLA aliases them) and every access is a
plain block load — no gather, no overlapping BlockSpecs.

Precision: plain bf16 loses ~0.4% on the spectrum, which explodes under
the log at near-floor mel bins (cancellation in the DFT); HIGHEST f32
costs 6 bf16 MXU passes per matmul. The kernel instead splits frames and
basis into bf16 hi+lo halves — fh@bh + fh@bl + fl@bh + fl@bl recovers the
f32 product to well under the test tolerances at 4 native bf16 passes of
ONE fused [cos|sin] matmul (vs 2 × 6 passes for HIGHEST) — and projects
mel with the same split (3 tiny passes). Validated against the host
oracles in tests/test_pallas_fbank.py; interpret mode runs on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import features as F

TILE_T = 128  # legacy floor; _fused_frontend picks an adaptive tile


def _frontend_kernel(*refs, n_pieces, preemph, remove_dc, log10, bins):
    row_refs = refs[:n_pieces]
    bh_ref, bl_ref, mel_ref, out_ref = refs[n_pieces : n_pieces + 4]
    frames = jnp.concatenate([r[0] for r in row_refs], axis=1)  # (T, win)
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    if preemph:
        prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemph * prev
    # DFT as bf16 split-matmuls against the fused [cos|sin] basis.
    # frames = fh + fl (each exactly representable in bf16); basis = bh + bl.
    # fh@bh + (fh@bl + fl@bh) ≈ f32 product to ~1e-5 relative — 3 native
    # bf16 MXU passes instead of HIGHEST's 6, and one fused N=2·bins matmul
    # instead of two separate ones.
    fh = frames.astype(jnp.bfloat16)
    fl = (frames - fh.astype(jnp.float32)).astype(jnp.bfloat16)
    bh, bl = bh_ref[:], bl_ref[:]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    spec2 = dot(fh, bh) + (dot(fh, bl) + dot(fl, bh) + dot(fl, bl))  # (T, 2*bins)
    re, im = spec2[:, :bins], spec2[:, bins:]
    pspec = re * re + im * im
    # mel projection with the same hi/lo split (the matmul is tiny next to
    # the DFT, and one bf16 pass alone costs ~4e-3 after the log)
    ph = pspec.astype(jnp.bfloat16)
    pl_ = (pspec - ph.astype(jnp.float32)).astype(jnp.bfloat16)
    mel = mel_ref[:]
    mh = mel.astype(jnp.bfloat16)
    ml = (mel - mh.astype(jnp.float32)).astype(jnp.bfloat16)
    melspec = dot(ph, mh) + (dot(ph, ml) + dot(pl_, mh))
    floored = jnp.maximum(melspec, np.finfo(np.float32).eps if not log10 else 1e-10)
    out_ref[0] = jnp.log(floored) * (1.0 / np.log(10.0) if log10 else 1.0)


def _fused_frontend(
    x: jnp.ndarray,  # (B, N) already scaled/padded as desired
    n_frames: int,
    win: int,
    shift: int,
    cos_basis: np.ndarray,  # (win, bins) window-folded
    sin_basis: np.ndarray,
    mel_T: np.ndarray,  # (bins, n_mels)
    preemph: float,
    remove_dc: bool,
    log10: bool,
    interpret: bool,
) -> jnp.ndarray:
    B = x.shape[0]
    # Adaptive time tile: the per-step compute is ~µs against a ~10 µs
    # grid-step overhead, so fine tiles leave the kernel overhead-bound
    # (measured 4.5 ms for batch 64 × 398 frames with TILE_T=128 — 256
    # grid steps; one tile per item cuts it to B steps). Cap at 512
    # frames to bound the VMEM working set.
    tile_t = min(512, -(-n_frames // 8) * 8)
    n_tiles = -(-n_frames // tile_t)
    Trows = n_tiles * tile_t
    n_full = win // shift
    rem = win - n_full * shift
    n_pieces = n_full + (1 if rem else 0)
    pad_to = (Trows + n_pieces) * shift
    x = jnp.pad(x, ((0, 0), (0, max(0, pad_to - x.shape[1]))))[:, :pad_to]
    rows = x.reshape(B, Trows + n_pieces, shift)
    views = [rows[:, i : i + Trows] for i in range(n_full)]
    widths = [shift] * n_full
    if rem:
        views.append(rows[:, n_full : n_full + Trows, :rem])
        widths.append(rem)

    n_mels = mel_T.shape[1]
    bins = cos_basis.shape[1]
    basis = np.concatenate([cos_basis, sin_basis], axis=1).astype(np.float32)  # (win, 2*bins)
    # hi/lo split computed host-side in NumPy (this function runs under jit
    # traces — jnp arrays here would be tracers)
    import ml_dtypes

    basis_h_np = basis.astype(ml_dtypes.bfloat16)
    basis_l_np = (basis - basis_h_np.astype(np.float32)).astype(ml_dtypes.bfloat16)
    basis_h = jnp.asarray(basis_h_np)
    basis_l = jnp.asarray(basis_l_np)
    out = pl.pallas_call(
        functools.partial(
            _frontend_kernel, n_pieces=n_pieces, preemph=preemph, remove_dc=remove_dc,
            log10=log10, bins=bins,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Trows, n_mels), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_t, w), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM) for w in widths
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, tile_t, n_mels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*views, basis_h, basis_l, jnp.asarray(mel_T))
    return out[:, :n_frames]


# ---------------------------------------------------------------------------
# kaldi fbank
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _kaldi_consts(sample_rate: int, num_mel_bins: int, win: int, n_fft: int):
    cos_b, sin_b = F._dft_basis(n_fft)
    window = F._hamming_window(win).astype(np.float32)
    mel = F.kaldi_mel_banks(num_mel_bins, n_fft, sample_rate)
    return (cos_b[:win] * window[:, None]).astype(np.float32), (sin_b[:win] * window[:, None]).astype(
        np.float32
    ), mel.T.copy()


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
    n_fft = F.fft_size_for(win)
    T = 1 + (audio.shape[1] - win) // shift
    x = audio.astype(jnp.float32)
    if scale_to_int16:
        x = x * 32768.0
    cosw, sinw, melT = _kaldi_consts(sample_rate, num_mel_bins, win, n_fft)
    feats = _fused_frontend(x, T, win, shift, cosw, sinw, melT, preemphasis, True, False, interpret)
    if mean_norm:
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    return feats


# ---------------------------------------------------------------------------
# EEND log-mel ('logmel23' family)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _logmel_consts(sample_rate: int, n_mels: int, win: int, n_fft: int):
    cos_b, sin_b = F._dft_basis(n_fft)
    window = F.pad_center(F.hann_window(win), n_fft).astype(np.float32)
    mel = F.mel_filterbank(sample_rate, n_fft, n_mels)  # slaney
    return (cos_b * window[:, None]).astype(np.float32), (sin_b * window[:, None]).astype(np.float32), mel.T.copy()


def logmel_pallas(
    audio: jnp.ndarray,
    n_frames: int,
    frame_size: int = 200,
    frame_shift: int = 80,
    sample_rate: int = 8000,
    n_mels: int = 23,
    mean_norm: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N) → (B, n_frames, n_mels): centered hann stft → slaney mel of the
    power spectrum → log10 (== ops.features.logmel_frames_jax)."""
    n_fft = F.fft_size_for(frame_size)
    pad = n_fft // 2
    x = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)))
    cosw, sinw, melT = _logmel_consts(sample_rate, n_mels, frame_size, n_fft)
    feats = _fused_frontend(x, n_frames, n_fft, frame_shift, cosw, sinw, melT, 0.0, False, True, interpret)
    if mean_norm:
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)
    return feats
