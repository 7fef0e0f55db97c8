"""Audio feature front-end: STFT / log-mel / splice / subsample.

Behavioral parity with the reference front-end
(`/root/reference/speaker_diarization/feature.py:24-184`, librosa 0.10.2
semantics) but a TPU-first design:

- The host path (`stft`, `transform`, `splice`, `subsample`) is plain NumPy,
  bit-compatible with the reference pipeline so golden features match.
- The device path (`logmel_frames_jax`, `LogMelFrontend`) is batched,
  jit-able JAX that expresses the DFT as two real matmuls (cos/sin basis)
  so the whole front-end — framing, windowing, spectrum, mel projection —
  lowers onto the MXU as a chain of fused matmuls instead of an FFT butterfly
  (n_fft is 256-1024 here; a dense DFT at these sizes is MXU-friendly and
  fuses with the mel matmul).

No librosa dependency: the mel filterbank (Slaney scale + norm, the librosa
default) and the periodic Hann window are implemented from their standard
definitions and validated against golden values in tests/test_features.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Window + mel filterbank construction (host-side constants)
# ---------------------------------------------------------------------------


def hann_window(win_length: int, dtype=np.float64) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, as used by librosa.stft."""
    n = np.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def pad_center(window: np.ndarray, size: int) -> np.ndarray:
    """Center-pad a window to `size` samples (librosa util.pad_center)."""
    lpad = (size - len(window)) // 2
    return np.pad(window, (lpad, size - len(window) - lpad))


def _hz_to_mel_slaney(f):
    f = np.asanyarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep, mels)


def _mel_to_hz_slaney(m):
    m = np.asanyarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asanyarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asanyarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, (n_mels, 1 + n_fft//2).

    Matches librosa.filters.mel defaults (Slaney mel scale, Slaney area
    normalization) used throughout the reference's `transform()` family.
    """
    if fmax is None:
        fmax = sr / 2.0
    hz_to_mel = _hz_to_mel_htk if htk else _hz_to_mel_slaney
    mel_to_hz = _mel_to_hz_htk if htk else _mel_to_hz_slaney

    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    mel_f = mel_to_hz(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unsupported mel norm: {norm}")
    return weights.astype(dtype)


def fft_size_for(frame_size: int) -> int:
    """Round frame_size up to the next power of two (reference stft:178)."""
    return 1 << (frame_size - 1).bit_length()


# ---------------------------------------------------------------------------
# Host (NumPy) path — reference-parity feature extraction
# ---------------------------------------------------------------------------


def count_frames(data_len: int, frame_shift: int) -> int:
    """Number of STFT frames for centered framing with the reference's
    drop-excessive-last-frame rule (feature.py:188-192)."""
    n = 1 + data_len // frame_shift
    if data_len % frame_shift == 0:
        n -= 1
    return n


def stft(data: np.ndarray, frame_size: int = 400, frame_shift: int = 160) -> np.ndarray:
    """Centered STFT, (n_frames, 1 + n_fft//2) complex64.

    librosa-0.10.2-compatible: constant (zero) edge padding of n_fft//2,
    periodic Hann of `frame_size` center-padded to n_fft. The final frame is
    dropped when len(data) % frame_shift == 0, mirroring the reference.
    """
    n_fft = fft_size_for(frame_size)
    window = pad_center(hann_window(frame_size), n_fft).astype(data.dtype if data.dtype.kind == "f" else np.float32)
    pad = n_fft // 2
    y = np.pad(np.asarray(data, dtype=np.float32), (pad, pad))
    n_frames = count_frames(len(data), frame_shift)
    idx = np.arange(n_fft)[None, :] + frame_shift * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    return np.fft.rfft(frames, n=n_fft, axis=-1).astype(np.complex64)


def transform(
    Y: np.ndarray,
    transform_type: Optional[str] = None,
    dtype=np.float32,
    sample_rate: int = 16000,
) -> np.ndarray:
    """STFT-magnitude → feature transform family (reference feature.py:24-119).

    Supported: None, 'log', 'logmel', 'logmel23', 'logmel23_mn',
    'logmel23_swn', 'logmel23_mvn', 'logmel23_espnet'.
    """
    Y = np.abs(Y)
    if not transform_type:
        pass
    elif transform_type == "log":
        Y = np.log(np.maximum(Y, 1e-10))
    elif transform_type in ("logmel", "logmel23", "logmel23_mn", "logmel23_swn", "logmel23_mvn"):
        n_fft = 2 * (Y.shape[1] - 1)
        n_mels = 40 if transform_type == "logmel" else 23
        mel = mel_filterbank(sample_rate, n_fft, n_mels, dtype=np.float64)
        Y = np.log10(np.maximum(Y.astype(np.float64) ** 2 @ mel.T, 1e-10))
        if transform_type == "logmel23_mn":
            Y = Y - Y.mean(axis=0)
        elif transform_type == "logmel23_mvn":
            Y = Y - Y.mean(axis=0)
            Y = Y / np.maximum(Y.std(axis=0), 1e-10)
        elif transform_type == "logmel23_swn":
            Y = Y - speech_weighted_mean(Y)
    elif transform_type == "logmel23_espnet":
        n_fft = 2 * (Y.shape[1] - 1)
        mel = mel_filterbank(sample_rate, n_fft, 23, fmin=0, fmax=sample_rate / 2, dtype=np.float64)
        Y = np.log10(np.maximum(Y.astype(np.float64) @ mel.T, 1e-10))
    else:
        raise ValueError(f"Unknown transform_type: {transform_type}")
    return Y.astype(dtype)


def speech_weighted_mean(Y: np.ndarray) -> np.ndarray:
    """2-means-thresholded speech-frame mean (reference 'swn', feature.py:85-92)."""
    powers = np.sum(Y, axis=1)
    th = (np.max(powers) + np.min(powers)) / 2.0
    for _ in range(10):
        hi = powers[powers >= th]
        lo = powers[powers < th]
        if len(hi) == 0 or len(lo) == 0:
            break
        th = (np.mean(hi) + np.mean(lo)) / 2
    sel = Y[powers > th, :]
    if sel.shape[0] == 0:
        sel = Y
    return np.mean(sel, axis=0)


def subsample(Y: np.ndarray, T: Optional[np.ndarray] = None, subsampling: int = 1):
    """Frame subsampling (take every k-th frame)."""
    if T is None:
        return Y[::subsampling]
    return Y[::subsampling], T[::subsampling]


def splice(Y: np.ndarray, context_size: int = 0) -> np.ndarray:
    """Frame splicing: concat ±context_size neighbor frames per frame.

    (n_frames, d) → (n_frames, d * (2*context_size + 1)); edges zero-padded.
    """
    if context_size == 0:
        return Y
    n, d = Y.shape
    Y_pad = np.pad(Y, [(context_size, context_size), (0, 0)])
    cols = [Y_pad[i : i + n] for i in range(2 * context_size + 1)]
    return np.concatenate(cols, axis=1)


def get_input_dim(frame_size: int, context_size: int, transform_type: str) -> int:
    if transform_type.startswith("logmel23"):
        base = 23
    elif transform_type == "logmel":
        base = 40
    else:
        base = fft_size_for(frame_size) // 2 + 1
    return (2 * context_size + 1) * base


# ---------------------------------------------------------------------------
# Device (JAX) path — batched, jit-able, MXU-friendly
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int):
    """Real/imag DFT basis matrices (n_fft, n_bins) as float32 numpy."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None] * np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * t / n_fft
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def frame_signal_jax(audio: jnp.ndarray, frame_size: int, frame_shift: int, n_frames: int) -> jnp.ndarray:
    """Batched centered framing: (..., n_samples) → (..., n_frames, n_fft).

    Zero ('constant') edge padding of n_fft//2 on both sides, matching the
    host stft(); n_frames must be computed statically via count_frames().
    """
    n_fft = fft_size_for(frame_size)
    pad = n_fft // 2
    y = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)])
    starts = frame_shift * np.arange(n_frames)
    # gather frames via advanced indexing on the last axis (static indices)
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return y[..., idx]


def power_spectrum_jax(frames: jnp.ndarray, frame_size: int) -> jnp.ndarray:
    """Windowed power spectrum via DFT-as-matmul: (..., T, n_fft) → (..., T, n_bins)."""
    n_fft = frames.shape[-1]
    window = jnp.asarray(pad_center(hann_window(frame_size), n_fft).astype(np.float32))
    cos_b, sin_b = _dft_basis(n_fft)
    xw = frames * window
    # HIGHEST precision: the DFT basis matmul is parity-critical vs the FFT
    # host path; on TPU this selects f32-accurate MXU passes (small matrices,
    # negligible cost next to the encoder).
    re = jnp.matmul(xw, jnp.asarray(cos_b), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(xw, jnp.asarray(sin_b), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    return re * re + im * im


def logmel_frames_jax(
    audio: jnp.ndarray,
    n_frames: int,
    frame_size: int = 400,
    frame_shift: int = 160,
    sample_rate: int = 16000,
    n_mels: int = 23,
    mean_norm: bool = True,
) -> jnp.ndarray:
    """Fused batched log-mel front-end: (..., n_samples) → (..., n_frames, n_mels).

    Equivalent to stft→|.|²→mel→log10→(per-chunk mean-norm) of the host path
    ('logmel23_mn' family) but expressed as matmuls for the MXU.
    """
    n_fft = fft_size_for(frame_size)
    frames = frame_signal_jax(audio, frame_size, frame_shift, n_frames)
    pspec = power_spectrum_jax(frames, frame_size)
    mel = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    melspec = jnp.matmul(pspec, mel.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    logmel = jnp.log10(jnp.maximum(melspec, 1e-10))
    if mean_norm:
        logmel = logmel - jnp.mean(logmel, axis=-2, keepdims=True)
    return logmel


# ---------------------------------------------------------------------------
# Kaldi-style fbank (torchaudio.compliance.kaldi.fbank semantics)
# ---------------------------------------------------------------------------
# Used by the TS-VAD stack: the reference extracts 80-dim kaldi fbank with a
# hamming window and mean-norm as CAM++ input (ts_vad_dataset.py:29-57).


def _hamming_window(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.float64)
    return 0.54 - 0.46 * np.cos(2 * np.pi * i / (n - 1))


@functools.lru_cache(maxsize=8)
def kaldi_mel_banks(num_bins: int, n_fft: int, sample_rate: int, low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi mel filterbank, (num_bins, n_fft//2 + 1); triangles are computed
    in mel space on FFT-bin center frequencies; the nyquist bin gets weight 0."""
    if high_freq <= 0:
        high_freq = sample_rate / 2.0 + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)  # noqa: E731
    mel_lo, mel_hi = mel(low_freq), mel(high_freq)
    delta = (mel_hi - mel_lo) / (num_bins + 1)
    fft_freqs = np.arange(n_fft // 2) * sample_rate / n_fft  # kaldi: excludes nyquist
    fft_mels = mel(fft_freqs)
    weights = np.zeros((num_bins, n_fft // 2 + 1), dtype=np.float64)
    for b in range(num_bins):
        left, center, right = mel_lo + b * delta, mel_lo + (b + 1) * delta, mel_lo + (b + 2) * delta
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        weights[b, : n_fft // 2] = np.clip(np.minimum(up, down), 0.0, None)
    return weights.astype(np.float32)


def kaldi_fbank(
    waveform: np.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    dither: float = 0.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    scale_to_int16: bool = True,
    mean_norm: bool = False,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Host NumPy kaldi fbank: (n_samples,) float ∈ [-1,1] → (T, num_mel_bins).

    snip_edges=True framing, hamming window, natural-log mel energies.
    """
    x = np.asarray(waveform, dtype=np.float64)
    if scale_to_int16:
        x = x * 32768.0
    win = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    n_fft = fft_size_for(win)
    if len(x) < win:
        return np.zeros((0, num_mel_bins), np.float32)
    n_frames = 1 + (len(x) - win) // shift
    idx = np.arange(win)[None, :] + shift * np.arange(n_frames)[:, None]
    frames = x[idx]
    if dither != 0.0:
        rng = rng or np.random.default_rng()
        frames = frames + dither * rng.standard_normal(frames.shape)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis != 0.0:
        first = frames[:, :1] - preemphasis * frames[:, :1]
        frames = np.concatenate([first, frames[:, 1:] - preemphasis * frames[:, :-1]], axis=1)
    frames = frames * _hamming_window(win)[None, :]
    spec = np.abs(np.fft.rfft(frames, n=n_fft, axis=1)) ** 2
    mel = kaldi_mel_banks(num_mel_bins, n_fft, sample_rate)
    feats = spec @ mel.T
    feats = np.log(np.maximum(feats, np.finfo(np.float32).eps))
    feats = feats.astype(np.float32)
    if mean_norm:
        feats = feats - feats.mean(axis=0, keepdims=True)
    return feats


def kaldi_fbank_jax(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    scale_to_int16: bool = True,
    mean_norm: bool = True,
) -> jnp.ndarray:
    """Batched on-device kaldi fbank: (..., n) → (..., T, num_mel_bins).

    DFT-as-matmul like the EEND front-end; no dither (inference/training on
    TPU keeps the host pipeline deterministic — dither only matters for the
    silence floor of the log).
    """
    x = waveform.astype(jnp.float32)
    if scale_to_int16:
        x = x * 32768.0
    win = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    n_fft = fft_size_for(win)
    n = x.shape[-1]
    n_frames = 1 + (n - win) // shift
    starts = shift * np.arange(n_frames)
    idx = starts[:, None] + np.arange(win)[None, :]
    frames = x[..., idx]  # (..., T, win)
    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis != 0.0:
        first = frames[..., :1] * (1.0 - preemphasis)
        frames = jnp.concatenate([first, frames[..., 1:] - preemphasis * frames[..., :-1]], axis=-1)
    window = jnp.asarray(_hamming_window(win).astype(np.float32))
    fw = frames * window
    cos_b, sin_b = _dft_basis(n_fft)
    # frames are win<n_fft wide; zero-pad via slicing the basis rows
    cb = jnp.asarray(cos_b[:win])
    sb = jnp.asarray(sin_b[:win])
    re = jnp.matmul(fw, cb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(fw, sb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    spec = re * re + im * im
    mel = jnp.asarray(kaldi_mel_banks(num_mel_bins, n_fft, sample_rate))
    feats = jnp.matmul(spec, mel.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    feats = jnp.log(jnp.maximum(feats, np.finfo(np.float32).eps))
    if mean_norm:
        feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
    return feats


def kaldi_fbank_auto(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    mean_norm: bool = True,
) -> jnp.ndarray:
    """Device-dispatched kaldi fbank: fused Pallas kernel on TPU backends,
    the XLA matmul path elsewhere. Batched (B, N) → (B, T, num_mel_bins)."""
    backend = jax.default_backend()
    if backend in ("tpu", "axon") and waveform.ndim == 2:
        from ..kernels.fbank_pallas import fbank_pallas

        return fbank_pallas(
            waveform, sample_rate=sample_rate, num_mel_bins=num_mel_bins, mean_norm=mean_norm
        )
    return kaldi_fbank_jax(
        waveform, sample_rate=sample_rate, num_mel_bins=num_mel_bins, mean_norm=mean_norm
    )


def splice_jax(Y: jnp.ndarray, context_size: int) -> jnp.ndarray:
    """Batched splice: (..., T, d) → (..., T, d*(2c+1)); zero edge padding."""
    if context_size == 0:
        return Y
    T = Y.shape[-2]
    pads = [(0, 0)] * (Y.ndim - 2) + [(context_size, context_size), (0, 0)]
    Y_pad = jnp.pad(Y, pads)
    cols = [Y_pad[..., i : i + T, :] for i in range(2 * context_size + 1)]
    return jnp.concatenate(cols, axis=-1)


def eend_frontend_jax(
    audio: jnp.ndarray,
    n_samples: int,
    frame_size: int = 200,
    frame_shift: int = 80,
    sample_rate: int = 8000,
    n_mels: int = 23,
    context_size: int = 7,
    subsampling: int = 10,
    mean_norm: bool = True,
) -> jnp.ndarray:
    """Full EEND front-end on device: audio chunk → spliced+subsampled log-mel.

    (..., n_samples) → (..., ceil(n_frames/subsampling), n_mels*(2c+1)).
    Matches host pipeline: transform('logmel23_mn') → splice → subsample.
    """
    n_frames = count_frames(n_samples, frame_shift)
    if jax.default_backend() in ("tpu", "axon") and audio.ndim == 2:
        from ..kernels.fbank_pallas import logmel_pallas

        lm = logmel_pallas(audio, n_frames, frame_size, frame_shift, sample_rate, n_mels, mean_norm)
    else:
        lm = logmel_frames_jax(audio, n_frames, frame_size, frame_shift, sample_rate, n_mels, mean_norm)
    sp = splice_jax(lm, context_size)
    return sp[..., ::subsampling, :]
