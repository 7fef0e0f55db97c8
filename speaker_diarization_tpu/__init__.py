"""speaker_diarization_tpu — a TPU-native speaker-diarization framework.

Built from scratch in JAX/XLA/Pallas/pjit with the capability surface of the
`shanguanma/speaker_diarization` reference (see SURVEY.md at repo root), but a
new, TPU-first design:

- `ops/`      pure-JAX + Pallas compute primitives: STFT/log-mel front-end,
              PIT losses, frame-level diarization metrics, signal post-proc.
- `data/`     host-side data plane: wav I/O, Kaldi-style data dirs, RTTM,
              multi-talker mixture simulation, chunk samplers.
- `models/`   flax.linen model families: EEND, EEND-EDA, TS-VAD (+ speaker
              encoder zoo), streaming/causal variants, set-prediction heads.
- `parallel/` mesh + sharding layer (pjit/GSPMD over ICI; DP/FSDP axes).
- `train/`    the single unified trainer: bf16, remat, grad-accum, Orbax
              checkpoints, model averaging, schedules.
- `infer/`    chunked/sliding-window inference, overlap voting, stitching,
              clustering back-ends.
- `postproc/` probability → RTTM (median filter, hysteresis).
- `score/`    DER/CDER scorers (native C++ core with ctypes binding,
              validated against SCTK md-eval.pl golden outputs).
"""

__version__ = "0.1.0"
