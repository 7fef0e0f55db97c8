"""Bisect the remote-compile SIGKILL: compile the FCM Pallas kernel standalone."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.models.campplus import CAMPPlus
from speaker_diarization_tpu.kernels.fcm_pallas import fcm_pallas, prepare_fcm_params

B, T = 64, 398
model = CAMPPlus(feat_dim=80, block_layers=(12, 24, 16), dtype=jnp.bfloat16)
fbank = jnp.asarray(np.random.default_rng(0).standard_normal((B, T, 80)), jnp.float32)
variables = model.init(jax.random.PRNGKey(0), fbank)
p, st = variables["params"]["head"], variables["batch_stats"]["head"]
flat = tuple(prepare_fcm_params(p, st, jnp.bfloat16))
print("compiling fcm_pallas standalone...", flush=True)
t0 = time.time()
out = fcm_pallas(fbank, flat, dtype=jnp.bfloat16)
out.block_until_ready()
print(f"compiled+ran in {time.time()-t0:.1f}s, out {out.shape}", flush=True)
# timed
for _ in range(3):
    t0 = time.time()
    float(jnp.sum(fcm_pallas(fbank, flat, dtype=jnp.bfloat16)))
    print(f"  call {1e3*(time.time()-t0):.2f} ms (incl relay fetch)", flush=True)
