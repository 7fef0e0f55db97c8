"""End-to-end verification flow (the /verify skill's working recipe).

Drives the library through public imports from a scratch dir: wav io →
host-vs-jax feature parity → PIT loss sanity → DER scorer vs md-eval.pl
(hard multi-error fixture, collars 0/0.25) → tiny simulated-corpus
training (loss must decrease). Run: python scripts/verify_flow.py
"""
import os, subprocess, sys, tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1"); os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

os.chdir(tempfile.mkdtemp(prefix="sdt_verify_"))

from speaker_diarization_tpu.data.wav import write_wav, read_wav
rng = np.random.default_rng(0)
a = (rng.standard_normal(16000) * 0.1).astype(np.float32)
write_wav("a.wav", a, 8000)
b, r = read_wav("a.wav")
assert r == 8000 and np.allclose(a, b, atol=1e-4), "wav roundtrip"

from speaker_diarization_tpu.ops import features as F
Y = F.stft(a, 200, 80)
host = F.transform(Y, "logmel23_mn", sample_rate=8000)
dev = np.asarray(F.logmel_frames_jax(jnp.asarray(a[None]), host.shape[0], frame_size=200,
                                     frame_shift=80, sample_rate=8000, n_mels=23, mean_norm=True))[0]
err = np.max(np.abs(host - dev))
assert host.shape == dev.shape and err < 2e-2, f"feature parity {err}"
print("feature parity OK, max abs err", float(err))

from speaker_diarization_tpu.ops.losses import pit_loss
labels = (rng.random((1, 50, 3)) > 0.7).astype(np.float32)
logits = (labels[:, :, [2, 0, 1]] * 2 - 1) * 12.0
out = pit_loss(jnp.asarray(logits), jnp.asarray(labels))
loss = out[0] if isinstance(out, tuple) else out
assert float(jnp.mean(loss)) < 1e-3, f"pit loss {loss}"
print("pit loss OK")

from speaker_diarization_tpu.data.rttm import write_rttm, Turn
from speaker_diarization_tpu.score import score_der
write_rttm("ref.rttm", [Turn("r", 0.0, 3.0, "A"), Turn("r", 2.0, 6.0, "B"), Turn("r", 5.5, 9.0, "A"),
                        Turn("r2", 0.5, 4.0, "C")])
write_rttm("hyp.rttm", [Turn("r", 0.2, 2.8, "x"), Turn("r", 2.5, 6.5, "y"), Turn("r", 6.0, 8.0, "x"),
                        Turn("r2", 0.0, 3.0, "y"), Turn("r2", 3.5, 5.0, "z")])
for collar in (0.0, 0.25):
    res = score_der("ref.rttm", "hyp.rttm", collar=collar)
    outp = subprocess.check_output(
        ["perl", "/root/reference/SCTK-2.4.12/src/md-eval/md-eval.pl", "-c", str(collar),
         "-r", "ref.rttm", "-s", "hyp.rttm"], stderr=subprocess.DEVNULL, text=True)
    der, ms, fa, sc = [float(x) for x in outp.strip().splitlines()[-1].split("/")]
    ours = [res.der*100, res.miss_rate*100, res.falarm_rate*100, res.confusion_rate*100]
    for o, m, n in zip(ours, [der, ms, fa, sc], ["DER", "MS", "FA", "SC"]):
        assert abs(o - m) < 0.015, f"collar {collar} {n}: ours {o} vs md-eval {m}"
    print(f"collar {collar} scorer parity OK: DER {ours[0]:.3f} == {der}")

from speaker_diarization_tpu.data.simulate import simulate_corpus
from speaker_diarization_tpu.data.eend_dataset import EendChunkDataset, batch_iterator
from speaker_diarization_tpu.models import EENDModel
from speaker_diarization_tpu.models.eend import FrontendConfig
from speaker_diarization_tpu.train import Trainer, TrainerConfig
from speaker_diarization_tpu.train.tasks import make_eend_loss
corpus = simulate_corpus("sim", n_mixtures=3, n_speakers=2, rate=8000, seed=3)
FE = FrontendConfig()
ds = EendChunkDataset(corpus, chunk_frames=100, frontend=FE, n_speakers=2)
model = EENDModel(n_speakers=2, d_model=64, n_layers=2, n_heads=2, d_ff=128, frontend=FE)
tr = Trainer(make_eend_loss(model), TrainerConfig(schedule="const", learning_rate=2e-3))
batches = []
ep = 0
while len(batches) < 16:
    for bt in batch_iterator(ds, 4, shuffle=True, seed=0, epoch=ep):
        batches.append(bt)
    ep += 1
params = model.init(jax.random.PRNGKey(0), jnp.asarray(batches[0]["audio"]))
st = tr.init_state(params)
# the donation-safety contract: caller arrays stay alive after training
losses = []
for bt in batches[:16]:
    st, aux = tr.train_step(st, bt)
    losses.append(float(aux["loss"]))
_ = jax.tree_util.tree_map(lambda x: np.asarray(x).sum(), params)  # must not raise
assert np.mean(losses[-3:]) < np.mean(losses[:3]), f"loss not decreasing {losses}"
print("train flow OK:", round(float(np.mean(losses[:3])), 4), "->", round(float(np.mean(losses[-3:])), 4))
print("VERIFY OK")
