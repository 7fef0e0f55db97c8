"""CLI training for the ssnd / eend_m2f / sond families (tiny smoke runs).

Reference trains these via separate harnesses (ssnd/train_accelerate_ddp.py,
eend_m2f/train.py, sond recipes); here all go through the one pjit trainer
behind `train --family ...`.
"""

import json
import os

import numpy as np
import pytest

from speaker_diarization_tpu.cli.main import main
from speaker_diarization_tpu.data.simulate import simulate_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_fam")
    data_dir = simulate_corpus(
        str(root / "corpus"), n_mixtures=4, n_speakers=2, rate=8000, seed=0,
        src_speakers=4, utts_per_speaker=3, with_noise=False,
    )
    return root, data_dir


def _losses(exp_dir):
    path = os.path.join(exp_dir, "metrics.jsonl")
    out = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("split", "train") == "train" and "loss" in rec:
                out.append(rec["loss"])
    return out


def test_train_eend_m2f_cli(corpus, tmp_path):
    root, data_dir = corpus
    exp = tmp_path / "m2f"
    rc = main([
        "train", "--family", "eend_m2f", "--train-dir", data_dir,
        "--exp-dir", str(exp),
        "--set", "d_model=32", "--set", "d_ff=64", "--set", "n_layers=1",
        "--set", "n_heads=2", "--set", "chunk_frames=50", "--set", "batch_size=2",
        "--set", "num_steps=4", "--set", "schedule=const", "--set", "learning_rate=1e-4",
        "--set", "log_every=1", "--set", "valid_every=100",
    ])
    assert rc == 0
    losses = _losses(str(exp))
    assert losses and np.isfinite(losses).all()


def test_train_ssnd_cli(corpus, tmp_path):
    root, data_dir = corpus
    src_dir = os.path.join(os.path.dirname(data_dir.rstrip("/")), "src")
    if not os.path.isdir(src_dir):
        src_dir = str(root / "corpus" / "src")
    exp = tmp_path / "ssnd"
    rc = main([
        "train", "--family", "ssnd", "--train-dir", src_dir,
        "--exp-dir", str(exp),
        "--set", "sample_rate=8000", "--set", "rs_len=2.0",
        "--set", "encoder_blocks=2,2", "--set", "batch_size=2",
        "--set", "num_steps=3", "--set", "schedule=const", "--set", "learning_rate=1e-4",
        "--set", "log_every=1", "--set", "valid_every=100",
    ])
    assert rc == 0
    losses = _losses(str(exp))
    assert losses and np.isfinite(losses).all()


def test_train_sond_cli(corpus, tmp_path):
    root, data_dir = corpus
    # random profile inventory: rec/spk keyed store (SOND consumes profiles,
    # not waveform enrollment)
    from speaker_diarization_tpu.data.kaldi_io import KaldiData
    from speaker_diarization_tpu.data.rttm import read_rttm_by_rec
    from speaker_diarization_tpu.infer.embeddings import EmbeddingStore

    rng = np.random.default_rng(0)
    store = EmbeddingStore()
    turns = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
    for rec, ts in turns.items():
        for spk in sorted({t.speaker for t in ts}):
            store.put(rec, spk, rng.standard_normal((3, 192)).astype(np.float32))
    store_path = str(tmp_path / "store.npz")
    store.save(store_path)

    exp = tmp_path / "sond"
    rc = main([
        "train", "--family", "sond", "--train-dir", data_dir,
        "--exp-dir", str(exp), "--emb-store", store_path,
        "--set", "sample_rate=8000", "--set", "rs_len=2.0", "--set", "n_mels=24",
        "--set", "encoder_blocks=1,1,1,1", "--set", "d_model=32", "--set", "n_heads=2",
        "--set", "batch_size=2", "--set", "num_steps=3", "--set", "schedule=const",
        "--set", "learning_rate=1e-4", "--set", "log_every=1", "--set", "valid_every=100",
    ])
    assert rc == 0
    losses = _losses(str(exp))
    assert losses and np.isfinite(losses).all()


def test_tsvad_cli_train_infer_sweep(corpus, tmp_path):
    """tsvad through the CLI end-to-end incl. the threshold sweep (which
    regressed once by returning before the sweep block) and the npz
    self-trained encoder path."""
    root, data_dir = corpus
    src_dir = os.path.join(os.path.dirname(data_dir.rstrip("/")), "src")

    # tiny spk encoder → export → targets → embeddings
    assert main([
        "train", "--family", "spk", "--train-dir", src_dir,
        "--exp-dir", str(tmp_path / "spk"),
        "--set", "sample_rate=8000", "--set", "n_mels=40", "--set", "spk_dur=1.0",
        "--set", "encoder_blocks=1,1", "--set", "batch_size=4", "--set", "num_steps=2",
        "--set", "schedule=const", "--set", "learning_rate=1e-3",
        "--set", "log_every=1", "--set", "valid_every=100",
    ]) == 0
    enc = str(tmp_path / "enc.npz")
    assert main([
        "export-encoder", "--exp-dir", str(tmp_path / "spk"), "--out", enc,
        "--set", "n_mels=40", "--set", "encoder_blocks=1,1",
    ]) == 0
    targets = str(tmp_path / "targets")
    assert main([
        "prepare-targets", "--rttm", os.path.join(data_dir, "rttm"),
        "--data-dir", data_dir, "--out", targets,
    ]) == 0
    embs = str(tmp_path / "embs.npz")
    assert main([
        "extract-embeddings", "--data-dir", targets, "--out", embs,
        "--encoder-ckpt", enc, "--rate", "8000", "--window", "1.0", "--hop", "0.5",
    ]) == 0

    exp = str(tmp_path / "tsvad")
    assert main([
        "train", "--family", "tsvad", "--train-dir", data_dir, "--exp-dir", exp,
        "--emb-store", embs, "--encoder-ckpt", enc,
        "--set", "sample_rate=8000", "--set", "n_mels=40", "--set", "encoder_blocks=1,1",
        "--set", "rs_len=2.0", "--set", "batch_size=2", "--set", "num_steps=2",
        "--set", "d_ff=64", "--set", "n_layers=1", "--set", "freeze_encoder=true",
        "--set", "schedule=const", "--set", "learning_rate=1e-4",
        "--set", "log_every=1", "--set", "valid_every=100",
    ]) == 0
    out = str(tmp_path / "hyp.rttm")
    assert main([
        "infer", "--family", "tsvad", "--data-dir", data_dir, "--exp-dir", exp,
        "--emb-store", embs, "--out", out, "--threshold-sweep", "--cder",
        "--ref", os.path.join(data_dir, "rttm"),
        "--set", "sample_rate=8000", "--set", "n_mels=40", "--set", "encoder_blocks=1,1",
        "--set", "rs_len=2.0", "--set", "d_ff=64", "--set", "n_layers=1",
    ]) == 0
    import glob

    rttms = glob.glob(out + "_0.*")
    assert len(rttms) == 18  # thresholds 0.2..0.95 + 0.97, 0.98
    # sweep RTTMs carry the real speaker names from the data dir
    names = {l.split()[7] for r in rttms for l in open(r) if l.strip()}
    from speaker_diarization_tpu.data.rttm import read_rttm_by_rec

    ref_names = {t.speaker for ts in read_rttm_by_rec(os.path.join(data_dir, "rttm")).values() for t in ts}
    assert names <= ref_names


def test_train_infer_tsvad3_cli(corpus, tmp_path):
    """tsvad3: enrollment waveforms from prepare-targets' target_audio tree,
    embedded in-model (reference egs/alimeeting/ts_vad3)."""
    root, data_dir = corpus
    targets = tmp_path / "targets"
    rc = main([
        "prepare-targets", "--rttm", os.path.join(data_dir, "rttm"),
        "--data-dir", data_dir, "--out", str(targets),
    ])
    assert rc == 0
    tad = str(targets / "target_audio")
    exp = tmp_path / "tsvad3"
    common = [
        "--set", "sample_rate=8000", "--set", "n_mels=80", "--set", "rs_len=2.0",
        "--set", "ts_len=1.0", "--set", "encoder_blocks=2,2",
        "--set", "n_layers=1", "--set", "d_ff=64",
    ]
    rc = main([
        "train", "--family", "tsvad3", "--train-dir", data_dir,
        "--exp-dir", str(exp), "--target-audio-dir", tad,
        *common,
        "--set", "batch_size=2", "--set", "num_steps=3",
        "--set", "schedule=const", "--set", "learning_rate=1e-4",
        "--set", "log_every=1", "--set", "valid_every=100",
    ])
    assert rc == 0
    losses = _losses(str(exp))
    assert losses and np.isfinite(losses).all()

    out = tmp_path / "tsvad3.rttm"
    rc = main([
        "infer", "--family", "tsvad3", "--data-dir", data_dir,
        "--exp-dir", str(exp), "--target-audio-dir", tad,
        "--out", str(out), *common,
    ])
    assert rc == 0
    assert out.exists()


def test_train_infer_ots_vad_cli(corpus, tmp_path):
    """ots_vad: enrollment-free (self-generated targets); training splits
    each 2*rs_len chunk into enroll-left/predict-right halves; inference is
    the online slot-bootstrapping decode (test_inference_case1.py)."""
    root, data_dir = corpus
    exp = tmp_path / "ots"
    common = [
        "--set", "sample_rate=8000", "--set", "n_mels=80", "--set", "rs_len=1.0",
        "--set", "encoder_blocks=1,1,1,1", "--set", "d_model=32",
        "--set", "n_layers=2", "--set", "n_heads=2", "--set", "d_ff=64",
    ]
    rc = main([
        "train", "--family", "ots_vad", "--train-dir", data_dir,
        "--exp-dir", str(exp), *common,
        "--set", "batch_size=2", "--set", "num_steps=3",
        "--set", "schedule=const", "--set", "learning_rate=1e-4",
        "--set", "log_every=1", "--set", "valid_every=100",
    ])
    assert rc == 0
    losses = _losses(str(exp))
    assert losses and np.isfinite(losses).all()

    out = tmp_path / "ots.rttm"
    rc = main([
        "infer", "--family", "ots_vad", "--data-dir", data_dir,
        "--exp-dir", str(exp), "--out", str(out), *common,
    ])
    assert rc == 0
    assert out.exists()
