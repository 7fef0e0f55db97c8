"""CLI inference for the streaming / eend_m2f / sond / ssnd families.

Reference inference entry points: ts_vad2_streaming/model.py:368
(forward_chunk_by_chunk), eend_m2f/infer_mask_model.py, sond decoding,
ssnd_model.py:802 (online_infer) — here all behind `infer --family ...`.
"""

import os

import numpy as np
import pytest

from speaker_diarization_tpu.cli.main import main
from speaker_diarization_tpu.data.rttm import read_rttm_by_rec
from speaker_diarization_tpu.data.simulate import simulate_corpus
from speaker_diarization_tpu.infer.embeddings import EmbeddingStore


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_infer_fam")
    data_dir = simulate_corpus(
        str(root / "corpus"), n_mixtures=3, n_speakers=2, rate=8000, seed=0,
        src_speakers=4, utts_per_speaker=3, with_noise=False,
    )
    return root, data_dir


@pytest.fixture(scope="module")
def emb_store(corpus, tmp_path_factory):
    """Random rec/spk profile inventory (192-dim like CAM++ embeddings)."""
    _, data_dir = corpus
    rng = np.random.default_rng(0)
    store = EmbeddingStore()
    turns = read_rttm_by_rec(os.path.join(data_dir, "rttm"))
    for rec, ts in turns.items():
        for spk in sorted({t.speaker for t in ts}):
            store.put(rec, spk, rng.standard_normal((3, 192)).astype(np.float32))
    path = str(tmp_path_factory.mktemp("store") / "store.npz")
    store.save(path)
    return path


def _ref_speakers(data_dir):
    return {t.speaker for ts in read_rttm_by_rec(os.path.join(data_dir, "rttm")).values() for t in ts}


def test_tsvad_streaming_cli_train_infer(corpus, emb_store, tmp_path):
    _, data_dir = corpus
    exp = str(tmp_path / "stream")
    common = [
        "--set", "sample_rate=8000", "--set", "n_mels=40", "--set", "rs_len=2.0",
        "--set", "d_model=64", "--set", "d_ff=64", "--set", "n_layers=1",
        "--set", "n_heads=2", "--set", "streaming_chunk_size=8",
        "--set", "streaming_left_chunks=2",
    ]
    assert main([
        "train", "--family", "tsvad_streaming", "--train-dir", data_dir,
        "--exp-dir", exp, "--emb-store", emb_store,
        "--set", "batch_size=2", "--set", "num_steps=2", "--set", "schedule=const",
        "--set", "learning_rate=1e-4", "--set", "log_every=1", "--set", "valid_every=100",
        *common,
    ]) == 0
    out = str(tmp_path / "stream.rttm")
    assert main([
        "infer", "--family", "tsvad_streaming", "--data-dir", data_dir,
        "--exp-dir", exp, "--emb-store", emb_store, "--out", out,
        "--threshold", "0.3", *common,
    ]) == 0
    assert os.path.exists(out)
    names = {l.split()[7] for l in open(out) if l.strip()}
    assert names <= _ref_speakers(data_dir)


def test_m2f_cli_train_infer(corpus, tmp_path):
    _, data_dir = corpus
    exp = str(tmp_path / "m2f")
    common = [
        "--set", "d_model=32", "--set", "d_ff=64", "--set", "n_layers=1",
        "--set", "n_heads=2", "--set", "chunk_frames=50",
    ]
    assert main([
        "train", "--family", "eend_m2f", "--train-dir", data_dir, "--exp-dir", exp,
        "--set", "batch_size=2", "--set", "num_steps=2", "--set", "schedule=const",
        "--set", "learning_rate=1e-4", "--set", "log_every=1", "--set", "valid_every=100",
        *common,
    ]) == 0
    out = str(tmp_path / "m2f.rttm")
    assert main([
        "infer", "--family", "eend_m2f", "--data-dir", data_dir, "--exp-dir", exp,
        "--out", out, "--class-threshold", "0.0", *common,
    ]) == 0
    assert os.path.exists(out)


def test_sond_cli_train_infer(corpus, emb_store, tmp_path):
    _, data_dir = corpus
    exp = str(tmp_path / "sond")
    common = [
        "--set", "sample_rate=8000", "--set", "rs_len=2.0", "--set", "n_mels=24",
        "--set", "encoder_blocks=1,1,1,1", "--set", "d_model=32", "--set", "n_heads=2",
    ]
    assert main([
        "train", "--family", "sond", "--train-dir", data_dir, "--exp-dir", exp,
        "--emb-store", emb_store,
        "--set", "batch_size=2", "--set", "num_steps=2", "--set", "schedule=const",
        "--set", "learning_rate=1e-4", "--set", "log_every=1", "--set", "valid_every=100",
        *common,
    ]) == 0
    out = str(tmp_path / "sond.rttm")
    assert main([
        "infer", "--family", "sond", "--data-dir", data_dir, "--exp-dir", exp,
        "--emb-store", emb_store, "--out", out, "--threshold", "0.2", *common,
    ]) == 0
    assert os.path.exists(out)
    names = {l.split()[7] for l in open(out) if l.strip()}
    assert names <= _ref_speakers(data_dir)


def test_ssnd_cli_train_infer(corpus, tmp_path):
    root, data_dir = corpus
    src_dir = os.path.join(os.path.dirname(data_dir.rstrip("/")), "src")
    exp = str(tmp_path / "ssnd")
    common = ["--set", "sample_rate=8000", "--set", "rs_len=2.0", "--set", "encoder_blocks=2,2"]
    assert main([
        "train", "--family", "ssnd", "--train-dir", src_dir, "--exp-dir", exp,
        "--set", "batch_size=2", "--set", "num_steps=2", "--set", "schedule=const",
        "--set", "learning_rate=1e-4", "--set", "log_every=1", "--set", "valid_every=100",
        *common,
    ]) == 0
    for extra, out in [([], str(tmp_path / "ssnd.rttm")),
                       (["--ssnd-rescore"], str(tmp_path / "ssnd_rescore.rttm"))]:
        assert main([
            "infer", "--family", "ssnd", "--data-dir", data_dir, "--exp-dir", exp,
            "--out", out, "--threshold", "0.3", *extra, *common,
        ]) == 0
        assert os.path.exists(out)
