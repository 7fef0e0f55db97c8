"""CLI + config system tests (fast paths; full train/infer covered by e2e)."""

import dataclasses
import subprocess
import sys

import numpy as np
import pytest

from speaker_diarization_tpu.cli.main import TrainCliConfig, build_parser, main
from speaker_diarization_tpu.data.rttm import Turn, write_rttm
from speaker_diarization_tpu.utils.config import apply_overrides, from_dict, load_yaml, to_dict


class TestConfig:
    def test_roundtrip(self):
        cfg = TrainCliConfig(family="tsvad", d_model=128)
        d = to_dict(cfg)
        back = from_dict(TrainCliConfig, d)
        assert back == cfg

    def test_yaml_load(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("family: eend_eda\nn_speakers: 3\nlearning_rate: 0.5\n")
        cfg = load_yaml(TrainCliConfig, str(p))
        assert cfg.family == "eend_eda" and cfg.n_speakers == 3 and cfg.learning_rate == 0.5

    def test_unknown_key_rejected(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("no_such_field: 1\n")
        with pytest.raises(KeyError):
            load_yaml(TrainCliConfig, str(p))

    def test_overrides(self):
        cfg = TrainCliConfig()
        cfg2 = apply_overrides(cfg, ["d_model=96", "family=tsvad", "bf16=true"])
        assert cfg2.d_model == 96 and cfg2.family == "tsvad" and cfg2.bf16 is True


class TestScoreCommand:
    def test_score_output_format(self, tmp_path, capsys):
        rng = np.random.default_rng(0)
        ref = [Turn("m", float(i * 3), 2.0, f"S{i % 2}") for i in range(10)]
        write_rttm(tmp_path / "ref.rttm", ref)
        write_rttm(tmp_path / "hyp.rttm", [Turn(t.rec, t.start, t.dur, "h" + t.speaker) for t in ref])
        rc = main(["score", "--ref", str(tmp_path / "ref.rttm"), "--sys", str(tmp_path / "hyp.rttm"), "-c", "0.25", "--cder"])
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        der, ms, fa, sc = (float(x) for x in out[0].split("/"))
        assert der == 0.0
        assert "CDER avg = 0.000" in out[1]

    def test_parser_subcommands(self):
        p = build_parser()
        for cmd in ("simulate", "train", "infer", "score", "extract-embeddings"):
            assert cmd in p.format_help()
