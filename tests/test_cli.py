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


class TestClusterCommand:
    def _make_data(self, tmp_path):
        """2-speaker tone meeting: 150 Hz vs 350 Hz bursts."""
        from speaker_diarization_tpu.data.wav import write_wav

        rate = 16000
        rng = np.random.default_rng(0)
        audio = 0.003 * rng.standard_normal(8 * rate).astype(np.float32)
        regions = [(0.5, 2.0, 150.0, "A"), (2.6, 4.0, 350.0, "B"),
                   (4.6, 6.0, 150.0, "A"), (6.4, 7.6, 350.0, "B")]
        turns = []
        for s, e, f, spk in regions:
            i0, i1 = int(s * rate), int(e * rate)
            audio[i0:i1] += (0.3 * np.sin(2 * np.pi * f * np.arange(i1 - i0) / rate)
                             + 0.1 * rng.standard_normal(i1 - i0)).astype(np.float32)
            turns.append(Turn("rec1", s, e - s, spk))
        d = tmp_path / "data"
        d.mkdir()
        write_wav(str(d / "rec1.wav"), audio, rate)
        (d / "wav.scp").write_text(f"rec1 {d / 'rec1.wav'}\n")
        write_rttm(str(d / "rttm"), turns)
        return d

    def test_cluster_oracle_sad_spectrum(self, tmp_path, capsys):
        d = self._make_data(tmp_path)
        out = tmp_path / "hyp.rttm"
        rc = main(["cluster", "--data-dir", str(d), "--out", str(out),
                   "--encoder", "spectrum", "--sad", "oracle", "--num-spks", "2",
                   "--ref", str(d / "rttm"), "-c", "0.25"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        assert lines[0] == str(out)
        # oracle SAD + separable tones → near-zero DER
        assert "DER" in lines[1]
        der = float(lines[1].split("DER ")[1].split("%")[0])
        assert der < 5.0, lines[1]

    def test_cluster_vbx(self, tmp_path, capsys):
        """estimate-plda → cluster --method vbx end-to-end (diarizen's
        default clustering path, VERDICT r3 #5)."""
        from speaker_diarization_tpu.data.wav import write_wav

        d = self._make_data(tmp_path)
        # labeled utterance dir for PLDA: single-speaker tone utterances
        pd = tmp_path / "plda_data"
        pd.mkdir()
        rate = 16000
        rng = np.random.default_rng(1)
        scp, u2s = [], []
        for i, (f, spk) in enumerate([(150.0, "A"), (350.0, "B")] * 3):
            a = (0.3 * np.sin(2 * np.pi * f * np.arange(2 * rate) / rate)
                 + 0.1 * rng.standard_normal(2 * rate)).astype(np.float32)
            write_wav(str(pd / f"u{i}.wav"), a, rate)
            scp.append(f"u{i} {pd / f'u{i}.wav'}")
            u2s.append(f"u{i} {spk}")
        (pd / "wav.scp").write_text("\n".join(scp) + "\n")
        (pd / "utt2spk").write_text("\n".join(u2s) + "\n")

        plda_npz = tmp_path / "plda.npz"
        rc = main(["estimate-plda", "--data-dir", str(pd), "--out", str(plda_npz),
                   "--encoder", "spectrum", "--plda-dim", "16"])
        assert rc == 0 and plda_npz.exists()

        out = tmp_path / "hyp_vbx.rttm"
        rc = main(["cluster", "--data-dir", str(d), "--out", str(out),
                   "--encoder", "spectrum", "--sad", "oracle", "--num-spks", "2",
                   "--method", "vbx", "--plda", str(plda_npz),
                   "--ref", str(d / "rttm"), "-c", "0.25"])
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        der = float(lines[-1].split("DER ")[1].split("%")[0])
        assert der < 5.0, lines[-1]

    def test_cluster_energy_sad(self, tmp_path, capsys):
        d = self._make_data(tmp_path)
        out = tmp_path / "hyp2.rttm"
        rc = main(["cluster", "--data-dir", str(d), "--out", str(out),
                   "--encoder", "spectrum", "--sad", "energy", "--num-spks", "2"])
        assert rc == 0
        from speaker_diarization_tpu.data.rttm import read_rttm_by_rec

        hyp = read_rttm_by_rec(str(out))
        assert "rec1" in hyp and len({t.speaker for t in hyp["rec1"]}) == 2


class TestScoreUem:
    def test_uem_restricts_scoring(self, tmp_path, capsys):
        ref = [Turn("m", 0.0, 10.0, "A")]
        hyp = [Turn("m", 0.0, 5.0, "A")]  # misses [5,10]
        write_rttm(tmp_path / "ref.rttm", ref)
        write_rttm(tmp_path / "hyp.rttm", hyp)
        uem = tmp_path / "all.uem"
        uem.write_text("m 1 0.0 5.0\n")  # scored region excludes the miss
        rc = main(["score", "--ref", str(tmp_path / "ref.rttm"), "--sys", str(tmp_path / "hyp.rttm"),
                   "-c", "0.0", "-u", str(uem)])
        assert rc == 0
        der = float(capsys.readouterr().out.strip().splitlines()[0].split("/")[0])
        assert der == 0.0
        rc = main(["score", "--ref", str(tmp_path / "ref.rttm"), "--sys", str(tmp_path / "hyp.rttm"), "-c", "0.0"])
        der_full = float(capsys.readouterr().out.strip().splitlines()[0].split("/")[0])
        assert der_full == 50.0
