"""ERes2Net / ERes2Net_huge / ERes2NetV2 numerical parity vs the reference
torch implementations (egs/alimeeting/ts_vad2/ERes2Net{,_huge}.py,
egs/alimeeting/ts_vad2/ERes2NetV2.py), via the
utils/torch_convert.eres2net_torch_to_flax checkpoint converter.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/egs/alimeeting/ts_vad2"
REF_DIR_MD = "/root/reference/egs/magicdata-ramc/ts_vad2"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="reference not mounted")


def _load_ref(fname, modname):
    """Import a reference module from REF_DIR, stubbing its absolute
    pooling import (examples...pooling_layers2 does not exist in the repo;
    pooling_layers_3d_speaker is the same TSTP)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    spec_p = importlib.util.spec_from_file_location(
        "ref_pooling_3d", os.path.join(REF_DIR, "pooling_layers_3d_speaker.py")
    )
    pooling = importlib.util.module_from_spec(spec_p)
    spec_p.loader.exec_module(pooling)
    # stub package chain for the base/huge files' absolute import
    chain = "examples.speaker_diarization.ts_vad.models.modules".split(".")
    full = ""
    for part in chain:
        full = f"{full}.{part}" if full else part
        sys.modules.setdefault(full, types.ModuleType(full))
    sys.modules["examples.speaker_diarization.ts_vad.models.modules.pooling_layers2"] = pooling
    # the magicdata twin imports via a 'ts_vad2.' package prefix
    spec_f = importlib.util.spec_from_file_location("ref_fusion", os.path.join(REF_DIR, "fusion.py"))
    fusion = importlib.util.module_from_spec(spec_f)
    spec_f.loader.exec_module(fusion)
    sys.modules.setdefault("ts_vad2", types.ModuleType("ts_vad2"))
    sys.modules["ts_vad2.pooling_layers_3d_speaker"] = pooling
    sys.modules["ts_vad2.fusion"] = fusion
    ref_dir = REF_DIR_MD if fname.startswith("md:") else REF_DIR
    fname = fname.removeprefix("md:")
    spec = importlib.util.spec_from_file_location(modname, os.path.join(ref_dir, fname))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _compare(ref_model, flax_model, feat_dim, modes=("embedding", "frames")):
    import torch

    from speaker_diarization_tpu.utils.torch_convert import eres2net_torch_to_flax

    ref_model.eval()
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params, stats = eres2net_torch_to_flax(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, feat_dim)).astype(np.float32)
    with torch.no_grad():
        ref_emb = ref_model(torch.from_numpy(x)).numpy()
    emb = np.asarray(
        flax_model.apply({"params": params, "batch_stats": stats}, x, False, "embedding")
    )
    err = np.abs(emb - ref_emb).max() / max(np.abs(ref_emb).max(), 1e-9)
    assert err < 2e-4, f"embedding rel err {err}"
    cos = float(
        np.sum(emb * ref_emb) / (np.linalg.norm(emb) * np.linalg.norm(ref_emb))
    )
    assert cos > 0.99999

    if "frames" in modes and hasattr(ref_model, "get_frame_level_feat"):
        with torch.no_grad():
            ref_fr = ref_model.get_frame_level_feat(torch.from_numpy(x)).numpy()  # (B, D, T)
        fr = np.asarray(
            flax_model.apply({"params": params, "batch_stats": stats}, x, False, "frames")
        ).transpose(0, 2, 1)
        # reference get_frame_level_feat flattens (F', C) after
        # transpose(1, 3) — freq-major, same order as our frames mode
        ferr = np.abs(fr - ref_fr).max() / max(np.abs(ref_fr).max(), 1e-9)
        assert ferr < 2e-4, f"frames rel err {ferr}"


def test_eres2netv2_parity():
    ref = _load_ref("ERes2NetV2.py", "ref_eres2netv2")
    from speaker_diarization_tpu.models.eres2net import ERes2NetV2

    feat = 32
    ref_m = ref.ERes2NetV2(
        feat_dim=feat, embedding_size=48, m_channels=16,
        num_blocks=[1, 1, 1, 1], baseWidth=26, scale=2, expansion=2,
    )
    ours = ERes2NetV2(
        feat_dim=feat, embedding_size=48, m_channels=16,
        num_blocks=(1, 1, 1, 1), base_width=26, scale=2, expansion=2,
    )
    _compare(ref_m, ours, feat)


def test_eres2netv2_w24s4ep4_parity():
    """The reference's larger TS-VAD V2 config (baseWidth 24, scale 4, exp 4)."""
    ref = _load_ref("ERes2NetV2.py", "ref_eres2netv2b")
    from speaker_diarization_tpu.models.eres2net import ERes2NetV2

    feat = 32
    ref_m = ref.ERes2NetV2(
        feat_dim=feat, embedding_size=48, m_channels=16,
        num_blocks=[1, 1, 1, 1], baseWidth=24, scale=4, expansion=4,
    )
    ours = ERes2NetV2(
        feat_dim=feat, embedding_size=48, m_channels=16,
        num_blocks=(1, 1, 1, 1), base_width=24, scale=4, expansion=4,
    )
    _compare(ref_m, ours, feat)


def test_eres2netv2_frames25():
    """frames25 == reference get_frame_level_feat_frame_rate25 (stage-3)."""
    import torch

    ref = _load_ref("md:ERes2NetV2.py", "ref_eres2netv2c")
    from speaker_diarization_tpu.models.eres2net import ERes2NetV2
    from speaker_diarization_tpu.utils.torch_convert import eres2net_torch_to_flax

    feat = 32
    ref_m = ref.ERes2NetV2(feat_dim=feat, embedding_size=48, m_channels=16, num_blocks=[1, 1, 1, 1])
    ref_m.eval()
    ours = ERes2NetV2(feat_dim=feat, embedding_size=48, m_channels=16, num_blocks=(1, 1, 1, 1))
    params, stats = eres2net_torch_to_flax({k: v.numpy() for k, v in ref_m.state_dict().items()})
    x = np.random.default_rng(1).standard_normal((2, 100, feat)).astype(np.float32)
    with torch.no_grad():
        ref_fr = ref_m.get_frame_level_feat_frame_rate25(torch.from_numpy(x)).numpy()  # (B, D, T25)
    fr = np.asarray(
        ours.apply({"params": params, "batch_stats": stats}, x, False, "frames25")
    ).transpose(0, 2, 1)
    err = np.abs(fr - ref_fr).max() / max(np.abs(ref_fr).max(), 1e-9)
    assert fr.shape == ref_fr.shape and err < 2e-4, (fr.shape, ref_fr.shape, err)


def test_eres2net_base_parity():
    ref = _load_ref("ERes2Net.py", "ref_eres2net_base")
    from speaker_diarization_tpu.models.eres2net import ERes2Net

    feat = 32
    ref_m = ref.ERes2Net(feat_dim=feat, embedding_size=48, m_channels=16, num_blocks=[1, 1, 1, 1])
    ours = ERes2Net(feat_dim=feat, embedding_size=48, m_channels=16, num_blocks=(1, 1, 1, 1))
    _compare(ref_m, ours, feat, modes=("embedding",))


def test_eres2net_huge_parity():
    """ERes2Net_huge = expansion 4, baseWidth 24, scale 3 on the same cascade."""
    ref = _load_ref("ERes2Net_huge.py", "ref_eres2net_huge")
    from speaker_diarization_tpu.models.eres2net import ERes2Net

    feat = 32
    ref_m = ref.ERes2Net(feat_dim=feat, embedding_size=48, m_channels=16, num_blocks=[1, 1, 1, 1])
    ours = ERes2Net(
        feat_dim=feat, embedding_size=48, m_channels=16, num_blocks=(1, 1, 1, 1),
        base_width=24, scale=3, expansion=4,
    )
    _compare(ref_m, ours, feat, modes=("embedding",))


def test_tsvad_eres2netv2_encoder_forward():
    """TS-VAD with the eres2netv2 speech encoder (reference
    ERes2NetV2_COMMON wiring at label_rate 25: stage-3 frames, stride-1)."""
    import jax
    import jax.numpy as jnp

    from speaker_diarization_tpu.models import TSVADConfig, TSVADModel

    cfg = TSVADConfig(
        speech_encoder_type="eres2netv2", feat_dim=32, sample_rate=8000,
        transformer_ffn_embed_dim=128, num_transformer_layer=1,
    )
    model = TSVADModel(cfg=cfg)
    B, T = 2, 25
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, 8000)).astype(np.float32) * 0.1)
    embs = jnp.asarray(rng.standard_normal((B, cfg.max_num_speaker, cfg.speaker_embed_dim)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), audio, embs, T)
    out = model.apply(variables, audio, embs, T, train=False)
    assert out.shape == (B, T, cfg.max_num_speaker)
    assert np.isfinite(np.asarray(out)).all()
