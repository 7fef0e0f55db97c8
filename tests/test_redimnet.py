"""ReDimNet flax: numerical parity with the reference torch implementation
(`egs/alimeeting/ts_vad2/redimnet.py`)."""

import os
import sys
import types

import numpy as np
import pytest

REF_DIR = "/root/reference/egs/alimeeting/ts_vad2"


def _load_ref_redimnet():
    import importlib.util

    # redimnet.py imports `wespeaker.models.pooling_layers`; satisfy it with
    # the reference's own vendored copy (pooling_layers_wespeaker.py).
    spec_p = importlib.util.spec_from_file_location(
        "ref_pooling", os.path.join(REF_DIR, "pooling_layers_wespeaker.py"))
    poolmod = importlib.util.module_from_spec(spec_p)
    spec_p.loader.exec_module(poolmod)
    wes = types.ModuleType("wespeaker")
    wm = types.ModuleType("wespeaker.models")
    wes.models = wm
    wm.pooling_layers = poolmod
    sys.modules.setdefault("wespeaker", wes)
    sys.modules.setdefault("wespeaker.models", wm)
    sys.modules["wespeaker.models.pooling_layers"] = poolmod

    spec = importlib.util.spec_from_file_location("ref_redimnet", os.path.join(REF_DIR, "redimnet.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    return ref


def test_tsvad_redimnet_encoder_forward():
    import jax
    import jax.numpy as jnp

    from speaker_diarization_tpu.models.tsvad import TSVADConfig, TSVADModel

    cfg = TSVADConfig(
        speech_encoder_type="redimnet_b0", feat_dim=60,
        transformer_ffn_embed_dim=256, num_transformer_layer=1, dropout=0.0,
    )
    model = TSVADModel(cfg=cfg)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16000)).astype(np.float32) * 0.05)
    embs = jnp.asarray(np.random.default_rng(1).standard_normal((1, 4, 192)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), audio, embs, 25)
    logits = model.apply(v, audio, embs, 25)
    assert logits.shape == (1, 25, 4)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DIR, "redimnet.py")), reason="reference not mounted")
def test_param_counts_match_all_sizes():
    """Cheap wiring check for every factory size: #params must match torch
    (minus the frozen all-ones inputs_weights[0], 1 element)."""
    import jax
    import jax.numpy as jnp
    import torch

    ref = _load_ref_redimnet()
    from speaker_diarization_tpu.models.redimnet import REDIMNET_SIZES, ReDimNet

    factories = dict(b0=ref.ReDimNetB0, b1=ref.ReDimNetB1, b2=ref.ReDimNetB2,
                     b3=ref.ReDimNetB3, b4=ref.ReDimNetB4, b5=ref.ReDimNetB5, b6=ref.ReDimNetB6)
    for size, factory in factories.items():
        tm = factory()
        t_count = sum(p.numel() for p in tm.parameters())
        fm = ReDimNet(size=size)
        feat = REDIMNET_SIZES[size]["feat_dim"]
        v = jax.eval_shape(lambda: fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, feat)), False, "embedding"))
        f_count = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(v["params"]))
        assert t_count - f_count == 1, (size, t_count, f_count)


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DIR, "redimnet.py")), reason="reference not mounted")
def test_tiny_fwse_conv_exp_parity():
    """fwSE blocks + conv_exp squeeze-back (the B3-B6 paths) on a tiny model."""
    import jax.numpy as jnp
    import torch

    ref = _load_ref_redimnet()
    torch.manual_seed(1)
    stages = [(1, 1, 2, [(3, 3)], 8), (2, 1, 1, [(3, 3)], 8)]
    tm = ref.ReDimNet(feat_dim=16, C=8, block_1d_type="att", block_2d_type="basic_resnet_fwse",
                      stages_setup=stages, group_divisor=1, out_channels=None,
                      embed_dim=24, pooling_func="ASTP", global_context_att=True)
    tm.eval()

    from speaker_diarization_tpu.models.redimnet import ReDimNet
    from speaker_diarization_tpu.utils.torch_convert import redimnet_torch_to_flax

    fm = ReDimNet(size=None, feat_dim=16, C=8, stages_setup=tuple(tuple(s) for s in stages),
                  block_1d_type="att", block_2d_type="basic_resnet_fwse", group_divisor=1,
                  embed_dim=24)
    params, stats = redimnet_torch_to_flax(dict(tm.state_dict()), stages)
    variables = {"params": params, "batch_stats": stats}
    x = np.random.default_rng(2).standard_normal((2, 60, 16)).astype(np.float32)
    with torch.no_grad():
        t_fr = tm.get_frame_level_feat(torch.from_numpy(x)).numpy()
        _, t_emb = tm(torch.from_numpy(x))
    f_fr = np.asarray(fm.apply(variables, jnp.asarray(x), False, "frames"))
    np.testing.assert_allclose(f_fr, t_fr, atol=2e-4)
    f_emb = np.asarray(fm.apply(variables, jnp.asarray(x), False, "embedding"))
    np.testing.assert_allclose(f_emb, t_emb.numpy(), atol=5e-4)


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DIR, "redimnet.py")), reason="reference not mounted")
class TestReDimNetParity:
    @pytest.fixture(scope="class", params=["b0", "b2"])
    def pair(self, request):
        import torch

        ref = _load_ref_redimnet()
        torch.manual_seed(0)
        size = request.param
        tm = ref.ReDimNetB0() if size == "b0" else ref.ReDimNetB2()
        tm.eval()

        from speaker_diarization_tpu.models.redimnet import REDIMNET_SIZES, ReDimNet
        from speaker_diarization_tpu.utils.torch_convert import redimnet_torch_to_flax

        fm = ReDimNet(size=size)
        params, stats = redimnet_torch_to_flax(
            {k: v for k, v in tm.state_dict().items()},
            REDIMNET_SIZES[size]["stages_setup"],
        )
        return tm, fm, {"params": params, "batch_stats": stats}, size

    def test_param_tree_matches_init(self, pair):
        import jax
        import jax.numpy as jnp

        _, fm, variables, size = pair
        from speaker_diarization_tpu.models.redimnet import REDIMNET_SIZES

        feat = REDIMNET_SIZES[size]["feat_dim"]
        x = jnp.zeros((1, 16, feat), jnp.float32)
        init_vars = fm.init(jax.random.PRNGKey(0), x, False, "embedding")
        want = set(jax.tree_util.tree_map(lambda _: 0, init_vars["params"]).keys())
        got = set(variables["params"].keys())
        assert want == got, f"missing={want - got} extra={got - want}"
        w_paths = {"/".join(str(k.key) for k in p) for p, _ in jax.tree_util.tree_flatten_with_path(init_vars["params"])[0]}
        g_paths = {"/".join(str(k.key) for k in p) for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]}
        assert w_paths == g_paths, f"missing={sorted(w_paths - g_paths)[:8]} extra={sorted(g_paths - w_paths)[:8]}"

    def test_frames_match(self, pair):
        import jax.numpy as jnp
        import torch

        tm, fm, variables, size = pair
        from speaker_diarization_tpu.models.redimnet import REDIMNET_SIZES

        feat = REDIMNET_SIZES[size]["feat_dim"]
        x = np.random.default_rng(0).standard_normal((2, 80, feat)).astype(np.float32)
        with torch.no_grad():
            t_out = tm.get_frame_level_feat(torch.from_numpy(x)).numpy()  # (B, T, D)
        f_out = np.asarray(fm.apply(variables, jnp.asarray(x), False, "frames"))
        assert f_out.shape == t_out.shape
        np.testing.assert_allclose(f_out, t_out, atol=2e-4)

    def test_embedding_matches(self, pair):
        import jax.numpy as jnp
        import torch

        tm, fm, variables, size = pair
        from speaker_diarization_tpu.models.redimnet import REDIMNET_SIZES

        feat = REDIMNET_SIZES[size]["feat_dim"]
        x = np.random.default_rng(1).standard_normal((2, 80, feat)).astype(np.float32)
        with torch.no_grad():
            _, t_emb = tm(torch.from_numpy(x))
        f_emb = np.asarray(fm.apply(variables, jnp.asarray(x), False, "embedding"))
        t_emb = t_emb.numpy()
        cos = (t_emb * f_emb).sum(-1) / (np.linalg.norm(t_emb, axis=-1) * np.linalg.norm(f_emb, axis=-1))
        assert (cos > 0.9999).all()
        np.testing.assert_allclose(f_emb, t_emb, atol=5e-4)
