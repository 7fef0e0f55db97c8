"""Torch checkpoint → flax params conversion for the speaker-encoder zoo.

The reference's DER numbers depend on pretrained speaker encoders (CAM++
from modelscope etc., SURVEY.md §7 'pretrained-weight parity'). This module
maps a torch `state_dict` into the flax parameter/batch-stats pytrees of our
reimplementations. Pure tensor-name/layout mapping — no torch execution
needed (state dicts load with `torch.load(..., map_location='cpu')` or from
numpy archives).

Layout rules:
  Conv1d (out, in, k)      → flax Conv kernel (k, in, out)
  Conv2d (out, in, kh, kw) → flax Conv kernel (kh, kw, in, out)
  Linear (out, in)         → flax Dense kernel (in, out)
  BatchNorm weight/bias/running_mean/running_var
                           → params …/bn{scale,bias} + batch_stats …/bn{mean,var}
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def campplus_torch_to_flax(state_dict: Dict[str, "np.ndarray"], prefix: str = "") -> Tuple[dict, dict]:
    """Convert a reference CAMPPlus state_dict to (params, batch_stats).

    `prefix` strips a leading scope (e.g. 'speech_encoder.'). Tensor names
    follow cam_pplus_wespeaker.py; our module names mirror them
    (models/campplus.py).
    """
    params: dict = {}
    stats: dict = {}

    def conv_k(w):
        w = _np(w)
        if w.ndim == 3:
            return w.transpose(2, 1, 0)
        if w.ndim == 4:
            return w.transpose(2, 3, 1, 0)
        raise ValueError(w.shape)

    for name, w in state_dict.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")

        # ---- FCM head ----
        if parts[0] == "head":
            if parts[1] in ("conv1", "conv2"):
                _set(params, ("head", parts[1], "kernel"), conv_k(w))
            elif parts[1] in ("bn1", "bn2"):
                _map_bn(params, stats, ("head", parts[1]), parts[2], w)
            elif parts[1] in ("layer1", "layer2"):
                blk = f"{parts[1]}_{parts[2]}"
                sub = parts[3]
                if sub in ("conv1", "conv2"):
                    _set(params, ("head", blk, sub, "kernel"), conv_k(w))
                elif sub in ("bn1", "bn2"):
                    _map_bn(params, stats, ("head", blk, sub), parts[4], w)
                elif sub == "shortcut":
                    if parts[4] == "0":
                        _set(params, ("head", blk, "shortcut_conv", "kernel"), conv_k(w))
                    else:
                        _map_bn(params, stats, ("head", blk, "shortcut_bn"), parts[5], w)
            continue

        # ---- xvector trunk ----
        if parts[0] == "xvector":
            rest = parts[1:]
            if rest[0] == "tdnn":
                if rest[1] == "linear":
                    _set(params, ("tdnn", "conv", "kernel"), conv_k(w))
                else:  # nonlinear.batchnorm.*
                    _map_bn(params, stats, ("tdnn", "nonlinear", "bn"), rest[-1], w)
            elif re.match(r"block\d+", rest[0]):
                blk, layer = rest[0], rest[1]  # tdnndN
                sub = rest[2]
                if sub in ("nonlinear1", "nonlinear2"):
                    _map_bn(params, stats, (blk, layer, sub, "bn"), rest[-1], w)
                elif sub == "linear1":
                    _set(params, (blk, layer, "linear1", "kernel"), conv_k(w))
                elif sub == "cam_layer":
                    which = rest[3]
                    if rest[4] == "weight":
                        _set(params, (blk, layer, "cam_layer", which, "kernel"), conv_k(w))
                    else:
                        _set(params, (blk, layer, "cam_layer", which, "bias"), w)
            elif re.match(r"transit\d+", rest[0]):
                if rest[1] == "linear":
                    _set(params, (rest[0], "linear", "kernel"), conv_k(w))
                else:
                    _map_bn(params, stats, (rest[0], "nonlinear", "bn"), rest[-1], w)
            elif rest[0] == "out_nonlinear":
                _map_bn(params, stats, ("out_nonlinear", "bn"), rest[-1], w)
            elif rest[0] == "dense":
                if rest[1] == "linear":
                    _set(params, ("dense_linear", "kernel"), _np(w)[:, :, 0].T)
                else:  # nonlinear.batchnorm: affine=False → stats only
                    _map_bn(params, stats, ("dense_nonlinear", "bn"), rest[-1], w)
            continue
    return params, stats


def _map_bn(params, stats, path, leaf, w):
    if leaf == "weight":
        _set(params, path + ("scale",), w)
    elif leaf == "bias":
        _set(params, path + ("bias",), w)
    elif leaf == "running_mean":
        _set(stats, path + ("mean",), w)
    elif leaf == "running_var":
        _set(stats, path + ("var",), w)
    # num_batches_tracked: ignored


def wavlm_torch_to_flax(state_dict: Dict[str, "np.ndarray"], prefix: str = "") -> dict:
    """Convert a reference WavLM state_dict to flax params (models/wavlm.py).

    The conv positional embedding's weight-norm parametrization
    (original0 = g along dim 2, original1 = v) is folded into a dense
    kernel here.
    """
    params: dict = {}
    sd = {}
    for k, v in state_dict.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        sd[k] = _np(v)

    # fold pos_conv weight norm: w = g * v / ||v|| over dims (0, 1)
    g = sd.get("encoder.pos_conv.0.parametrizations.weight.original0")
    v = sd.get("encoder.pos_conv.0.parametrizations.weight.original1")
    if g is None:  # older serialization: weight_g / weight_v
        g = sd.get("encoder.pos_conv.0.weight_g")
        v = sd.get("encoder.pos_conv.0.weight_v")
    if g is not None and v is not None:
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)  # (out, in/groups, k)
        _set(params, ("pos_conv", "kernel"), w.transpose(2, 1, 0))
    if "encoder.pos_conv.0.bias" in sd:
        _set(params, ("pos_conv", "bias"), sd["encoder.pos_conv.0.bias"])

    for name, w in sd.items():
        parts = name.split(".")
        if name.startswith("feature_extractor.conv_layers."):
            i = parts[2]
            if parts[3] == "0" and parts[-1] == "weight":  # conv
                _set(params, ("feature_extractor", f"conv_{i}", "kernel"), w.transpose(2, 1, 0))
            elif parts[3] == "2":  # group norm (layer 0, 'default' mode)
                leaf = "scale" if parts[-1] == "weight" else "bias"
                _set(params, ("feature_extractor", "gn0", leaf), w)
        elif name in ("layer_norm.weight", "layer_norm.bias"):
            _set(params, ("layer_norm", "scale" if parts[-1] == "weight" else "bias"), w)
        elif name.startswith("post_extract_proj."):
            _set(params, ("post_extract_proj", "kernel" if parts[-1] == "weight" else "bias"),
                 w.T if parts[-1] == "weight" else w)
        elif name in ("encoder.layer_norm.weight", "encoder.layer_norm.bias"):
            _set(params, ("encoder_layer_norm", "scale" if parts[-1] == "weight" else "bias"), w)
        elif name == "encoder.layers.0.self_attn.relative_attention_bias.weight":
            _set(params, ("relative_attention_bias",), w)
        elif name.startswith("encoder.layers."):
            i = parts[2]
            sub = parts[3]
            if sub == "self_attn":
                which = parts[4]
                if which in ("q_proj", "k_proj", "v_proj", "out_proj", "grep_linear"):
                    _set(
                        params,
                        (f"layer_{i}", "self_attn", which, "kernel" if parts[-1] == "weight" else "bias"),
                        w.T if parts[-1] == "weight" else w,
                    )
                elif which == "grep_a":
                    _set(params, (f"layer_{i}", "self_attn", "grep_a"), w)
            elif sub in ("self_attn_layer_norm", "final_layer_norm"):
                _set(params, (f"layer_{i}", sub, "scale" if parts[-1] == "weight" else "bias"), w)
            elif sub in ("fc1", "fc2"):
                _set(params, (f"layer_{i}", sub, "kernel" if parts[-1] == "weight" else "bias"),
                     w.T if parts[-1] == "weight" else w)
    return params


def whisper_torch_to_flax(state_dict: Dict[str, "np.ndarray"], prefix: str = "") -> dict:
    """Convert a transformers WhisperEncoder state_dict to flax params
    (models/whisper_encoder.py). Official OpenAI checkpoints use the same
    tensor shapes with different names; rename before calling."""
    params: dict = {}
    for name, w in state_dict.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] in ("conv1", "conv2"):
            leaf = "kernel" if parts[1] == "weight" else "bias"
            _set(params, (parts[0], leaf), w.transpose(2, 1, 0) if leaf == "kernel" else w)
        elif parts[0] == "embed_positions":
            _set(params, ("embed_positions",), w)
        elif parts[0] == "layer_norm":
            _set(params, ("ln_post", "scale" if parts[1] == "weight" else "bias"), w)
        elif parts[0] == "layers":
            i, sub = parts[1], parts[2]
            blk = f"block_{i}"
            if sub == "self_attn":
                which = parts[3]
                _set(params, (blk, "attn", which, "kernel" if parts[-1] == "weight" else "bias"),
                     w.T if parts[-1] == "weight" else w)
            elif sub == "self_attn_layer_norm":
                _set(params, (blk, "attn_ln", "scale" if parts[-1] == "weight" else "bias"), w)
            elif sub == "final_layer_norm":
                _set(params, (blk, "mlp_ln", "scale" if parts[-1] == "weight" else "bias"), w)
            elif sub in ("fc1", "fc2"):
                _set(params, (blk, sub, "kernel" if parts[-1] == "weight" else "bias"),
                     w.T if parts[-1] == "weight" else w)
    return params


def w2vbert_torch_to_flax(state_dict: Dict[str, "np.ndarray"], prefix: str = "") -> dict:
    """Convert a transformers Wav2Vec2BertModel state_dict to flax params
    (models/w2vbert.py)."""
    params: dict = {}
    for name, w in state_dict.items():
        if prefix:
            if not name.startswith(prefix):
                continue
            name = name[len(prefix):]
        w = _np(w)
        parts = name.split(".")
        if parts[0] == "masked_spec_embed":
            continue
        if parts[0] == "feature_projection":
            if parts[1] == "layer_norm":
                _set(params, ("fp_layer_norm", "scale" if parts[-1] == "weight" else "bias"), w)
            else:
                _set(params, ("fp_projection", "kernel" if parts[-1] == "weight" else "bias"),
                     w.T if parts[-1] == "weight" else w)
            continue
        if parts[0] == "encoder" and parts[1] == "layers":
            i, sub = parts[2], parts[3]
            blk = f"layer_{i}"
            if sub in ("ffn1_layer_norm", "ffn2_layer_norm", "self_attn_layer_norm", "final_layer_norm"):
                _set(params, (blk, sub, "scale" if parts[-1] == "weight" else "bias"), w)
            elif sub in ("ffn1", "ffn2"):
                which = parts[4]  # intermediate_dense | output_dense
                _set(params, (blk, sub, which, "kernel" if parts[-1] == "weight" else "bias"),
                     w.T if parts[-1] == "weight" else w)
            elif sub == "self_attn":
                which = parts[4]
                if which == "distance_embedding":
                    _set(params, (blk, "self_attn", "distance_embedding"), w)
                else:
                    _set(params, (blk, "self_attn", which, "kernel" if parts[-1] == "weight" else "bias"),
                         w.T if parts[-1] == "weight" else w)
            elif sub == "conv_module":
                which = parts[4]
                if which in ("layer_norm", "depthwise_layer_norm"):
                    _set(params, (blk, "conv_module", which, "scale" if parts[-1] == "weight" else "bias"), w)
                elif which in ("pointwise_conv1", "pointwise_conv2"):
                    # torch Conv1d (out, in, 1) → flax (1, in, out)
                    _set(params, (blk, "conv_module", which, "kernel"), w.transpose(2, 1, 0))
                elif which == "depthwise_conv":
                    # torch depthwise (out, 1, k) → flax (k, 1, out)
                    _set(params, (blk, "conv_module", which, "kernel"), w.transpose(2, 1, 0))
    return params


def hubert_torch_to_flax(state_dict: Dict[str, "np.ndarray"], prefix: str = "") -> dict:
    """Convert a transformers HubertModel / Wav2Vec2Model state_dict to the
    flax WavLM trunk (models/wavlm.py with relative_position_embedding=False,
    gru_rel_pos=False — HuBERT/wav2vec2 are that architecture minus the
    gated relative bias)."""
    params: dict = {}
    sd = {}
    for k, v in state_dict.items():
        if prefix:
            if not k.startswith(prefix):
                continue
            k = k[len(prefix):]
        sd[k] = _np(v)

    g = sd.get("encoder.pos_conv_embed.conv.parametrizations.weight.original0")
    v = sd.get("encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    if g is None:
        g = sd.get("encoder.pos_conv_embed.conv.weight_g")
        v = sd.get("encoder.pos_conv_embed.conv.weight_v")
    if g is not None and v is not None:
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
        _set(params, ("pos_conv", "kernel"), w.transpose(2, 1, 0))
    if "encoder.pos_conv_embed.conv.bias" in sd:
        _set(params, ("pos_conv", "bias"), sd["encoder.pos_conv_embed.conv.bias"])

    for name, w in sd.items():
        parts = name.split(".")
        if name.startswith("feature_extractor.conv_layers."):
            i = parts[2]
            if parts[3] == "conv" and parts[-1] == "weight":
                _set(params, ("feature_extractor", f"conv_{i}", "kernel"), w.transpose(2, 1, 0))
            elif parts[3] == "layer_norm":  # GroupNorm on layer 0 ('group' mode)
                _set(params, ("feature_extractor", "gn0", "scale" if parts[-1] == "weight" else "bias"), w)
        elif name.startswith("feature_projection.layer_norm."):
            _set(params, ("layer_norm", "scale" if parts[-1] == "weight" else "bias"), w)
        elif name.startswith("feature_projection.projection."):
            _set(params, ("post_extract_proj", "kernel" if parts[-1] == "weight" else "bias"),
                 w.T if parts[-1] == "weight" else w)
        elif name in ("encoder.layer_norm.weight", "encoder.layer_norm.bias"):
            _set(params, ("encoder_layer_norm", "scale" if parts[-1] == "weight" else "bias"), w)
        elif name.startswith("encoder.layers."):
            i, sub = parts[2], parts[3]
            blk = f"layer_{i}"
            if sub == "attention":
                which = parts[4]
                _set(params, (blk, "self_attn", which, "kernel" if parts[-1] == "weight" else "bias"),
                     w.T if parts[-1] == "weight" else w)
            elif sub == "layer_norm":
                _set(params, (blk, "self_attn_layer_norm", "scale" if parts[-1] == "weight" else "bias"), w)
            elif sub == "final_layer_norm":
                _set(params, (blk, "final_layer_norm", "scale" if parts[-1] == "weight" else "bias"), w)
            elif sub == "feed_forward":
                which = "fc1" if parts[4] == "intermediate_dense" else "fc2"
                _set(params, (blk, which, "kernel" if parts[-1] == "weight" else "bias"),
                     w.T if parts[-1] == "weight" else w)
    return params


def load_campplus_checkpoint(path: str, prefix: str = "") -> Tuple[dict, dict]:
    """Load a torch .pt/.bin CAM++ checkpoint into flax (params, batch_stats)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return campplus_torch_to_flax(sd, prefix=prefix)
