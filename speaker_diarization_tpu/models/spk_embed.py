"""Speaker-embedding pretraining: encoder + AAM-softmax classifier.

The reference consumes externally pretrained speaker encoders (modelscope
CAM++, wespeaker ResNet/ECAPA — ts_vad2 embedding-extraction scripts,
model registry in generate_chunk_speaker_embedding_from_modelscope_for_
diarization.py:52-120); the training recipes themselves live outside the
repo. For a standalone framework we provide the missing piece: utterance-
level speaker classification with additive-angular-margin softmax (the
objective those checkpoints were trained with), so the whole
encoder → enrollment → TS-VAD pipeline can run end-to-end with no external
weights. Trained encoders export via the CLI (`export-encoder`) and plug
into `extract-embeddings`.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import l2_normalize
from .campplus import CAMPPlus


@dataclass(frozen=True)
class SpkEmbedConfig:
    n_classes: int = 100
    encoder: str = "campplus"  # campplus | ecapa | resnet34
    feat_dim: int = 80
    emb_dim: int = 192
    margin: float = 0.2  # AAM margin m
    scale: float = 32.0  # AAM scale s
    encoder_blocks: tuple = (12, 24, 16)  # CAM++ depth; shrink for tests
    ecapa_channels: int = 512


class SpeakerClassifier(nn.Module):
    cfg: SpkEmbedConfig = SpkEmbedConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        if c.encoder == "campplus":
            self.speech_encoder = CAMPPlus(
                feat_dim=c.feat_dim, embedding_size=c.emb_dim,
                block_layers=c.encoder_blocks,
                block_dilations=(1, 2, 2)[: len(c.encoder_blocks)],
                dtype=self.dtype,
            )
        elif c.encoder == "ecapa":
            from .speaker_encoders import ECAPA_TDNN

            self.speech_encoder = ECAPA_TDNN(
                channels=c.ecapa_channels, feat_dim=c.feat_dim, embed_dim=c.emb_dim, dtype=self.dtype
            )
        elif c.encoder == "resnet34":
            from .speaker_encoders import ResNet34

            self.speech_encoder = ResNet34(feat_dim=c.feat_dim, embed_dim=c.emb_dim, dtype=self.dtype)
        else:
            raise ValueError(f"unknown encoder {c.encoder}")
        # AAM weight matrix (class centroids on the unit sphere)
        self.aam_weight = self.param(
            "aam_weight", nn.initializers.xavier_normal(), (c.n_classes, c.emb_dim)
        )

    def embed(self, fbank, train: bool = False):
        """fbank (B, T100, F) → L2-normalized embedding (B, emb_dim)."""
        e = self.speech_encoder(fbank.astype(self.dtype), train=train, mode="embedding")
        return l2_normalize(e.astype(jnp.float32))

    def __call__(self, fbank, labels=None, train: bool = False):
        """→ scaled cosine logits (B, n_classes); with labels, the target
        class gets the additive angular margin cos(θ+m) (AAM-softmax)."""
        c = self.cfg
        e = self.embed(fbank, train)
        W = l2_normalize(jnp.asarray(self.aam_weight, jnp.float32))
        cos = jnp.clip(e @ W.T, -0.9999, 0.9999)
        if labels is not None:
            theta = jnp.arccos(cos)
            onehot = jax.nn.one_hot(labels, c.n_classes)
            cos = jnp.cos(theta + onehot * c.margin)
        return cos * c.scale


# ---------------------------------------------------------------------------
# Trained-encoder export/import (CLI export-encoder → extract-embeddings)
# ---------------------------------------------------------------------------


def save_encoder(path: str, cfg: SpkEmbedConfig, variables) -> None:
    """Serialize the speech-encoder subtree + config to npz."""
    import json

    import numpy as np
    from flax.traverse_util import flatten_dict

    flat = {
        "/".join(k): np.asarray(v)
        for k, v in flatten_dict(variables).items()
    }
    meta = dict(
        encoder=cfg.encoder, feat_dim=cfg.feat_dim, emb_dim=cfg.emb_dim,
        encoder_blocks=list(cfg.encoder_blocks), ecapa_channels=cfg.ecapa_channels,
    )
    np.savez(path, __cfg__=json.dumps(meta), **flat)


def load_encoder(path: str):
    """→ (encoder module, variables) ready for `.apply(vars, fbank, False,
    "embedding")`."""
    import json

    import numpy as np
    from flax.traverse_util import unflatten_dict

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__cfg__"]))
    variables = unflatten_dict(
        {tuple(k.split("/")): data[k] for k in data.files if k != "__cfg__"}
    )
    cfg = SpkEmbedConfig(
        n_classes=1, encoder=meta["encoder"], feat_dim=meta["feat_dim"],
        emb_dim=meta["emb_dim"], encoder_blocks=tuple(meta["encoder_blocks"]),
        ecapa_channels=meta.get("ecapa_channels", 512),
    )
    if cfg.encoder == "campplus":
        module = CAMPPlus(
            feat_dim=cfg.feat_dim, embedding_size=cfg.emb_dim,
            block_layers=cfg.encoder_blocks,
            block_dilations=(1, 2, 2)[: len(cfg.encoder_blocks)],
        )
    elif cfg.encoder == "ecapa":
        from .speaker_encoders import ECAPA_TDNN

        module = ECAPA_TDNN(channels=cfg.ecapa_channels, feat_dim=cfg.feat_dim, embed_dim=cfg.emb_dim)
    elif cfg.encoder == "resnet34":
        from .speaker_encoders import ResNet34

        module = ResNet34(feat_dim=cfg.feat_dim, embed_dim=cfg.emb_dim)
    else:
        raise ValueError(cfg.encoder)
    return module, variables
