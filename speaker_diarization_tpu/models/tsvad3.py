"""TS-VAD3: TS-VAD with online enrollment-waveform speaker embeddings and
cross-attention feature fusion.

Reference: `egs/alimeeting/ts_vad3/model.py` — where TS-VAD2 consumes
offline-precomputed target-speaker embeddings, TS-VAD3 takes raw
enrollment waveforms (ts_len ≈ 6 s per speaker), runs them through a
jointly fine-tuned speaker encoder producing BOTH utterance-level
embeddings (the conditioning vectors) and frame-level features
(forward_speaker_encoder, model.py:947-981), and optionally fuses the
speaker-side features into the mixture path by scaled-dot-product
attention — query = mixture frames, key/value = the concatenated
speaker frames — at the fbank level and/or the encoder-feature level
(att_fuse_kernel / fuse_feat_speech_encoder_forward, model.py:982-1080).

TPU-first: enrollment speakers fold into the batch axis for the speaker
encoder ((B·S, T, F)); the fusion attention is one batched SDPA einsum;
everything shares a single jit with the TS-VAD backends.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import features as F
from .campplus import CAMPPlus
from .tsvad import BackendTransformer, ConvBnRelu, TSVADConfig


@dataclass(frozen=True)
class TSVAD3Config:
    base: TSVADConfig = field(default_factory=TSVADConfig)
    ts_len: float = 6.0  # enrollment seconds per speaker
    use_spk_embed: bool = False  # True → behave like TS-VAD2 (embeddings in)
    fuse_fbank_feat: bool = False  # attention-fuse speaker fbank into mixture fbank
    fuse_speaker_embedding_feat: bool = True  # fuse speaker frames into encoder feats
    att_fuse_dropout: float = 0.0
    speaker_encoder_layers: tuple = (12, 24, 16)  # CAM++ depth for the speaker side


class AttFuse(nn.Module):
    """SDPA fusion (ts_vad3 att_fuse_kernel): query = speech frames,
    key/value = speaker frames (all speakers concatenated along time);
    concat(attended, speech) → linear back to the speech dim."""

    out_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speaker_feat, speech_feat, deterministic: bool = True):
        # speaker_feat: (B, Tk, D); speech_feat: (B, Tq, D)
        D = speech_feat.shape[-1]
        scores = jnp.einsum("bqd,bkd->bqk", speech_feat, speaker_feat) / jnp.sqrt(
            jnp.asarray(D, speech_feat.dtype)
        )
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(speech_feat.dtype)
        w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
        att = jnp.einsum("bqk,bkd->bqd", w, speaker_feat)
        fused = jnp.concatenate([att, speech_feat], axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(fused)


class TSVAD3Model(nn.Module):
    """Mixture audio + per-speaker enrollment waveforms → VAD logits."""

    cfg: TSVAD3Config = TSVAD3Config()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg.base
        self.speech_encoder = CAMPPlus(
            feat_dim=c.feat_dim,
            block_layers=c.encoder_block_layers,
            block_dilations=(1, 2, 2)[: len(c.encoder_block_layers)],
            dtype=self.dtype,
        )
        if not self.cfg.use_spk_embed:
            self.speaker_encoder = CAMPPlus(
                feat_dim=c.feat_dim,
                embedding_size=c.speaker_embed_dim,
                block_layers=self.cfg.speaker_encoder_layers,
                block_dilations=(1, 2, 2)[: len(self.cfg.speaker_encoder_layers)],
                dtype=self.dtype,
            )
        if self.cfg.fuse_fbank_feat:
            self.fuse_fbank_module = AttFuse(c.feat_dim, self.cfg.att_fuse_dropout, dtype=self.dtype)
        if self.cfg.fuse_speaker_embedding_feat and not self.cfg.use_spk_embed:
            self.fuse_frame_module = AttFuse(512, self.cfg.att_fuse_dropout, dtype=self.dtype)
        self.speech_down = ConvBnRelu(c.speaker_embed_dim, kernel=5, stride=2, dtype=self.dtype)
        self.single_backend = BackendTransformer(
            d_model=c.transformer_embed_dim, n_layers=c.num_transformer_layer,
            n_heads=c.num_attention_head, d_ff=c.transformer_ffn_embed_dim,
            dropout=c.dropout, dtype=self.dtype,
        )
        self.backend_down = ConvBnRelu(c.transformer_embed_dim, kernel=5, stride=1, dtype=self.dtype)
        self.multi_backend = BackendTransformer(
            d_model=c.transformer_embed_dim, n_layers=c.num_transformer_layer,
            n_heads=c.num_attention_head, d_ff=c.transformer_ffn_embed_dim,
            dropout=c.dropout, dtype=self.dtype,
        )
        self.fc = nn.Dense(c.max_num_speaker, dtype=self.dtype)
        self.rs_dropout = nn.Dropout(c.dropout)

    def _fbank(self, audio):
        c = self.cfg.base
        return F.kaldi_fbank_auto(
            audio, sample_rate=c.sample_rate, num_mel_bins=c.feat_dim, mean_norm=True
        ).astype(self.dtype)

    def __call__(
        self,
        audio,
        targets,
        n_label_frames=None,
        train: bool = False,
        freeze_speech_encoder: bool = False,
        freeze_speaker_encoder: bool = False,
    ):
        """audio (B, N); targets (B, S, Nts) enrollment waveforms, or
        (B, S, D) embeddings when cfg.use_spk_embed. → logits (B, T25, S)."""
        c = self.cfg.base
        S = c.max_num_speaker
        mix_fbank = self._fbank(audio)  # (B, T100, feat)
        if n_label_frames is None:
            n50 = -(-mix_fbank.shape[1] // 2)
            n_label_frames = -(-n50 // 2)

        if self.cfg.use_spk_embed:
            spk_utt = targets.astype(self.dtype)  # (B, S, D)
            spk_frames = None
            spk_fbank = None
        else:
            B, S_in, Nts = targets.shape
            assert S_in == S
            ts_fbank = self._fbank(targets.reshape(B * S, Nts))  # (B·S, Tts, feat)
            utt, frames = self.speaker_encoder(
                ts_fbank, train=train and not freeze_speaker_encoder, mode="both"
            )
            if freeze_speaker_encoder:
                utt = jax.lax.stop_gradient(utt)
                frames = jax.lax.stop_gradient(frames)
            spk_utt = utt.reshape(B, S, -1)  # (B, S, D) utterance embeddings
            spk_frames = frames.reshape(B, -1, frames.shape[-1])  # (B, S·T50, 512)
            spk_fbank = ts_fbank.reshape(B, -1, ts_fbank.shape[-1])  # (B, S·Tts, feat)

        if self.cfg.fuse_fbank_feat and spk_fbank is not None:
            mix_fbank = self.fuse_fbank_module(spk_fbank, mix_fbank, deterministic=not train)

        x = self.speech_encoder(mix_fbank, train=train and not freeze_speech_encoder, mode="frames")
        if freeze_speech_encoder:
            x = jax.lax.stop_gradient(x)
        if self.cfg.fuse_speaker_embedding_feat and spk_frames is not None:
            x = self.fuse_frame_module(spk_frames, x, deterministic=not train)
        x = self.speech_down(x, train=train)  # (B, T25, emb)
        T = x.shape[1]
        if T < n_label_frames:
            x = jnp.pad(x, ((0, 0), (0, n_label_frames - T), (0, 0)))
        x = x[:, :n_label_frames]

        B, T, D = x.shape
        ts = self.rs_dropout(spk_utt, deterministic=not train)
        ts = jnp.broadcast_to(ts[:, :, None, :], (B, S, T, ts.shape[-1]))
        mixs = jnp.broadcast_to(x[:, None, :, :], (B, S, T, D))
        cat = jnp.concatenate([ts, mixs], axis=-1).reshape(B * S, T, -1)
        h = self.single_backend(cat, deterministic=not train)  # (B·S, T, d)
        h = h.reshape(B, S, T, -1).transpose(0, 2, 1, 3).reshape(B, T, -1)
        h = self.backend_down(h, train=train)
        h = self.multi_backend(h, deterministic=not train)
        return self.fc(h).astype(jnp.float32)
