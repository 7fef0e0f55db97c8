"""TS-VAD: target-speaker voice activity detection — the DER flagship.

Reference: `/root/reference/egs/alimeeting/ts_vad2/model.py:179-970`.
Pipeline (CAM++ config, label rate 25 Hz):

  audio (B, N) → kaldi fbank 80d @100 Hz (on device, mean-norm)
  → CAM++ frame encoder (512d @50 Hz)
  → Conv k5 s2 + BN + ReLU → 192d @25 Hz ("mix embeddings")
  → per speaker i<4: concat[target_emb_i ‖ mix] (384d) → +sinusoidal PE
    → shared 2-layer post-norm transformer ("single backend")
  → stack speakers, Conv k5 s1 (4·384→384) + BN + ReLU ("backend down")
  → +PE → 2-layer transformer ("multi backend") → Dense → (B, T25, 4) logits

TPU-first: the per-speaker python loop is folded into the batch axis
((B,4,T,D) → (B·4,T,D)) so the single backend runs as one big batched
matmul chain; fbank + CAM++ run under the same jit as the backends.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import features as F
from .campplus import CAMPPlus
from .transformer import TransformerEncoderLayer, sinusoidal_position_encoding


@dataclass(frozen=True)
class TSVADConfig:
    max_num_speaker: int = 4
    speaker_embed_dim: int = 192
    transformer_embed_dim: int = 384
    transformer_ffn_embed_dim: int = 1536
    num_attention_head: int = 4
    num_transformer_layer: int = 2
    dropout: float = 0.1
    sample_rate: int = 16000
    label_rate: int = 25
    feat_dim: int = 80  # fbank bins fed to CAM++
    encoder_block_layers: tuple = (12, 24, 16)  # CAM++ depth; shrink for tests
    single_backend_type: str = "transformer"  # transformer | conformer | mamba | mamba_add | mamba2 | mamba2_add
    # multi backend additionally accepts 'lstm' (reference lstm_ots_vad)
    multi_backend_type: str = "transformer"
    d_state: int = 64  # mamba state size (reference mamba2 cfg)
    expand: int = 2
    # campplus | wavlm | wavlm_weight_sum | w2vbert | hubert | wav2vec2 | mms
    # | whisper | resnet34 | simam_resnet34 | ecapa | eres2netv2 | redimnet_b*
    speech_encoder_type: str = "campplus"
    # use the fused MXU dense-block path for CAM++ at inference
    fused_encoder_inference: bool = True
    # whisper-as-speech-encoder (reference ts_vad2/model.py:556-580 +
    # whisper_encoder.py ModelDimensions: large-v2 trunk, blocks 16-23
    # concatenated → 50 Hz features → conv stride 2 down to 25 Hz)
    whisper_d_model: int = 1280
    whisper_n_layers: int = 32
    whisper_n_heads: int = 20
    whisper_n_mels: int = 80
    whisper_layer_st: int = 16
    whisper_layer_ed: int = 23
    # eres2netv2 trunk shape (reference ERes2NetV2_COMMON: 26/2/2;
    # ERes2NetV2_w24s4ep4_COMMON: 24/4/4)
    eres2net_base_width: int = 26
    eres2net_scale: int = 2
    eres2net_expansion: int = 2
    wavlm_layers: int = 12  # transformer layers used (reference select 6-12)
    wavlm_embed_dim: int = 768
    w2vbert_layers: int = 6  # reference best config uses the first 6 layers
    w2vbert_dim: int = 1024


class BackendTransformer(nn.Module):
    """Positional encoding + post-norm transformer stack (torch-equivalent)."""

    d_model: int
    n_layers: int
    n_heads: int
    d_ff: int
    dropout: float
    max_len: int = 4096
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pe = jnp.asarray(sinusoidal_position_encoding(self.max_len, self.d_model), dtype=x.dtype)
        x = x + pe[None, : x.shape[1]]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.n_layers):
            x = TransformerEncoderLayer(
                n_heads=self.n_heads, d_ff=self.d_ff, dropout=self.dropout, dtype=self.dtype, name=f"layer_{i}"
            )(x, None, deterministic)
        return x


class BackendConformer(nn.Module):
    """Conformer backend (reference 'conformer_ots_vad' option)."""

    d_model: int
    n_layers: int
    n_heads: int
    d_ff: int
    dropout: float
    conv_kernel: int = 31
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from .conformer import ConformerEncoder

        return ConformerEncoder(
            d_model=self.d_model,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            d_ff=self.d_ff,
            conv_kernel=self.conv_kernel,
            dropout=self.dropout,
            dtype=self.dtype,
            name="conformer",
        )(x, train=not deterministic)


class BackendBiLSTM(nn.Module):
    """BiLSTM backend projected back to d_model (reference 'lstm_ots_vad')."""

    d_model: int
    hidden: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype), name="lstm_fwd")(x)
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden, dtype=self.dtype), reverse=True, keep_order=True, name="lstm_bwd")(x)
        return nn.Dense(self.d_model, dtype=self.dtype, name="proj")(jnp.concatenate([fwd, bwd], axis=-1))


class ConvBnRelu(nn.Module):
    out_channels: int
    kernel: int = 5
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel,), strides=(self.stride,), padding=[(pad, pad)], dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class SpeechFeatUpsample(nn.Module):
    """ConvTranspose ×2 upsample 12.5 Hz → 25 Hz for ResNet-family encoders
    (reference SpeechFeatUpsample2, ts_vad2/model.py:114-134)."""

    out_channels: int
    upsample: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.out_channels, (5,), strides=(self.upsample,), padding="SAME", dtype=self.dtype, name="up")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class TSVADModel(nn.Module):
    """Audio + per-speaker target embeddings → per-speaker VAD logits."""

    cfg: TSVADConfig = TSVADConfig()
    remat_encoder: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        if c.speech_encoder_type == "campplus":
            self.speech_encoder = CAMPPlus(
                feat_dim=c.feat_dim,
                block_layers=c.encoder_block_layers,
                block_dilations=(1, 2, 2)[: len(c.encoder_block_layers)],
                remat=self.remat_encoder,
                dtype=self.dtype,
            )
        elif c.speech_encoder_type in ("wavlm", "wavlm_weight_sum", "hubert", "wav2vec2", "mms"):
            from .wavlm import WavLMFlaxConfig, WavLMModel

            # hubert / wav2vec2 / mms (reference model.py:449-493 — the
            # 'wav2vec2' type is the mms-300m/1b loader) share the trunk
            # minus WavLM's gated relative position bias; checkpoints load
            # via utils/torch_convert.hubert_torch_to_flax.
            wavlm_like = c.speech_encoder_type in ("wavlm", "wavlm_weight_sum")
            self.speech_encoder = WavLMModel(
                cfg=WavLMFlaxConfig(
                    encoder_layers=c.wavlm_layers,
                    encoder_embed_dim=c.wavlm_embed_dim,
                    encoder_ffn_embed_dim=4 * c.wavlm_embed_dim,
                    encoder_attention_heads=max(1, c.wavlm_embed_dim // 64),
                    relative_position_embedding=wavlm_like,
                    gru_rel_pos=wavlm_like,
                ),
                dtype=self.dtype,
            )
            if c.speech_encoder_type == "wavlm_weight_sum":
                # layer-weighted sum (reference WavLM_weight_sum, model.py:517)
                self.wavlm_weights = self.param("wavlm_weights", nn.initializers.zeros, (c.wavlm_layers,))
        elif c.speech_encoder_type == "w2vbert":
            from .w2vbert import W2vBertConfig, W2vBertModel

            self.speech_encoder = W2vBertModel(
                cfg=W2vBertConfig(
                    hidden_size=c.w2vbert_dim,
                    num_layers=c.w2vbert_layers,
                    num_heads=max(1, c.w2vbert_dim // 64),
                    intermediate_size=4 * c.w2vbert_dim,
                    feature_input_dim=2 * c.feat_dim,
                ),
                dtype=self.dtype,
            )
        elif c.speech_encoder_type == "whisper":
            from .whisper_encoder import WhisperEncoder, WhisperEncoderConfig

            # reference model.py:556-580: whisper runs its own log-mel front
            # end at 50 Hz output; blocks layer_st..layer_ed concatenated
            # (d_model·n_collected wide), then conv stride 2 → 25 Hz below.
            self.speech_encoder = WhisperEncoder(
                cfg=WhisperEncoderConfig(
                    n_mels=c.whisper_n_mels,
                    d_model=c.whisper_d_model,
                    n_heads=c.whisper_n_heads,
                    n_layers=c.whisper_n_layers,
                    d_ff=4 * c.whisper_d_model,
                ),
                layer_st=c.whisper_layer_st,
                layer_ed=c.whisper_layer_ed,
                dtype=self.dtype,
            )
        elif c.speech_encoder_type in ("resnet34", "simam_resnet34"):
            from .speaker_encoders import ResNet34, SimAMResNet34

            # reference resnet34_wespeaker / simam_resnet34_wespeaker wiring
            # (ts_vad2/model.py:584-630): 8× subsampled frames at 12.5 Hz,
            # upsampled ×2 to the 25 Hz label rate.
            if c.speech_encoder_type == "resnet34":
                self.speech_encoder = ResNet34(feat_dim=c.feat_dim, dtype=self.dtype)
            else:
                self.speech_encoder = SimAMResNet34(feat_dim=c.feat_dim, dtype=self.dtype)
        elif c.speech_encoder_type == "ecapa":
            from .speaker_encoders import ECAPA_TDNN

            # reference ecapa_channel_1024_wespeaker (model.py:632-655):
            # 100 Hz frames, stride-4 conv down to 25 Hz.
            self.speech_encoder = ECAPA_TDNN(channels=1024, feat_dim=c.feat_dim, dtype=self.dtype)
        elif c.speech_encoder_type == "eres2netv2":
            from .eres2net import ERes2NetV2

            # reference ERes2NetV2_COMMON / _w24s4ep4_COMMON wiring at
            # label_rate 25 (magicdata-ramc ts_vad2/model.py:586-615,1264):
            # stage-3 frames (get_frame_level_feat_frame_rate25, already
            # 25 Hz), stride-1 conv to speaker_embed_dim.
            self.speech_encoder = ERes2NetV2(
                feat_dim=c.feat_dim,
                base_width=c.eres2net_base_width,
                scale=c.eres2net_scale,
                expansion=c.eres2net_expansion,
                dtype=self.dtype,
            )
        elif c.speech_encoder_type.startswith("redimnet"):
            from .redimnet import ReDimNet

            # reference ReDimNetB* wiring (magicdata-ramc ts_vad2/model.py):
            # un-subsampled 100 Hz frames of dim C·F, stride-4 conv to 25 Hz.
            # cfg.feat_dim must match the size's fbank dim (72 for b1-b3, 60 for b0).
            self.speech_encoder = ReDimNet(size=c.speech_encoder_type.split("_")[-1], feat_dim=c.feat_dim, dtype=self.dtype)
        else:
            raise ValueError(f"unknown speech_encoder_type: {c.speech_encoder_type}")
        if c.speech_encoder_type in ("resnet34", "simam_resnet34"):
            self.speech_down = SpeechFeatUpsample(c.speaker_embed_dim, upsample=2, dtype=self.dtype)
        elif c.speech_encoder_type == "eres2netv2":
            # already at the 25 Hz label rate — no down/up-sampling
            self.speech_down = ConvBnRelu(c.speaker_embed_dim, kernel=5, stride=1, dtype=self.dtype)
        elif c.speech_encoder_type == "ecapa" or c.speech_encoder_type.startswith("redimnet"):
            self.speech_down = ConvBnRelu(c.speaker_embed_dim, kernel=5, stride=4, dtype=self.dtype)
        else:
            self.speech_down = ConvBnRelu(c.speaker_embed_dim, kernel=5, stride=2, dtype=self.dtype)
        if c.speaker_embed_dim * 2 != c.transformer_embed_dim:
            self.proj_layer = nn.Dense(c.transformer_embed_dim, dtype=self.dtype)
        else:
            self.proj_layer = None
        self.single_backend = self._make_backend(c.single_backend_type)
        self.backend_down = ConvBnRelu(c.transformer_embed_dim, kernel=5, stride=1, dtype=self.dtype)
        self.multi_backend = self._make_backend(c.multi_backend_type)
        self.fc = nn.Dense(c.max_num_speaker, dtype=self.dtype)
        self.rs_dropout = nn.Dropout(self.cfg.dropout)

    def _make_backend(self, kind: str):
        c = self.cfg
        if kind == "transformer":
            return BackendTransformer(
                d_model=c.transformer_embed_dim,
                n_layers=c.num_transformer_layer,
                n_heads=c.num_attention_head,
                d_ff=c.transformer_ffn_embed_dim,
                dropout=c.dropout,
                dtype=self.dtype,
            )
        if kind in ("mamba", "mamba_add"):
            from .mamba import BiMambaBlock

            return BiMambaBlock(
                d_model=c.transformer_embed_dim,
                n_layer=c.num_transformer_layer,
                d_state=c.d_state,
                expand=c.expand,
                merge="add" if kind == "mamba_add" else "concat",
                dtype=self.dtype,
            )
        if kind in ("mamba2", "mamba2_add"):
            from .mamba import BiMamba2Block

            return BiMamba2Block(
                d_model=c.transformer_embed_dim,
                n_layer=c.num_transformer_layer,
                d_state=c.d_state,
                expand=c.expand,
                merge="add" if kind == "mamba2_add" else "concat",
                dtype=self.dtype,
            )
        if kind == "conformer":
            # reference 'conformer_ots_vad' backend (model.py:258-267):
            # torchaudio Conformer, depthwise kernel 31
            return BackendConformer(
                d_model=c.transformer_embed_dim,
                n_layers=c.num_transformer_layer,
                n_heads=c.num_attention_head,
                d_ff=c.transformer_ffn_embed_dim,
                dropout=c.dropout,
                dtype=self.dtype,
            )
        if kind == "lstm":
            # reference 'lstm_ots_vad' multi backend (model.py:357-364)
            return BackendBiLSTM(d_model=c.transformer_embed_dim, dtype=self.dtype)
        raise ValueError(f"unknown backend type: {kind}")

    def encode_speech(self, audio_or_fbank, n_label_frames: int, train: bool = False, freeze_encoder: bool = False):
        """audio (B, N) or fbank (B, T100, feat) → mix embeddings (B, T25, D)."""
        c = self.cfg
        if c.speech_encoder_type == "wavlm_weight_sum":
            # raw waveform input; weighted sum over all transformer layers
            _, layers = self.speech_encoder.extract_features(audio_or_fbank, ret_layer_results=True)
            stacked = jnp.stack(layers[1:], axis=0)  # (L, B, T50, D)
            w = jax.nn.softmax(self.wavlm_weights)
            x = jnp.einsum("l,lbtd->btd", w, stacked)
        elif c.speech_encoder_type in ("wavlm", "hubert", "wav2vec2", "mms"):
            x = self.speech_encoder.extract_features(audio_or_fbank)  # (B, T50, 768)
        elif c.speech_encoder_type == "whisper":
            # raw audio (B, N) → whisper log-mel inside the encoder → 50 Hz
            # concat features (B, T50, d_model·n_collected)
            x = self.speech_encoder(audio_or_fbank)
        elif c.speech_encoder_type == "w2vbert":
            from .w2vbert import fbank_to_w2vbert_features

            if audio_or_fbank.ndim == 2:
                fbank = F.kaldi_fbank_auto(audio_or_fbank, sample_rate=c.sample_rate, num_mel_bins=c.feat_dim, mean_norm=True)
            else:
                fbank = audio_or_fbank
            x = self.speech_encoder(fbank_to_w2vbert_features(fbank))  # (B, T50, D)
        else:
            if audio_or_fbank.ndim == 2:
                fbank = F.kaldi_fbank_auto(audio_or_fbank, sample_rate=c.sample_rate, num_mel_bins=c.feat_dim, mean_norm=True)
            else:
                fbank = audio_or_fbank
            fbank = fbank.astype(self.dtype)
            mode = "frames25" if c.speech_encoder_type == "eres2netv2" else "frames"
            if (
                c.speech_encoder_type == "campplus"
                and c.fused_encoder_inference
                and not train
                and not self.is_initializing()
            ):
                # MXU-first fused dense blocks at inference (identical math;
                # kernels/cam_block_fused.py) — the round-4 answer to the
                # encoder-bound MFU 0.10 flagship profile
                from ..kernels.cam_block_fused import campplus_frames_fused

                x = campplus_frames_fused(
                    self.speech_encoder, dict(self.speech_encoder.variables), fbank
                )
            else:
                x = self.speech_encoder(fbank, train=train and not freeze_encoder, mode=mode)  # (B, T50, 512)
        if freeze_encoder:
            x = jax.lax.stop_gradient(x)
        x = self.speech_down(x, train=train)  # (B, T25, 192)
        # align to label length (reference model.py:853-857 allows ±2)
        T = x.shape[1]
        if T < n_label_frames:
            x = jnp.pad(x, ((0, 0), (0, n_label_frames - T), (0, 0)))
        x = x[:, :n_label_frames]
        return x

    def __call__(
        self,
        audio_or_fbank,
        target_embs,
        n_label_frames: Optional[int] = None,
        train: bool = False,
        freeze_encoder: bool = False,
    ):
        """→ logits (B, T25, max_num_speaker), float32.

        target_embs: (B, max_num_speaker, speaker_embed_dim); silence/absent
        speakers use zero vectors (dataset contract, ts_vad_dataset.py:508).
        """
        c = self.cfg
        if n_label_frames is None:
            if audio_or_fbank.ndim == 2:
                n100 = 1 + (audio_or_fbank.shape[-1] - int(0.025 * c.sample_rate)) // int(0.01 * c.sample_rate)
            else:
                n100 = audio_or_fbank.shape[1]
            n50 = -(-n100 // 2)
            n_label_frames = -(-n50 // 2)
        mix = self.encode_speech(audio_or_fbank, n_label_frames, train=train, freeze_encoder=freeze_encoder)
        B, T, D = mix.shape
        S = c.max_num_speaker

        ts = self.rs_dropout(target_embs.astype(self.dtype), deterministic=not train)  # (B, S, D)
        ts = jnp.broadcast_to(ts[:, :, None, :], (B, S, T, D))
        mixs = jnp.broadcast_to(mix[:, None, :, :], (B, S, T, D))
        cat = jnp.concatenate([ts, mixs], axis=-1)  # (B, S, T, 2D)
        if self.proj_layer is not None:
            cat = self.proj_layer(cat)
        F_dim = cat.shape[-1]
        # fold speakers into batch for the shared single backend
        cat = cat.reshape(B * S, T, F_dim)
        cat = self.single_backend(cat, deterministic=not train)  # (B·S, T, F)
        cat = cat.reshape(B, S, T, F_dim).transpose(0, 2, 1, 3).reshape(B, T, S * F_dim)
        cat = self.backend_down(cat, train=train)  # (B, T, F)
        out = self.multi_backend(cat, deterministic=not train)
        logits = self.fc(out).astype(jnp.float32)  # (B, T, S)
        return logits
