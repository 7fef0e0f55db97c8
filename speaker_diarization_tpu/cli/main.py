"""Command-line interface: simulate / train / infer / score / extract-embeddings.

The TPU-native replacement for the reference's numbered-stage shell recipes
(`egs/*/run_*.sh`): each stage is a subcommand over the library, driven by
one YAML config + dotted overrides instead of per-recipe argparse forests.

    python -m speaker_diarization_tpu.cli simulate --out /tmp/corpus ...
    python -m speaker_diarization_tpu.cli train --family eend --train-dir ...
    python -m speaker_diarization_tpu.cli infer --family eend --ckpt ...
    python -m speaker_diarization_tpu.cli score --ref ref.rttm --sys hyp.rttm -c 0.25
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys
from typing import Optional


def _setup_logging(verbose: bool):
    logging.basicConfig(
        level=logging.DEBUG if verbose else logging.INFO,
        format="%(asctime)s %(levelname)s [%(name)s] %(message)s",
    )


# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainCliConfig:
    family: str = "eend"  # eend | eend_eda | tsvad
    # model
    n_speakers: int = 2
    max_attractors: int = 15
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    d_ff: int = 1024
    dropout: float = 0.1
    encoder_type: str = "transformer"  # eend_eda: transformer | conformer
    bf16: bool = False
    remat: bool = False
    # frontend (EEND family)
    sample_rate: int = 8000
    frame_size: int = 200
    frame_shift: int = 80
    n_mels: int = 23
    context_size: int = 7
    subsampling: int = 10
    chunk_frames: int = 500
    # tsvad
    rs_len: float = 4.0
    segment_shift: float = 2.0
    speech_encoder_type: str = "campplus"
    single_backend_type: str = "transformer"  # transformer|conformer|mamba|mamba_add|mamba2|mamba2_add
    multi_backend_type: str = "transformer"  # + lstm
    d_state: int = 64
    expand: int = 2
    # tsvad_streaming (reference ts_vad2_streaming: static_chunk_size 64
    # @100 Hz = 16 frames @25 Hz; num_left_chunks history window)
    streaming_chunk_size: int = 16
    streaming_left_chunks: int = 4
    # ssnd (on-the-fly simulated mixtures, reference simu_diar_dataset.py)
    ssnd_overlap_prob: float = 0.3
    ssnd_sil_scale: float = 1.0
    # reference --arcface-weight (train_accelerate_ddp.py:305, default 0.01)
    ssnd_arcface_weight: float = 0.01
    # fraction of each batch drawn from --real-data-dir meeting blocks
    # (reference dual simu+real protocol, train_one_epoch_multi)
    ssnd_real_ratio: float = 0.5
    # trunk depth override for CAM++/ResNet-style frame extractors
    # ("12,24,16" = reference CAM++; smaller for smoke tests)
    encoder_blocks: str = ""
    # eend_vc
    all_n_speakers: int = 0
    # spk (speaker-embedding pretraining)
    spk_dur: float = 2.0  # crop seconds per training utterance
    aam_margin: float = 0.2
    aam_scale: float = 32.0
    # tsvad: stop-gradient the (pretrained) speech encoder for this run
    # (reference freeze_speech_encoder_updates, model.py:771)
    freeze_encoder: bool = False
    # speech-enhancement hook applied to chunk audio (reference
    # ts_vad_dataset.py:423-492): '' = off, 'dsp' or 'neural:<npz>'; at
    # train it fires with enhance_prob, at eval deterministically
    enhancer: str = ""
    enhance_prob: float = 0.5
    # tsvad3 (online enrollment-waveform embeddings, egs/alimeeting/ts_vad3)
    ts_len: float = 6.0  # enrollment seconds per speaker
    fuse_fbank_feat: bool = False
    fuse_speaker_embedding_feat: bool = True
    # optimization
    batch_size: int = 16
    num_steps: int = 10000
    optimizer: str = "adam"
    schedule: str = "noam"
    learning_rate: float = 1.0
    warmup_steps: int = 25000
    grad_clip_norm: float = 5.0
    grad_accum_steps: int = 1
    model_avg_decay: float = 0.0
    seed: int = 777
    # loop
    log_every: int = 50
    valid_every: int = 500
    n_data: int = 0  # 0 = all devices


def _frontend_from_cfg(cfg: TrainCliConfig):
    from ..models.eend import FrontendConfig

    return FrontendConfig(
        sample_rate=cfg.sample_rate,
        frame_size=cfg.frame_size,
        frame_shift=cfg.frame_shift,
        n_mels=cfg.n_mels,
        context_size=cfg.context_size,
        subsampling=cfg.subsampling,
    )



def _normalize_cfg(cfg: TrainCliConfig) -> TrainCliConfig:
    """Per-family invariants applied after --set overrides.

    eend_m2f: the ×10 subsampling lives in the conv backbone
    (reference backbone.py:7) and masks are scored at the input frame rate,
    so the frontend/dataset must run unsubsampled and unspliced.
    """
    if cfg.family == "eend_m2f" and (cfg.subsampling != 1 or cfg.context_size != 0):
        import logging

        logging.info("eend_m2f: forcing subsampling=1 context_size=0 (backbone does the x10)")
        cfg = dataclasses.replace(cfg, subsampling=1, context_size=0)
    return cfg


def _blocks_override(cfg: TrainCliConfig, default: tuple) -> tuple:
    if not cfg.encoder_blocks:
        return default
    return tuple(int(x) for x in cfg.encoder_blocks.split(","))


def _build_model(cfg: TrainCliConfig):
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if cfg.bf16 else jnp.float32
    common = dict(
        d_model=cfg.d_model, n_layers=cfg.n_layers, n_heads=cfg.n_heads,
        d_ff=cfg.d_ff, dropout=cfg.dropout, remat=cfg.remat, dtype=dtype,
    )
    if cfg.family == "eend":
        from ..models import EENDModel

        return EENDModel(n_speakers=cfg.n_speakers, frontend=_frontend_from_cfg(cfg), **common)
    if cfg.family == "eend_eda":
        from ..models import EendEdaModel

        return EendEdaModel(
            n_speakers=cfg.n_speakers, max_attractors=cfg.max_attractors,
            encoder_type=cfg.encoder_type, conv_norm="group",
            frontend=_frontend_from_cfg(cfg), **common,
        )
    if cfg.family == "fs_eend":
        from ..models.fs_eend import FSEENDModel

        c2 = {k: v for k, v in common.items() if k not in ("n_layers", "remat")}
        return FSEENDModel(
            n_speakers=cfg.n_speakers, enc_layers=cfg.n_layers, dec_layers=max(cfg.n_layers // 2, 1),
            frontend=_frontend_from_cfg(cfg), **c2,
        )
    if cfg.family == "eend_vc":
        from ..models.eend_vc import EENDVCModel

        c2 = {k: v for k, v in common.items() if k != "remat"}
        return EENDVCModel(
            n_speakers=cfg.n_speakers, all_n_speakers=cfg.all_n_speakers,
            frontend=_frontend_from_cfg(cfg), **c2,
        )
    if cfg.family == "vad":
        from ..models import NeuralVAD, NeuralVADConfig

        return NeuralVAD(
            cfg=NeuralVADConfig(
                sample_rate=cfg.sample_rate, frame_size=cfg.frame_size,
                frame_shift=cfg.frame_shift,
            ),
            dtype=dtype,
        )
    if cfg.family == "tsvad":
        from ..models import TSVADConfig, TSVADModel

        # n_mels defaults to the EEND frontend's 23; TS-VAD's CAM++ fbank is
        # 80-dim (reference FBank feat_dim, ts_vad_dataset.py:29) unless set
        feat_dim = cfg.n_mels if cfg.n_mels != 23 else 80
        return TSVADModel(
            cfg=TSVADConfig(
                max_num_speaker=cfg.n_speakers if cfg.n_speakers > 2 else 4,
                feat_dim=feat_dim,
                num_transformer_layer=cfg.n_layers,
                num_attention_head=cfg.n_heads,
                transformer_ffn_embed_dim=cfg.d_ff,
                dropout=cfg.dropout,
                sample_rate=cfg.sample_rate,
                speech_encoder_type=cfg.speech_encoder_type,
                single_backend_type=cfg.single_backend_type,
                multi_backend_type=cfg.multi_backend_type,
                d_state=cfg.d_state,
                expand=cfg.expand,
                encoder_block_layers=_blocks_override(cfg, (12, 24, 16)),
            ),
            remat_encoder=cfg.remat,
            dtype=dtype,
        )
    if cfg.family == "tsvad3":
        from ..models import TSVADConfig
        from ..models.tsvad3 import TSVAD3Config, TSVAD3Model

        feat_dim = cfg.n_mels if cfg.n_mels != 23 else 80
        blocks = _blocks_override(cfg, (12, 24, 16))
        return TSVAD3Model(
            cfg=TSVAD3Config(
                base=TSVADConfig(
                    max_num_speaker=cfg.n_speakers if cfg.n_speakers > 2 else 4,
                    feat_dim=feat_dim,
                    num_transformer_layer=cfg.n_layers,
                    num_attention_head=cfg.n_heads,
                    transformer_ffn_embed_dim=cfg.d_ff,
                    dropout=cfg.dropout,
                    sample_rate=cfg.sample_rate,
                    encoder_block_layers=blocks,
                ),
                ts_len=cfg.ts_len,
                fuse_fbank_feat=cfg.fuse_fbank_feat,
                fuse_speaker_embedding_feat=cfg.fuse_speaker_embedding_feat,
                speaker_encoder_layers=blocks,
            ),
            dtype=dtype,
        )
    if cfg.family == "ots_vad":
        from ..models.ots_vad import OTSVADConfig, OTSVADModel

        feat_dim = cfg.n_mels if cfg.n_mels != 23 else 80
        return OTSVADModel(
            cfg=OTSVADConfig(
                num_speakers=cfg.n_speakers if cfg.n_speakers > 2 else 4,
                d_model=cfg.d_model,
                conformer_layers=max(cfg.n_layers // 2, 1),
                n_heads=cfg.n_heads,
                d_ff=cfg.d_ff,
                feat_dim=feat_dim,
                sample_rate=cfg.sample_rate,
                encoder_blocks=_blocks_override(cfg, (3, 4, 6, 3)),
                dropout=cfg.dropout,
            ),
            dtype=dtype,
        )
    if cfg.family == "tsvad_streaming":
        from ..models.streaming_tsvad import StreamingTSVADConfig, StreamingTSVADModel

        feat_dim = cfg.n_mels if cfg.n_mels != 23 else 80
        return StreamingTSVADModel(
            cfg=StreamingTSVADConfig(
                max_num_speaker=cfg.n_speakers if cfg.n_speakers > 2 else 4,
                d_model=cfg.d_model,
                d_ff=cfg.d_ff,
                n_heads=cfg.n_heads,
                n_layers=cfg.n_layers,
                dropout=cfg.dropout,
                sample_rate=cfg.sample_rate,
                feat_dim=feat_dim,
                chunk_size=cfg.streaming_chunk_size,
                num_left_chunks=cfg.streaming_left_chunks,
            ),
            dtype=dtype,
        )
    if cfg.family == "ssnd":
        from ..models.ssnd import SSNDConfig, SSNDModel

        return SSNDModel(
            cfg=SSNDConfig(
                n_all_speakers=cfg.all_n_speakers,
                max_speakers=cfg.n_speakers if cfg.n_speakers > 2 else 4,
                vad_out_len=int(cfg.rs_len * 25),
                sample_rate=cfg.sample_rate,
                extractor_blocks=_blocks_override(cfg, (12, 24, 16)),
            ),
            dtype=dtype,
        )
    if cfg.family == "eend_m2f":
        import dataclasses

        from ..models.eend_m2f import EENDM2FModel, M2FConfig

        # the ×10 subsampling lives in the conv backbone (backbone.py:7), so
        # the frontend must emit unsubsampled, unspliced frames; masks are
        # scored back at this frame rate by the pixel decoder.
        fe = dataclasses.replace(_frontend_from_cfg(cfg), subsampling=1, context_size=0)
        return EENDM2FModel(
            cfg=M2FConfig(
                num_queries=max(cfg.n_speakers * 2, 8), d_model=cfg.d_model,
                n_heads=cfg.n_heads, d_ff=cfg.d_ff, enc_layers=cfg.n_layers,
                dec_layers=max(cfg.n_layers // 2, 1), dropout=cfg.dropout,
            ),
            frontend=fe,
            dtype=dtype,
        )
    if cfg.family == "enhance":
        from ..models.enhancer import EnhancerConfig, MaskDenoiser

        return MaskDenoiser(cfg=EnhancerConfig(), dtype=dtype)
    if cfg.family == "spk":
        from ..models.spk_embed import SpeakerClassifier, SpkEmbedConfig

        return SpeakerClassifier(
            cfg=SpkEmbedConfig(
                n_classes=cfg.all_n_speakers,
                encoder=cfg.speech_encoder_type,
                feat_dim=cfg.n_mels,
                margin=cfg.aam_margin,
                scale=cfg.aam_scale,
                encoder_blocks=_blocks_override(cfg, (12, 24, 16)),
            ),
            dtype=dtype,
        )
    if cfg.family == "sond":
        from ..models.sond import SONDConfig, SONDModel

        return SONDModel(
            cfg=SONDConfig(
                max_speakers=cfg.n_speakers if cfg.n_speakers > 2 else 4,
                max_set_size=min(cfg.n_speakers if cfg.n_speakers > 2 else 4, 4),
                feat_dim=cfg.n_mels,
                spk_emb_dim=192,
                d_model=cfg.d_model,
                n_heads=cfg.n_heads,
                dropout=cfg.dropout,
                encoder_blocks=_blocks_override(cfg, (3, 4, 6, 3)),
            ),
            dtype=dtype,
        )
    raise ValueError(f"unknown family {cfg.family}")


def _fit_batch_to_mesh(cfg, mesh):
    """Batch must shard evenly over the mesh 'data' axis; round it down, or
    drop the mesh entirely when the batch is smaller than the axis."""
    if mesh is None:
        return cfg, mesh
    n_data = mesh.shape["data"]
    if cfg.batch_size < n_data:
        logging.warning(
            "batch_size %d < data-parallel size %d; running unsharded",
            cfg.batch_size, n_data,
        )
        return cfg, None
    if cfg.batch_size % n_data:
        nb = (cfg.batch_size // n_data) * n_data
        logging.warning("rounding batch_size %d -> %d (multiple of %d shards)",
                        cfg.batch_size, nb, n_data)
        cfg = dataclasses.replace(cfg, batch_size=nb)
    return cfg, mesh


def cmd_train(args) -> int:
    from ..utils.config import apply_overrides, from_dict, load_yaml

    cfg = load_yaml(TrainCliConfig, args.config) if args.config else TrainCliConfig()
    if args.family:
        cfg = dataclasses.replace(cfg, family=args.family)
    if args.set:
        cfg = apply_overrides(cfg, args.set)
    cfg = _normalize_cfg(cfg)

    import jax
    import jax.numpy as jnp

    from ..parallel import make_mesh
    from ..train import Trainer, TrainerConfig
    from ..train.checkpoints import CheckpointManager
    from ..train.loop import run_training
    from ..train import tasks

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(n_data=cfg.n_data or None)

    tcfg = TrainerConfig(
        optimizer=cfg.optimizer, learning_rate=cfg.learning_rate, schedule=cfg.schedule,
        d_model=cfg.d_model, warmup_steps=cfg.warmup_steps, total_steps=cfg.num_steps,
        grad_clip_norm=cfg.grad_clip_norm, grad_accum_steps=cfg.grad_accum_steps,
        model_avg_decay=cfg.model_avg_decay or None, seed=cfg.seed,
    )
    model = _build_model(cfg)

    if cfg.family in ("eend", "eend_eda", "fs_eend", "eend_vc", "vad", "eend_m2f"):
        from ..data.eend_dataset import ConcatChunkDataset, EendChunkDataset, batch_iterator

        if cfg.family == "vad" and cfg.subsampling != 1:
            # VAD labels live at the raw frame rate (one per frame_shift hop)
            logging.info("vad family: forcing subsampling=1")
            cfg = dataclasses.replace(cfg, subsampling=1)
            model = _build_model(cfg)
        fe = _frontend_from_cfg(cfg)
        # comma-separated dirs = joint multi-corpus training
        # (reference egs/multi_datasets)
        train_dirs = args.train_dir.split(",")
        dss = [EendChunkDataset(d, cfg.chunk_frames, fe, cfg.n_speakers) for d in train_dirs]
        train_ds = dss[0] if len(dss) == 1 else ConcatChunkDataset(dss)
        valid_ds = EendChunkDataset(args.valid_dir, cfg.chunk_frames, fe, cfg.n_speakers) if args.valid_dir else None
        if cfg.family == "eend_vc" and cfg.all_n_speakers == 0:
            cfg = dataclasses.replace(cfg, all_n_speakers=len(train_ds.all_speakers))
            model = _build_model(cfg)
        loss_fn = {
            "eend": tasks.make_eend_loss,
            "eend_eda": tasks.make_eda_loss,
            "fs_eend": tasks.make_fs_eend_loss,
            "eend_vc": tasks.make_eend_vc_loss,
            "vad": tasks.make_vad_loss,
            "eend_m2f": tasks.make_m2f_loss,
        }[cfg.family](model)
        n_chunks = len(train_ds.chunks)
        if n_chunks == 0:
            raise SystemExit(
                f"no training chunks: recordings shorter than chunk_frames={cfg.chunk_frames} "
                f"subsampled frames? (dir: {args.train_dir})"
            )
        if cfg.batch_size > n_chunks:
            logging.warning(
                "batch_size %d > %d available chunks; clamping", cfg.batch_size, n_chunks
            )
            cfg = dataclasses.replace(cfg, batch_size=n_chunks)
        cfg, mesh = _fit_batch_to_mesh(cfg, mesh)
        trainer = Trainer(loss_fn, tcfg, mesh=mesh)
        b0 = next(batch_iterator(train_ds, cfg.batch_size, shuffle=False))
        init_method = model.init_all if cfg.family == "eend_vc" else None
        if init_method is not None:
            params = model.init(jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["audio"]), method=init_method)
        else:
            params = model.init(jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["audio"]))
        state = trainer.init_state(params)
        make_train = lambda ep: batch_iterator(train_ds, cfg.batch_size, True, cfg.seed, epoch=ep)  # noqa: E731
        # cap the valid batch size at the dataset size — the iterator drops
        # partial batches, so a small dev set would otherwise yield nothing
        vbs = min(cfg.batch_size, len(valid_ds.chunks)) if valid_ds else 0
        make_valid = (lambda: batch_iterator(valid_ds, max(1, vbs), False)) if valid_ds else None
    elif cfg.family in ("tsvad", "tsvad_streaming", "tsvad3", "ots_vad"):
        from ..data.tsvad_dataset import TSVADChunkDataset, tsvad_batch_iterator
        from ..infer.embeddings import EmbeddingStore

        from ..data.eend_dataset import ConcatChunkDataset

        if args.emb_store:
            stores = [EmbeddingStore.load(p) for p in args.emb_store.split(",")]
            store = stores[0]
            for extra in stores[1:]:
                store.data.update(extra.data)
        elif cfg.family == "ots_vad":
            store = None  # OTS-VAD is enrollment-free (self-generated targets)
        elif cfg.family == "tsvad3" and getattr(args, "target_audio_dir", None):
            store = None  # enrollment waveforms replace precomputed embeddings
        else:
            raise SystemExit(f"--emb-store is required for family {cfg.family}")
        train_dirs = args.train_dir.split(",")
        # OTS-VAD trains on 2·rs_len chunks: self-enroll on the left half
        # with true labels, predict the right half (reference ots_vad)
        ds_rs_len = 2 * cfg.rs_len if cfg.family == "ots_vad" else cfg.rs_len
        tad = getattr(args, "target_audio_dir", None)
        tads = tad.split(",") if tad else [None] * len(train_dirs)
        dss = [
            TSVADChunkDataset(
                d, store, rs_len=ds_rs_len, segment_shift=cfg.segment_shift,
                rate=cfg.sample_rate, is_train=True, seed=cfg.seed,
                noise_dir=args.noise_dir, rir_dir=args.rir_dir,
                target_audio_dir=t, enroll_len_s=cfg.ts_len,
                enhancer=cfg.enhancer or None, enhance_prob=cfg.enhance_prob,
            )
            for d, t in zip(train_dirs, tads)
        ]
        train_ds = dss[0] if len(dss) == 1 else ConcatChunkDataset(dss)
        valid_ds = (
            TSVADChunkDataset(
                args.valid_dir, store, rs_len=ds_rs_len, segment_shift=ds_rs_len,
                rate=cfg.sample_rate, is_train=False,
                target_audio_dir=getattr(args, "valid_target_audio_dir", None),
                enroll_len_s=cfg.ts_len,
            )
            if args.valid_dir
            else None
        )
        T = int(cfg.rs_len * 25)
        cfg, mesh = _fit_batch_to_mesh(cfg, mesh)
        b0 = next(tsvad_batch_iterator(train_ds, cfg.batch_size, shuffle=False))
        if cfg.family == "tsvad3":
            loss_fn = tasks.make_tsvad3_loss(model, T, freeze_speech_encoder=cfg.freeze_encoder)
            trainer = Trainer(loss_fn, tcfg, mesh=mesh, has_mutable=True)
            targets0 = b0.get("enroll_audio", b0["target_embs"])
            variables = model.init(
                jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["audio"]), jnp.asarray(targets0), T
            )
            if args.encoder_ckpt and args.encoder_ckpt.endswith(".npz"):
                from ..models.spk_embed import load_encoder

                _, enc_vars = load_encoder(args.encoder_ckpt)
                for mod in ("speech_encoder", "speaker_encoder"):
                    if mod in variables["params"]:
                        variables["params"][mod] = enc_vars["params"]
                        variables["batch_stats"][mod] = enc_vars["batch_stats"]
                logging.info("loaded trained encoders from %s", args.encoder_ckpt)
            state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        elif cfg.family == "ots_vad":
            import numpy as np

            loss_fn = tasks.make_ots_vad_loss(model)
            trainer = Trainer(loss_fn, tcfg, mesh=mesh, has_mutable=True)
            n = b0["audio"].shape[1] // 2
            t12 = (b0["labels"].shape[1] // 2) // 2
            y0 = jnp.asarray(np.transpose(b0["labels"][:, ::2][:, :t12], (0, 2, 1)))
            variables = model.init(
                jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["audio"][:, :n]),
                jnp.asarray(b0["audio"][:, n:]), y0,
            )
            state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        elif cfg.family == "tsvad_streaming":
            # own conv front-end (reference parity: no CAM++), no batch
            # stats, static chunk-masked attention during training
            loss_fn = tasks.make_streaming_tsvad_loss(model, T)
            trainer = Trainer(loss_fn, tcfg, mesh=mesh)
            params = model.init(
                jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["audio"]), jnp.asarray(b0["target_embs"]), T
            )
            state = trainer.init_state(params)
        else:
            loss_fn = tasks.make_tsvad_loss(model, T, freeze_encoder=cfg.freeze_encoder)
            trainer = Trainer(loss_fn, tcfg, mesh=mesh, has_mutable=True)
            variables = model.init(
                jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["audio"]), jnp.asarray(b0["target_embs"]), T
            )
            if args.encoder_ckpt and args.encoder_ckpt.endswith(".npz"):
                # our own trained encoder (train --family spk → export-encoder)
                from ..models.spk_embed import load_encoder

                _, enc_vars = load_encoder(args.encoder_ckpt)
                variables["params"]["speech_encoder"] = enc_vars["params"]
                variables["batch_stats"]["speech_encoder"] = enc_vars["batch_stats"]
                logging.info("loaded trained speech encoder from %s", args.encoder_ckpt)
            elif args.encoder_ckpt:
                from ..utils.torch_convert import load_campplus_checkpoint

                enc_p, enc_s = load_campplus_checkpoint(args.encoder_ckpt)
                variables["params"]["speech_encoder"] = enc_p
                variables["batch_stats"]["speech_encoder"] = enc_s
                logging.info("loaded pretrained speech encoder from %s", args.encoder_ckpt)
            state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        make_train = lambda ep: tsvad_batch_iterator(train_ds, cfg.batch_size, True, cfg.seed, epoch=ep)  # noqa: E731
        make_valid = (lambda: tsvad_batch_iterator(valid_ds, cfg.batch_size, False)) if valid_ds else None
    elif cfg.family == "ssnd":
        # on-the-fly simulated meetings from a single-speaker kaldi dir
        # (reference egs/alimeeting/ssnd/simu_diar_dataset.py + train_accelerate_ddp.py)
        import numpy as np

        from ..data.simulate import SimuDiarMixer

        mixer = SimuDiarMixer(
            args.train_dir, noise_dir=args.noise_dir, duration=cfg.rs_len,
            rate=cfg.sample_rate, max_speakers=cfg.n_speakers if cfg.n_speakers > 2 else 4,
            sil_scale=cfg.ssnd_sil_scale, overlap_prob=cfg.ssnd_overlap_prob, seed=cfg.seed,
        )
        if cfg.all_n_speakers == 0:
            cfg = dataclasses.replace(cfg, all_n_speakers=mixer.n_all_speakers)
            model = _build_model(cfg)

        # dual-source training: interleave real-meeting blocks with the
        # simulated mixtures (reference train_accelerate_ddp.py:847
        # train_one_epoch_multi + alimeeting_diar_dataset.py)
        real_ds = None
        if args.real_data_dir:
            from ..data.simulate import RealDiarBlocks

            real_ds = RealDiarBlocks(
                args.real_data_dir, mixer.spk_to_gid, duration=cfg.rs_len,
                rate=cfg.sample_rate, max_speakers=mixer.max_speakers, seed=cfg.seed + 1,
            )

        def _ssnd_batches(bs):
            n_real = int(round(bs * cfg.ssnd_real_ratio)) if real_ds else 0
            for b in mixer.batches(bs - n_real if n_real else bs):
                # mixer labels are (B, T, S); the SSND loss wants (B, S, T)
                audio, labels, gids = b["audio"], b["labels"], b["spk_gids"]
                if n_real:
                    items = [real_ds.sample() for _ in range(n_real)]
                    audio = np.concatenate([audio, np.stack([i["audio"] for i in items])])
                    labels = np.concatenate([labels, np.stack([i["labels"] for i in items])])
                    gids = np.concatenate([gids, np.stack([i["spk_gids"] for i in items])])
                yield dict(
                    audio=audio,
                    labels=labels.transpose(0, 2, 1),
                    spk_gids=gids,
                )

        loss_fn = tasks.make_ssnd_loss(model, arcface_weight=cfg.ssnd_arcface_weight)
        cfg, mesh = _fit_batch_to_mesh(cfg, mesh)
        trainer = Trainer(loss_fn, tcfg, mesh=mesh, has_mutable=True)
        b0 = next(_ssnd_batches(cfg.batch_size))
        aux0 = jnp.zeros((cfg.batch_size, b0["labels"].shape[1], model.cfg.emb_dim), jnp.float32)
        variables = model.init(jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["audio"]), aux0)
        state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        make_train = lambda ep: _ssnd_batches(cfg.batch_size)  # noqa: E731
        make_valid = None
    elif cfg.family == "enhance":
        # learned denoiser on (clean, clean+noise) pairs from the
        # single-speaker corpus (the trainable stand-in for the reference's
        # external ZipEnhancer/GTCRN models)
        from ..data.enhance import noisy_pair_batches
        from ..models.enhancer import make_enhance_loss

        if not args.noise_dir:
            raise SystemExit("train --family enhance needs --noise-dir")
        loss_fn = make_enhance_loss(model)
        cfg, mesh = _fit_batch_to_mesh(cfg, mesh)
        trainer = Trainer(loss_fn, tcfg, mesh=mesh)

        def _pairs():
            return noisy_pair_batches(
                args.train_dir, args.noise_dir, rate=cfg.sample_rate,
                dur_s=cfg.spk_dur, batch_size=cfg.batch_size, seed=cfg.seed,
            )

        b0 = next(_pairs())
        params = model.init(jax.random.PRNGKey(cfg.seed), jnp.asarray(b0["noisy"]))
        state = trainer.init_state(params)
        make_train = lambda ep: _pairs()  # noqa: E731
        make_valid = None
    elif cfg.family == "spk":
        # speaker-embedding pretraining (AAM-softmax over corpus speakers) —
        # the standalone replacement for the reference's external
        # modelscope/wespeaker encoder checkpoints
        from ..data.spk_dataset import SpeakerUttDataset, spk_batch_iterator
        from ..ops.features import kaldi_fbank_auto

        train_ds = SpeakerUttDataset(
            args.train_dir, dur=cfg.spk_dur, rate=cfg.sample_rate, is_train=True, seed=cfg.seed,
            noise_dir=args.noise_dir,
        )
        valid_ds = (
            SpeakerUttDataset(args.valid_dir, dur=cfg.spk_dur, rate=cfg.sample_rate, is_train=False)
            if args.valid_dir else None
        )
        if cfg.all_n_speakers == 0:
            cfg = dataclasses.replace(cfg, all_n_speakers=train_ds.n_speakers)
            model = _build_model(cfg)
        loss_fn = tasks.make_spk_loss(model, sample_rate=cfg.sample_rate)
        cfg, mesh = _fit_batch_to_mesh(cfg, mesh)
        trainer = Trainer(loss_fn, tcfg, mesh=mesh, has_mutable=True)
        b0 = next(spk_batch_iterator(train_ds, cfg.batch_size, shuffle=False))
        fb0 = kaldi_fbank_auto(
            jnp.asarray(b0["audio"]), num_mel_bins=model.cfg.feat_dim,
            sample_rate=cfg.sample_rate, mean_norm=True,
        )
        variables = model.init(jax.random.PRNGKey(cfg.seed), fb0, None, False)
        state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        make_train = lambda ep: spk_batch_iterator(train_ds, cfg.batch_size, True, cfg.seed, epoch=ep)  # noqa: E731
        make_valid = (
            (lambda: spk_batch_iterator(valid_ds, min(cfg.batch_size, len(valid_ds)), False))
            if valid_ds else None
        )
    elif cfg.family == "sond":
        # powerset SOND over TS-VAD-style chunks: profile inventory = the
        # target-speaker embedding store (reference sond/ trains from
        # clustering-produced profiles)
        from ..data.eend_dataset import ConcatChunkDataset
        from ..data.tsvad_dataset import TSVADChunkDataset, tsvad_batch_iterator
        from ..infer.embeddings import EmbeddingStore

        store = EmbeddingStore.load(args.emb_store)
        dss = [
            TSVADChunkDataset(
                d, store, rs_len=cfg.rs_len, segment_shift=cfg.segment_shift,
                rate=cfg.sample_rate, is_train=True, seed=cfg.seed,
                noise_dir=args.noise_dir, rir_dir=args.rir_dir,
            )
            for d in args.train_dir.split(",")
        ]
        train_ds = dss[0] if len(dss) == 1 else ConcatChunkDataset(dss)
        valid_ds = (
            TSVADChunkDataset(args.valid_dir, store, rs_len=cfg.rs_len,
                              segment_shift=cfg.rs_len, rate=cfg.sample_rate, is_train=False)
            if args.valid_dir else None
        )
        loss_fn = tasks.make_sond_loss_from_audio(model, sample_rate=cfg.sample_rate)
        cfg, mesh = _fit_batch_to_mesh(cfg, mesh)
        trainer = Trainer(loss_fn, tcfg, mesh=mesh, has_mutable=True)
        b0 = next(tsvad_batch_iterator(train_ds, cfg.batch_size, shuffle=False))
        from ..ops.features import kaldi_fbank_auto

        fb0 = kaldi_fbank_auto(jnp.asarray(b0["audio"]), num_mel_bins=model.cfg.feat_dim, sample_rate=cfg.sample_rate)
        variables = model.init(jax.random.PRNGKey(cfg.seed), fb0, jnp.asarray(b0["target_embs"]))
        state = trainer.init_state(variables["params"], mutable={"batch_stats": variables["batch_stats"]})
        make_train = lambda ep: tsvad_batch_iterator(train_ds, cfg.batch_size, True, cfg.seed, epoch=ep)  # noqa: E731
        make_valid = (lambda: tsvad_batch_iterator(valid_ds, cfg.batch_size, False)) if valid_ds else None
    else:
        raise ValueError(cfg.family)

    mgr = CheckpointManager(args.exp_dir, max_to_keep=args.max_to_keep)
    if getattr(args, "resume", False) and mgr.latest_step() is not None:
        # exact resume: step/params/optimizer/rng restored against the
        # freshly-built state as the pytree template (reference
        # load_checkpoint_if_available, train_accelerate_ddp2.py:751-807)
        state = mgr.restore(template=state)
        logging.info("resumed from step %d", int(jax.device_get(state.step)))
    state = run_training(
        trainer, state, make_train, cfg.num_steps, make_valid, mgr,
        log_every=cfg.log_every, valid_every=cfg.valid_every,
        metrics_path=os.path.join(args.exp_dir, "metrics.jsonl"),
        profile_dir=args.profile_dir,
    )
    logging.info("training done at step %d; checkpoints in %s", int(jax.device_get(state.step)), args.exp_dir)
    return 0


# ---------------------------------------------------------------------------


def cmd_simulate(args) -> int:
    from ..data import simulate as S

    if args.source_dir:
        specs = S.random_mixture_specs(
            args.source_dir, args.noise_dir, args.rir_dir,
            n_mixtures=args.n_mixtures, n_speakers=args.n_speakers,
            sil_scale=args.sil_scale, seed=args.seed,
        )
        out = S.make_mixtures(specs, os.path.join(args.out, "data"), os.path.join(args.out, "wav"), args.rate)
    else:
        out = S.simulate_corpus(
            args.out, n_mixtures=args.n_mixtures, n_speakers=args.n_speakers,
            rate=args.rate, seed=args.seed, sil_scale=args.sil_scale,
            with_rir=args.with_rir, rir_method=args.rir_method,
        )
    print(out)
    return 0


def cmd_simulate_meetings(args) -> int:
    import json

    from ..data import simulate as S

    dynamics = None
    if args.dynamics:
        with open(args.dynamics) as f:
            dynamics = json.load(f)
    specs = S.meeting_mixture_specs(
        args.source_dir, dynamics=dynamics, noise_dir=args.noise_dir,
        rir_dir=args.rir_dir, seed=args.seed,
    )
    out = S.make_meeting_mixtures(specs, os.path.join(args.out, "data"), os.path.join(args.out, "wav"), args.rate)
    print(out)
    return 0


def _make_embed_fn(args):
    """Subsegment embedding fn for cluster / estimate-plda (shared encoder
    loading: self-trained export-encoder npz, converted torch CAM++, or the
    dependency-free spectrum baseline)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.encoder == "campplus":
        from ..models import CAMPPlus
        from ..ops import features as F
        from ..utils.torch_convert import load_campplus_checkpoint

        camp = CAMPPlus()
        if args.encoder_ckpt and args.encoder_ckpt.endswith(".npz"):
            # our own export-encoder format (hermetic self-trained path)
            from ..models.spk_embed import load_encoder

            camp, variables = load_encoder(args.encoder_ckpt)
        elif args.encoder_ckpt:
            params, stats = load_campplus_checkpoint(args.encoder_ckpt)
            variables = {"params": params, "batch_stats": stats}
        else:
            variables = camp.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 198, 80), jnp.float32), False, "embedding"
            )
            logging.warning("no --encoder-ckpt: using random encoder weights")

        @jax.jit
        def embed(b):
            fb = F.kaldi_fbank_jax(jnp.asarray(b), sample_rate=args.rate, mean_norm=True)
            return camp.apply(variables, fb, False, "embedding")

        return lambda b: np.asarray(embed(b))
    elif args.encoder == "spectrum":
        # dependency-free baseline: L2-normalized mean magnitude spectrum
        def embed_fn(b):
            sp = np.abs(np.fft.rfft(b, axis=-1))[:, :512]
            return sp / (np.linalg.norm(sp, axis=-1, keepdims=True) + 1e-9)

        return embed_fn
    raise SystemExit(f"unknown encoder {args.encoder}")


def cmd_cluster(args) -> int:
    """VAD → subsegment embeddings → clustering → RTTM: the reference's
    spectral/umap clustering recipes as one command
    (egs/alimeeting/run_spectral_cluster.sh stages 2-8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.kaldi_io import KaldiData
    from ..data.rttm import read_rttm_by_rec, write_rttm
    from ..infer.clustering import cluster_recording, energy_vad, oracle_sad

    sad_fn = None
    ref_by_rec = {}
    if args.sad == "oracle":
        rttm_path = args.oracle_rttm or os.path.join(args.data_dir, "rttm")
        ref_by_rec = read_rttm_by_rec(rttm_path)
    elif args.sad == "neural":
        from ..models.vad import NeuralVAD, NeuralVADConfig, load_vad_params, neural_sad

        vad_model = NeuralVAD(
            cfg=NeuralVADConfig(
                sample_rate=args.rate,
                frame_size=args.rate * 25 // 1000,
                frame_shift=args.rate * 10 // 1000,
            )
        )
        if not args.vad_ckpt:
            raise SystemExit("--sad neural requires --vad-ckpt")
        vad_vars = load_vad_params(args.vad_ckpt, vad_model, rate=args.rate)
        vad_apply = jax.jit(vad_model.apply)
        sad_fn = lambda audio, rate: neural_sad(  # noqa: E731
            audio, rate, vad_model, vad_vars, threshold=args.vad_threshold,
            min_duration_s=args.min_duration, apply_fn=vad_apply,
        )

    embed_fn = _make_embed_fn(args)

    plda = None
    if args.method == "vbx":
        from ..infer.vbx import load_plda

        if not args.plda:
            raise SystemExit("--method vbx requires --plda (run estimate-plda first)")
        plda = load_plda(args.plda)

    kd = KaldiData(args.data_dir)
    all_turns = []
    for rec in sorted(kd.wavs):
        audio, rate = kd.load_wav(rec)
        if audio.ndim > 1:
            audio = audio[:, 0]
        if args.sad == "oracle":
            sad = oracle_sad(ref_by_rec.get(rec, []))
        elif args.sad == "neural":
            sad = sad_fn(audio.astype(np.float32), rate)
        else:
            sad = energy_vad(audio.astype(np.float32), rate)
        turns = cluster_recording(
            audio.astype(np.float32), rate, embed_fn, rec, sad=sad,
            method=args.method, num_spks=args.num_spks, max_num_spks=args.max_num_spks,
            window_s=args.window, hop_s=args.hop, plda=plda,
            vbx_loop_prob=args.vbx_loop_prob, vbx_fa=args.vbx_fa, vbx_fb=args.vbx_fb,
        )
        all_turns.extend(turns)
        logging.info("%s: %d turns, %d speakers", rec, len(turns), len({t.speaker for t in turns}))
    write_rttm(args.out, all_turns)
    print(args.out)
    if args.ref:
        from ..score import score_der

        res = score_der(args.ref, args.out, collar=args.collar)
        print(res.summary())
    return 0


def cmd_estimate_plda(args) -> int:
    """Labeled kaldi dir (utt2spk [+segments]) → two-covariance PLDA npz for
    `cluster --method vbx` (the reference ships pretrained PLDA with
    diarizen's VBx, egs/magicdata-ramc/eend_vc/clustering/VBx.py; zero
    egress here, so it is estimated from the self-trained encoder's
    embeddings instead)."""
    import numpy as np

    from ..data.kaldi_io import KaldiData
    from ..data.wav import load_wav_maybe_piped
    from ..infer.vbx import estimate_plda, save_plda

    embed_fn = _make_embed_fn(args)
    kd = KaldiData(args.data_dir)
    if not kd.utt2spk:
        raise SystemExit(f"{args.data_dir} has no utt2spk")
    win = int(args.window * args.rate)
    hop = int(args.hop * args.rate)
    wavs, labels = [], []
    spk_ids = {s: i for i, s in enumerate(sorted(set(kd.utt2spk.values())))}
    if kd.segments:
        entries = [
            (seg["utt"], rec, seg["st"], seg["et"])
            for rec, segs in sorted(kd.segments.items())
            for seg in segs
            if seg["utt"] in kd.utt2spk
        ]
    else:
        entries = [(u, u, None, None) for u in sorted(kd.utt2spk) if u in kd.wavs]
    audio_cache = {}
    for utt, rec, st, et in entries:
        if rec not in audio_cache:
            a, r = load_wav_maybe_piped(kd.wavs[rec])
            if a.ndim > 1:
                a = a[:, 0]
            assert r == args.rate, (r, args.rate)
            if len(audio_cache) > 16:
                audio_cache.clear()
            audio_cache[rec] = a.astype(np.float32)
        a = audio_cache[rec]
        if st is not None:
            a = a[int(st * args.rate): int(et * args.rate)]
        if len(a) < win:
            a = np.pad(a, (0, win - len(a)), "wrap")
        for off in range(0, min(len(a) - win, args.max_windows_per_utt * hop - 1) + 1, hop):
            wavs.append(a[off: off + win])
            labels.append(spk_ids[kd.utt2spk[utt]])
    embs = []
    for i in range(0, len(wavs), 64):
        embs.append(embed_fn(np.stack(wavs[i: i + 64]).astype(np.float32)))
    embs = np.concatenate(embs, axis=0)
    plda = estimate_plda(embs, np.asarray(labels), dim=args.plda_dim)
    save_plda(args.out, plda)
    logging.info(
        "PLDA from %d windows / %d speakers → %s (dim %d)",
        len(labels), len(spk_ids), args.out, len(plda.psi),
    )
    print(args.out)
    return 0


def cmd_export_vad(args) -> int:
    """Latest VAD train checkpoint → msgpack usable by `cluster --vad-ckpt`."""
    import jax

    from ..models import NeuralVAD, NeuralVADConfig
    from ..models.vad import save_vad_params
    from ..train.checkpoints import CheckpointManager

    mgr = CheckpointManager(args.exp_dir)
    state = mgr.restore(args.step)
    # template-less Orbax restore yields a plain dict
    params = state["params"] if isinstance(state, dict) else state.params
    save_vad_params(args.out, jax.device_get(params))
    logging.info("exported VAD params from step %s", mgr.latest_step() if args.step is None else args.step)
    print(args.out)
    return 0


def cmd_export_enhancer(args) -> int:
    """enhance-family checkpoint → npz usable as dataset enhancer `neural:<path>`."""
    import jax

    from ..models.enhancer import EnhancerConfig, save_enhancer
    from ..train.checkpoints import CheckpointManager

    mgr = CheckpointManager(args.exp_dir)
    state = mgr.restore(args.step)
    params = state["params"] if isinstance(state, dict) else state.params
    save_enhancer(args.out, jax.device_get(params), EnhancerConfig())
    logging.info("exported enhancer from step %s", mgr.latest_step() if args.step is None else args.step)
    print(args.out)
    return 0


def cmd_export_encoder(args) -> int:
    """spk-family checkpoint → npz encoder usable by `extract-embeddings`."""
    import jax

    from ..models.spk_embed import SpkEmbedConfig, save_encoder
    from ..train.checkpoints import CheckpointManager
    from ..utils.config import apply_overrides, load_yaml

    cfg = load_yaml(TrainCliConfig, args.config) if args.config else TrainCliConfig()
    if args.set:
        cfg = apply_overrides(cfg, args.set)
    mgr = CheckpointManager(args.exp_dir)
    state = mgr.restore(args.step)
    params = state["params"] if isinstance(state, dict) else state.params
    mutable = state.get("mutable") if isinstance(state, dict) else state.mutable
    variables = {
        "params": params["speech_encoder"],
        "batch_stats": (mutable or {}).get("batch_stats", {}).get("speech_encoder", {}),
    }
    scfg = SpkEmbedConfig(
        n_classes=1, encoder=cfg.speech_encoder_type, feat_dim=cfg.n_mels,
        encoder_blocks=_blocks_override(cfg, (12, 24, 16)),
    )
    save_encoder(args.out, scfg, jax.device_get(variables))
    print(args.out)
    return 0


def cmd_config_dump(args) -> int:
    """Resolved config → stdout as yaml/json/bash (reference bin/yaml2bash.py
    — recipes source the bash form to share hyperparameters with shell)."""
    import json

    from ..utils.config import apply_overrides, load_yaml, to_dict

    cfg = load_yaml(TrainCliConfig, args.config) if args.config else TrainCliConfig()
    if args.set:
        cfg = apply_overrides(cfg, args.set)
    d = to_dict(cfg)
    if args.format == "json":
        print(json.dumps(d, indent=2))
    elif args.format == "bash":
        for k, v in d.items():
            if isinstance(v, bool):
                v = "true" if v else "false"
            print(f"{k}={json.dumps(v) if isinstance(v, str) else v}")
    else:
        for k, v in d.items():
            print(f"{k}: {v}")
    return 0


def cmd_score(args) -> int:
    from ..score import score_der
    from ..score.cder import score_cder

    uem = None
    if args.uem:
        from ..data.rttm import load_uem

        uem = load_uem(args.uem)
    res = score_der(
        args.ref, args.sys, collar=args.collar, overlap_limit=args.overlap_limit,
        regions=args.regions, uem=uem,
    )
    # reference md-eval (modified) prints the bare DER/MS/FA/SC line
    print(f"{100*res.der:.2f}/{100*res.miss_rate:.2f}/{100*res.falarm_rate:.2f}/{100*res.confusion_rate:.2f}")
    if args.per_file:
        for rec, r in res.per_file.items():
            print(f"  {rec}: {r.summary()}")
    if args.cder:
        out = score_cder(args.ref, args.sys)
        print("CDER avg = {:.3f}".format(out["avg"]))
    return 0


def cmd_prepare_targets(args) -> int:
    from ..data.prep import prepare_targets_from_rttm

    out = prepare_targets_from_rttm(
        args.rttm, args.data_dir, args.out,
        label_rate=args.label_rate, min_target_s=args.min_target_s,
    )
    print(out)
    return 0


def cmd_extract_embeddings(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.kaldi_io import KaldiData
    from ..infer.embeddings import EmbeddingStore, chunk_embeddings
    from ..models import CAMPPlus
    from ..ops import features as F
    from ..utils.torch_convert import load_campplus_checkpoint

    if args.encoder_ckpt and args.encoder_ckpt.endswith(".npz"):
        # our own trained encoder (CLI `train --family spk` → `export-encoder`)
        from ..models.spk_embed import load_encoder

        camp, variables = load_encoder(args.encoder_ckpt)
        n_mels = camp.feat_dim
    elif args.encoder_ckpt:
        camp = CAMPPlus()
        n_mels = 80
        params, stats = load_campplus_checkpoint(args.encoder_ckpt)
        variables = {"params": params, "batch_stats": stats}
    else:
        camp = CAMPPlus()
        n_mels = 80
        variables = camp.init(jax.random.PRNGKey(0), jnp.zeros((1, 198, 80), jnp.float32), False, "embedding")
        logging.warning("no --encoder-ckpt: using random encoder weights")

    @jax.jit
    def embed(b):
        fb = F.kaldi_fbank_jax(jnp.asarray(b), sample_rate=args.rate, num_mel_bins=n_mels, mean_norm=True)
        return camp.apply(variables, fb, False, "embedding")

    kd = KaldiData(args.data_dir)
    store = EmbeddingStore()
    # target wavs laid out as rec/spk.wav (AliMeeting prep) or via utt2spk
    for rec in sorted(kd.wavs):
        audio, rate = kd.load_wav(rec)
        if audio.ndim > 1:
            audio = audio[:, 0]
        if "/" in rec:
            meeting, spk = rec.rsplit("/", 1)
        elif "-" in rec:
            meeting, spk = rec.rsplit("-", 1)
        else:
            meeting, spk = rec, rec
        m = chunk_embeddings(lambda b: embed(b), audio, rate, window_s=args.window, hop_s=args.hop)
        store.put(meeting, spk, m)
    store.save(args.out)
    print(args.out)
    return 0


def cmd_infer(args) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.rttm import write_rttm
    from ..postproc import probs_to_turns
    from ..utils.config import apply_overrides, load_yaml

    cfg = load_yaml(TrainCliConfig, args.config) if args.config else TrainCliConfig()
    if args.family:
        cfg = dataclasses.replace(cfg, family=args.family)
    if args.set:
        cfg = apply_overrides(cfg, args.set)
    cfg = _normalize_cfg(cfg)

    model = _build_model(cfg)
    from ..train import Trainer, TrainerConfig
    from ..train.checkpoints import CheckpointManager

    mgr = CheckpointManager(args.exp_dir)
    step = args.step or mgr.best_step() or mgr.latest_step()
    state = mgr.restore(step)
    params = state["params"] if isinstance(state, dict) else state.params
    mutable = state.get("mutable") if isinstance(state, dict) else state.mutable
    logging.info("restored step %s", step)
    if args.avg_last and args.avg_last > 1:
        from ..train.checkpoints import average_checkpoints

        steps = mgr.all_steps()[-args.avg_last :]
        params = average_checkpoints(mgr, steps, state)
        logging.info("averaged %d checkpoints: %s", len(steps), steps)

    fe = _frontend_from_cfg(cfg)
    fs = fe.frame_shift * fe.subsampling / fe.sample_rate
    turns = []
    if cfg.family == "eend":
        from ..infer import infer_dataset

        @jax.jit
        def predict(a, m):
            logits = model.apply(params, a, frame_mask=m, deterministic=True)
            return jax.nn.sigmoid(logits) * m[..., None]

        probs = infer_dataset(
            lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), args.data_dir, fe, cfg.chunk_frames
        )
    elif cfg.family == "eend_eda":
        from ..infer import eda_infer_dataset

        @jax.jit
        def predict(a, m):
            logits, exist = model.apply(params, a, frame_mask=m, deterministic=True, method=model.infer)
            return jax.nn.sigmoid(logits) * m[..., None], exist

        probs = eda_infer_dataset(
            lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), args.data_dir, fe,
            cfg.chunk_frames, threshold=args.attractor_threshold,
        )
    elif cfg.family == "fs_eend":
        from ..infer import infer_dataset

        @jax.jit
        def predict(a, m):
            logits, _emb = model.apply(params, a, frame_mask=m, deterministic=True)
            # channel 0 is silence, last is padding — keep speaker channels
            return jax.nn.sigmoid(logits[..., 1 : 1 + cfg.n_speakers]) * m[..., None]

        probs = infer_dataset(
            lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), args.data_dir, fe, cfg.chunk_frames
        )
    elif cfg.family == "eend_vc":
        from ..data.kaldi_io import KaldiData
        from ..infer.eend_vc import eend_vc_infer_recording

        @jax.jit
        def predict(a, m):
            logits, vecs = model.apply(params, a, frame_mask=m, deterministic=True)
            return jax.nn.sigmoid(logits) * m[..., None], vecs

        from ..data.rttm import read_rttm_by_rec as _rd

        kd = KaldiData(args.data_dir)
        # --num-spks -1 = per-recording oracle count from the reference RTTM
        # (the reference's est_nspk oracle mode,
        # infer_vector_cluster.py:58-96); a positive value fixes k globally;
        # default estimates k by the AHC distance threshold.
        oracle_counts = {}
        if args.num_spks == -1:
            src = args.ref or os.path.join(args.data_dir, "rttm")
            oracle_counts = {
                rec: len({t.speaker for t in ts}) for rec, ts in _rd(src).items()
            }
        probs = {}
        for rec in sorted(kd.wavs):
            audio, rate = kd.load_wav(rec)
            assert rate == fe.sample_rate
            nk = oracle_counts.get(rec) if args.num_spks == -1 else (args.num_spks or None)
            probs[rec] = eend_vc_infer_recording(
                lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), audio, fe,
                cfg.chunk_frames, n_clusters=nk, sil_spk_th=args.sil_spk_th,
            )
    elif cfg.family == "tsvad":
        from ..data.tsvad_dataset import TSVADChunkDataset
        from ..infer import tsvad_infer_dataset
        from ..infer.embeddings import EmbeddingStore

        store = EmbeddingStore.load(args.emb_store)
        ds = TSVADChunkDataset(
            args.data_dir, store, rs_len=cfg.rs_len, segment_shift=args.infer_shift,
            rate=cfg.sample_rate, is_train=False,
            enhancer=cfg.enhancer or None, enhance_prob=cfg.enhance_prob,
        )
        T = int(cfg.rs_len * 25)

        @jax.jit
        def predict(a, e):
            logits = model.apply({"params": params, **(mutable or {})}, a, e, T, train=False)
            return jax.nn.sigmoid(logits)

        probs = tsvad_infer_dataset(lambda a, e: predict(jnp.asarray(a), jnp.asarray(e)), ds)
        fs = 1.0 / 25
        rec_speakers = ds.rec_speakers  # real speaker names in the RTTM
    elif cfg.family == "tsvad3":
        # TS-VAD3: enrollment waveforms from the target_audio tree are
        # embedded in-model (reference ts_vad3 online utt spk-emb)
        from ..data.tsvad_dataset import TSVADChunkDataset
        from ..infer import tsvad_infer_dataset

        if not args.target_audio_dir:
            raise SystemExit("tsvad3 inference needs --target-audio-dir")
        ds = TSVADChunkDataset(
            args.data_dir, None, rs_len=cfg.rs_len, segment_shift=args.infer_shift,
            rate=cfg.sample_rate, is_train=False,
            target_audio_dir=args.target_audio_dir, enroll_len_s=cfg.ts_len,
        )
        T = int(cfg.rs_len * 25)

        @jax.jit
        def predict(a, e):
            logits = model.apply({"params": params, **(mutable or {})}, a, e, T, train=False)
            return jax.nn.sigmoid(logits)

        probs = tsvad_infer_dataset(
            lambda a, e: predict(jnp.asarray(a), jnp.asarray(e)), ds, emb_key="enroll_audio"
        )
        fs = 1.0 / 25
        rec_speakers = ds.rec_speakers
    elif cfg.family == "ots_vad":
        # enrollment-free online decode with slot bootstrapping + the
        # lower-threshold new-speaker rule (ots_vad/test_inference_case1.py)
        from ..data.kaldi_io import KaldiData
        from ..infer.ots_vad import ots_vad_infer_dataset

        kd = KaldiData(args.data_dir)
        probs = ots_vad_infer_dataset(
            model, {"params": params, **(mutable or {})}, kd,
            rate=cfg.sample_rate, rs_len=cfg.rs_len,
        )
        fs = 1.0 / 25
        S = model.cfg.num_speakers
        rec_speakers = {rec: [f"spk{i + 1}" for i in range(S)] for rec in probs}
    elif cfg.family == "tsvad_streaming":
        # windowed chunk-by-chunk streaming decode through the per-layer KV
        # caches, overlap-voted like offline TS-VAD (reference
        # run_ts_vad2_streaming.sh decoding_chunk_size + infer windows,
        # ts_vad2_streaming/model.py:368 forward_chunk_by_chunk)
        from ..data.tsvad_dataset import TSVADChunkDataset
        from ..infer import tsvad_infer_dataset
        from ..infer.chunked import make_streaming_window_predict
        from ..infer.embeddings import EmbeddingStore

        store = EmbeddingStore.load(args.emb_store)
        ds = TSVADChunkDataset(
            args.data_dir, store, rs_len=cfg.rs_len, segment_shift=args.infer_shift,
            rate=cfg.sample_rate, is_train=False,
        )
        T = int(cfg.rs_len * 25)
        predict = make_streaming_window_predict(model, params, T)
        probs = tsvad_infer_dataset(lambda a, e: predict(jnp.asarray(a), jnp.asarray(e)), ds)
        fs = 1.0 / 25
        rec_speakers = ds.rec_speakers
    elif cfg.family == "eend_m2f":
        from ..infer import infer_dataset
        from ..models.eend_m2f import m2f_predict_activity

        class_threshold = float(args.class_threshold)
        # default concurrent-speaker cap = n_speakers (reference infer2's
        # per-frame top-k); 0 disables
        max_conc = cfg.n_speakers if args.m2f_max_concurrent is None else args.m2f_max_concurrent

        @jax.jit
        def predict(a, m):
            outputs = model.apply(params, a, frame_mask=m, train=False)
            act, _keep = m2f_predict_activity(
                outputs, class_threshold=class_threshold, max_concurrent=max_conc
            )
            # (B, Q, T) → (B, T, Q) speaker-channel probabilities
            return act.transpose(0, 2, 1) * m[..., None]

        probs = infer_dataset(
            lambda a, m: predict(jnp.asarray(a), jnp.asarray(m)), args.data_dir, fe, cfg.chunk_frames
        )
    elif cfg.family == "sond":
        # powerset decode: softmax over PSE classes → per-speaker marginals
        # (reference sond/models.py powerset head; profiles from the
        # target-speaker embedding store, like training)
        from ..data.tsvad_dataset import TSVADChunkDataset
        from ..infer import tsvad_infer_dataset
        from ..infer.embeddings import EmbeddingStore
        from ..ops.features import kaldi_fbank_auto
        from ..ops.powerset import powerset_mapping

        store = EmbeddingStore.load(args.emb_store)
        ds = TSVADChunkDataset(
            args.data_dir, store, rs_len=cfg.rs_len, segment_shift=args.infer_shift,
            rate=cfg.sample_rate, is_train=False,
        )
        mapping = jnp.asarray(powerset_mapping(model.cfg.max_speakers, model.cfg.max_set_size))

        @jax.jit
        def predict(a, e):
            fb = kaldi_fbank_auto(a, num_mel_bins=model.cfg.feat_dim, sample_rate=cfg.sample_rate)
            logits = model.apply({"params": params, **(mutable or {})}, fb, e, False)
            pr = jax.nn.softmax(logits, axis=-1) @ mapping.astype(logits.dtype)  # (B, T12.5, N)
            return jnp.repeat(pr, 2, axis=1)  # 12.5 Hz (ResNet ×8) → the 25 Hz label grid

        probs = tsvad_infer_dataset(lambda a, e: predict(jnp.asarray(a), jnp.asarray(e)), ds)
        fs = 1.0 / 25
        rec_speakers = ds.rec_speakers
    elif cfg.family == "ssnd":
        # online block-wise inference with a running speaker-embedding
        # memory (reference ssnd_model.py:802 online_infer / :899
        # offline_rescore); speakers are discovered, not enrolled
        import numpy as np

        from ..data.kaldi_io import KaldiData
        from ..infer.ssnd_online import ssnd_offline_rescore, ssnd_online_infer

        if cfg.all_n_speakers == 0:
            # the trained global-speaker inventory size lives in E_all
            cfg = dataclasses.replace(cfg, all_n_speakers=int(np.asarray(params["E_all"]).shape[0]))
            model = _build_model(cfg)
        c = model.cfg

        @jax.jit
        def predict(a, aux):
            return model.apply({"params": params, **(mutable or {})}, a, aux, False)

        e_pse = np.asarray(params["e_pse"])[0]
        e_non = np.asarray(params["e_non"])[0]
        block_samples = int(c.vad_out_len / 25 * cfg.sample_rate)
        infer_fn = ssnd_offline_rescore if args.ssnd_rescore else ssnd_online_infer
        kd = KaldiData(args.data_dir)
        probs = {}
        for rec in sorted(kd.wavs):
            audio, rate = kd.load_wav(rec)
            assert rate == cfg.sample_rate, (rate, cfg.sample_rate)
            if audio.ndim > 1:
                audio = audio[:, 0]
            probs[rec] = infer_fn(
                lambda a, x: predict(jnp.asarray(a), jnp.asarray(x)), audio,
                block_samples, c.vad_out_len, c.max_speakers, e_pse, e_non,
            )
        fs = 1.0 / 25
    else:
        raise ValueError(cfg.family)

    spk_names = rec_speakers if cfg.family in ("tsvad", "tsvad_streaming", "sond") else {}
    if args.threshold_sweep:
        # reference sweep (ts_vad2/infer.py:79): write one RTTM per
        # threshold; score each when --ref given, report the best
        from ..score import score_der

        best = None
        # 0.2..0.95 in 0.05 steps plus a high-confidence tail (0.97/0.98) so
        # over-firing models' best thresholds are never the sweep boundary
        for th in [round(0.2 + 0.05 * i, 2) for i in range(16)] + [0.97, 0.98]:
            turns_t = []
            for rec, p in probs.items():
                turns_t += probs_to_turns(
                    p, rec, fs, threshold=th, median=args.median, speakers=spk_names.get(rec)
                )
            out_t = f"{args.out}_{th:.2f}"
            write_rttm(out_t, turns_t)
            if args.ref:
                res = score_der(args.ref, out_t, collar=0.25)
                extra = ""
                if args.cder:
                    # reference RAMC recipes sweep CDER alongside DER
                    # (run_ts_vad2.sh:2570-2576, cder/score.py)
                    from ..score.cder import score_cder

                    extra = f"  CDER {score_cder(args.ref, out_t)['avg']:.3f}"
                print(f"threshold {th:.2f}: {res.summary()}{extra}")
                if best is None or res.der < best[1]:
                    best = (th, res.der, out_t)
        if best:
            print(f"best threshold {best[0]:.2f} (DER {100*best[1]:.2f}%) → {best[2]}")
        return 0

    for rec, p in probs.items():
        turns += probs_to_turns(
            p, rec, fs, threshold=args.threshold, median=args.median, speakers=spk_names.get(rec)
        )
    write_rttm(args.out, turns)
    print(args.out)
    return 0


# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="speaker_diarization_tpu")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument(
        "--platform",
        default=os.environ.get("SDT_PLATFORM"),
        help="force the JAX backend (e.g. 'cpu', 'tpu'); overrides the "
        "environment's pinned platform. Also settable via SDT_PLATFORM.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("simulate", help="build a simulated multi-talker corpus")
    s.add_argument("--out", required=True)
    s.add_argument("--source-dir", help="Kaldi dir of single-speaker utts (default: synthetic voices)")
    s.add_argument("--noise-dir")
    s.add_argument("--rir-dir")
    s.add_argument("--with-rir", action="store_true", help="synthesize and apply RIRs (no --rir-dir needed)")
    s.add_argument("--rir-method", choices=["decay", "image_source"], default="decay",
                   help="synthetic RIRs: sparse decays, or shoebox image-source rooms (genrir.py semantics)")
    s.add_argument("--n-mixtures", type=int, default=10)
    s.add_argument("--n-speakers", type=int, default=2)
    s.add_argument("--sil-scale", type=float, default=2.0)
    s.add_argument("--rate", type=int, default=8000)
    s.add_argument("--seed", type=int, default=777)
    s.set_defaults(fn=cmd_simulate)

    sm = sub.add_parser("simulate-meetings", help="LibriCSS-style meeting simulation from a single-speaker corpus")
    sm.add_argument("--out", required=True)
    sm.add_argument("--source-dir", required=True, help="Kaldi dir of single-speaker utts")
    sm.add_argument("--noise-dir")
    sm.add_argument("--rir-dir")
    sm.add_argument("--dynamics", help="JSON meeting-dynamics config (default: built-in LibriCSS shapes)")
    sm.add_argument("--rate", type=int, default=8000)
    sm.add_argument("--seed", type=int, default=7)
    sm.set_defaults(fn=cmd_simulate_meetings)

    t = sub.add_parser("train", help="train a diarization model")
    t.add_argument(
        "--family",
        choices=["eend", "eend_eda", "fs_eend", "eend_vc", "eend_m2f", "tsvad", "tsvad_streaming", "tsvad3", "ots_vad", "vad", "ssnd", "sond", "spk", "enhance"],
    )
    t.add_argument("--config", help="YAML config (TrainCliConfig fields)")
    t.add_argument("--set", action="append", default=[], help="dotted overrides key=value")
    t.add_argument("--train-dir", required=True)
    t.add_argument("--valid-dir")
    t.add_argument("--exp-dir", required=True)
    t.add_argument("--emb-store", help="tsvad: embedding npz")
    t.add_argument("--target-audio-dir", help="tsvad3: comma list of target_audio trees (parallel to --train-dir)")
    t.add_argument("--valid-target-audio-dir", help="tsvad3: target_audio tree for --valid-dir")
    t.add_argument("--encoder-ckpt", help="tsvad: pretrained CAM++ torch checkpoint")
    t.add_argument("--noise-dir")
    t.add_argument("--rir-dir")
    t.add_argument("--real-data-dir",
                   help="ssnd: meeting data dir (wav.scp+rttm) mixed into each batch at "
                        "ssnd_real_ratio (reference dual simu+real training)")
    t.add_argument("--max-to-keep", type=int, default=5)
    t.add_argument("--resume", action="store_true", help="resume from the latest checkpoint in --exp-dir")
    t.add_argument("--profile-dir", help="capture a jax.profiler trace of a few steps into this dir")
    t.set_defaults(fn=cmd_train)

    i = sub.add_parser("infer", help="run chunked inference → RTTM")
    i.add_argument(
        "--family",
        choices=["eend", "eend_eda", "fs_eend", "eend_vc", "eend_m2f", "tsvad", "tsvad_streaming", "tsvad3", "ots_vad", "sond", "ssnd"],
    )
    i.add_argument("--config")
    i.add_argument("--set", action="append", default=[])
    i.add_argument("--data-dir", required=True)
    i.add_argument("--exp-dir", required=True)
    i.add_argument("--step", type=int)
    i.add_argument("--out", required=True)
    i.add_argument("--threshold", type=float, default=0.5)
    i.add_argument("--median", type=int, default=11)
    i.add_argument("--attractor-threshold", type=float, default=0.5)
    i.add_argument("--class-threshold", type=float, default=0.5, help="eend_m2f query-keep threshold")
    i.add_argument("--m2f-max-concurrent", type=int,
                   help="eend_m2f per-frame top-k speaker cap (reference infer2); default n_speakers, 0 disables")
    i.add_argument("--ssnd-rescore", action="store_true", help="ssnd: two-pass offline rescore")
    i.add_argument("--emb-store")
    i.add_argument("--target-audio-dir", help="tsvad3: target_audio tree for enrollment waveforms")
    i.add_argument("--infer-shift", type=float, default=1.0)
    i.add_argument("--threshold-sweep", action="store_true", help="write RTTMs for thresholds 0.2..0.95")
    i.add_argument("--num-spks", type=int, default=0,
                   help="eend_vc: fixed cluster count (>0), -1 = oracle per-recording count from --ref (reference est_nspk mode), 0 = distance-threshold AHC")
    i.add_argument("--sil-spk-th", type=float, default=0.05,
                   help="eend_vc: silent-channel mean-activity threshold")
    i.add_argument("--cder", action="store_true", help="also report CDER in the threshold sweep")
    i.add_argument("--ref", help="reference RTTM for sweep scoring")
    i.add_argument("--avg-last", type=int, default=0, help="average the last K checkpoints")
    i.set_defaults(fn=cmd_infer)

    cl = sub.add_parser("cluster", help="VAD → embeddings → clustering → RTTM")
    cl.add_argument("--data-dir", required=True, help="kaldi dir with wav.scp")
    cl.add_argument("--out", required=True, help="output RTTM path")
    cl.add_argument("--method", choices=["spectral", "umap", "vbx"], default="spectral")
    cl.add_argument("--plda", help="vbx: PLDA npz from estimate-plda")
    cl.add_argument("--vbx-loop-prob", type=float, default=0.9)
    cl.add_argument("--vbx-fa", type=float, default=0.4)
    cl.add_argument("--vbx-fb", type=float, default=17.0)
    cl.add_argument("--sad", choices=["energy", "oracle", "neural"], default="energy")
    cl.add_argument("--oracle-rttm", help="RTTM for oracle SAD (default: <data-dir>/rttm)")
    cl.add_argument("--vad-ckpt", help="neural VAD params (save_vad_params msgpack)")
    cl.add_argument("--vad-threshold", type=float, default=0.5)
    cl.add_argument("--min-duration", type=float, default=0.0)
    cl.add_argument("--encoder", choices=["campplus", "spectrum"], default="campplus")
    cl.add_argument("--encoder-ckpt", help="pretrained CAM++ torch checkpoint")
    cl.add_argument("--num-spks", type=int, help="fix the speaker count (else eigengap)")
    cl.add_argument("--max-num-spks", type=int, default=20)
    cl.add_argument("--window", type=float, default=1.5)
    cl.add_argument("--hop", type=float, default=0.75)
    cl.add_argument("--rate", type=int, default=16000)
    cl.add_argument("--ref", help="reference RTTM: score the result")
    cl.add_argument("-c", "--collar", type=float, default=0.25)
    cl.set_defaults(fn=cmd_cluster)

    ep = sub.add_parser("estimate-plda", help="labeled kaldi dir → PLDA npz for cluster --method vbx")
    ep.add_argument("--data-dir", required=True, help="kaldi dir with utt2spk (+segments)")
    ep.add_argument("--out", required=True, help="output PLDA npz path")
    ep.add_argument("--encoder", choices=["campplus", "spectrum"], default="campplus")
    ep.add_argument("--encoder-ckpt")
    ep.add_argument("--rate", type=int, default=16000)
    ep.add_argument("--window", type=float, default=1.5)
    ep.add_argument("--hop", type=float, default=0.75)
    ep.add_argument("--max-windows-per-utt", type=int, default=8)
    ep.add_argument("--plda-dim", type=int, default=None, help="keep top-K PLDA dims")
    ep.set_defaults(fn=cmd_estimate_plda)

    ev = sub.add_parser("export-vad", help="export trained VAD params for `cluster --vad-ckpt`")
    ev.add_argument("--exp-dir", required=True)
    ev.add_argument("--step", type=int)
    ev.add_argument("--out", required=True)
    ev.set_defaults(fn=cmd_export_vad)

    ee = sub.add_parser("export-enhancer", help="export trained denoiser for dataset enhancer neural:<path>")
    ee.add_argument("--exp-dir", required=True)
    ee.add_argument("--step", type=int)
    ee.add_argument("--out", required=True)
    ee.set_defaults(fn=cmd_export_enhancer)

    sc = sub.add_parser("score", help="score hypothesis RTTM (DER + optional CDER)")
    sc.add_argument("--ref", required=True)
    sc.add_argument("--sys", required=True)
    sc.add_argument("-c", "--collar", type=float, default=0.25)
    sc.add_argument("-1", "--overlap-limit", action="store_true")
    sc.add_argument("-u", "--uem", help="NIST UEM file restricting the scored regions (md-eval -u)")
    sc.add_argument(
        "--regions", choices=["all", "single", "overlap"], default="all",
        help="score all regions, single-speaker only (md-eval -1), or overlap-only (spyder)",
    )
    sc.add_argument("--per-file", action="store_true")
    sc.add_argument("--cder", action="store_true")
    sc.set_defaults(fn=cmd_score)

    pt = sub.add_parser(
        "prepare-targets",
        help="system/oracle RTTM → overlap-free per-speaker target audio for TS-VAD",
    )
    pt.add_argument("--rttm", required=True, help="system (clustering) or oracle RTTM")
    pt.add_argument("--data-dir", required=True, help="Kaldi dir of the mixture wavs")
    pt.add_argument("--out", required=True)
    pt.add_argument("--label-rate", type=int, default=25)
    pt.add_argument("--min-target-s", type=float, default=0.0,
                    help="drop speakers with less clean speech than this")
    pt.set_defaults(fn=cmd_prepare_targets)

    cd = sub.add_parser("config-dump", help="print the resolved train config (yaml/json/bash)")
    cd.add_argument("--config")
    cd.add_argument("--set", action="append", default=[])
    cd.add_argument("--format", choices=["yaml", "json", "bash"], default="yaml")
    cd.set_defaults(fn=cmd_config_dump)

    ee = sub.add_parser("export-encoder", help="export a trained spk encoder for extract-embeddings")
    ee.add_argument("--exp-dir", required=True)
    ee.add_argument("--step", type=int)
    ee.add_argument("--out", required=True, help="output .npz path")
    ee.add_argument("--config", help="the training YAML (to recover model dims)")
    ee.add_argument("--set", action="append", default=[])
    ee.set_defaults(fn=cmd_export_encoder)

    e = sub.add_parser("extract-embeddings", help="dump target-speaker embeddings to npz")
    e.add_argument("--data-dir", required=True, help="Kaldi dir of per-speaker target wavs")
    e.add_argument("--out", required=True)
    e.add_argument("--encoder-ckpt", help="torch CAM++ .pt/.bin, or our export-encoder .npz")
    e.add_argument("--rate", type=int, default=16000)
    e.add_argument("--window", type=float, default=6.0)
    e.add_argument("--hop", type=float, default=1.0)
    e.set_defaults(fn=cmd_extract_embeddings)
    return p


def _enable_compilation_cache():
    """Persist XLA executables across CLI invocations.

    Recipe runs (recipes/*.sh) invoke this CLI once per stage; without a
    persistent cache every invocation re-pays the full XLA compile (minutes
    for the large encoders when the TPU sits behind a relay). Opt out with
    SDT_NO_COMPILE_CACHE=1; override the location with SDT_COMPILE_CACHE.
    """
    if os.environ.get("SDT_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = os.environ.get(
            "SDT_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "sdt_jax_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization — never fail the CLI
        logging.getLogger(__name__).warning("compilation cache disabled: %s", e)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _setup_logging(args.verbose)
    if args.platform:
        # Must run before any backend initialization. The runtime env may pin
        # JAX_PLATFORMS at interpreter start (remote-TPU plugin), so an env
        # var alone cannot force CPU — jax.config can.
        import jax

        jax.config.update("jax_platforms", args.platform)
    _enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
