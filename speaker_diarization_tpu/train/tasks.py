"""Task loss functions plugged into the unified Trainer.

One place for the per-family training objectives (reference spreads these
across four harnesses): EEND PIT-BCE, EEND-EDA PIT + attractor existence,
TS-VAD per-speaker BCE. Each factory returns a loss_fn with the Trainer's
expected signature.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import losses as L
from ..ops import metrics as M


def make_eend_loss(model):
    """loss_fn for EENDModel: PIT-BCE with masks; aux carries frame-DER."""

    def loss_fn(params, batch, rng, train):
        logits = model.apply(
            params,
            batch["audio"],
            frame_mask=batch["frame_mask"],
            deterministic=not train,
            rngs={"dropout": rng} if train else None,
        )
        loss, labels_perm, _ = L.pit_loss(
            logits, batch["labels"], frame_mask=batch["frame_mask"], spk_mask=batch.get("spk_mask")
        )
        stats = M.diarization_error_stats(logits, labels_perm, batch["frame_mask"])
        return loss, {"frame_der": M.der_from_stats(stats)}

    return loss_fn


def make_eda_loss(model, attractor_weight: float = 1.0, shuffle_frames: bool = True):
    """loss_fn for EendEdaModel: PIT-BCE + attractor existence BCE.

    Reference: eend_eda/models.py:654-692 (attractor_loss) + 694 (pit_loss),
    with train-time frame shuffling before the EDA LSTM (models.py:531-536).
    """

    def loss_fn(params, batch, rng, train):
        order = None
        rngs = None
        if train:
            rng_d, rng_s = jax.random.split(rng)
            rngs = {"dropout": rng_d}
            if shuffle_frames:
                B, T = batch["frame_mask"].shape
                # per-sample random permutation of frame order
                noise = jax.random.uniform(rng_s, (B, T)) - batch["frame_mask"]
                order = jnp.argsort(noise, axis=-1)  # valid frames first, shuffled
        logits, exist_logits = model.apply(
            params,
            batch["audio"],
            frame_mask=batch["frame_mask"],
            order=order,
            deterministic=not train,
            rngs=rngs,
        )
        pit, labels_perm, _ = L.pit_loss(
            logits, batch["labels"], frame_mask=batch["frame_mask"], spk_mask=batch.get("spk_mask")
        )
        att = L.attractor_existence_loss(exist_logits, batch["spk_mask"])
        stats = M.diarization_error_stats(logits, labels_perm, batch["frame_mask"])
        return pit + attractor_weight * att, {
            "pit_loss": pit,
            "attractor_loss": att,
            "frame_der": M.der_from_stats(stats),
        }

    return loss_fn


def make_fs_eend_loss(model, consistency_weight: float = 1.0):
    """loss_fn for FSEENDModel: PIT-BCE on [silence‖speakers‖pad] channels +
    embedding-consistency MSE (reference fs_eend/model.py:55-99)."""
    from ..models.fs_eend import consistency_loss, fs_eend_labels

    def loss_fn(params, batch, rng, train):
        logits, emb = model.apply(
            params,
            batch["audio"],
            frame_mask=batch["frame_mask"],
            deterministic=not train,
            rngs={"dropout": rng} if train else None,
        )
        ch_labels = fs_eend_labels(batch["labels"], batch["frame_mask"])
        pit, labels_perm, _ = L.pit_loss(logits, ch_labels, frame_mask=batch["frame_mask"])
        cons = consistency_loss(emb, ch_labels, batch["frame_mask"])
        stats = M.diarization_error_stats(logits, labels_perm, batch["frame_mask"])
        return pit + consistency_weight * cons, {
            "pit_loss": pit,
            "consistency_loss": cons,
            "frame_der": M.der_from_stats(stats),
        }

    return loss_fn


def make_eend_vc_loss(model, spk_loss_weight: float = 0.03):
    """loss_fn for EENDVCModel: PIT-BCE + global-speaker distance-softmax CE.

    Reference: eend_vector_cluster/models_vector_cluster.py:24-72 (pit) +
    159-192 (spk_loss): channels carrying speech are classified against the
    learned global speaker table under the best PIT permutation. Weighting
    follows train_vector_cluster.py:222-235 — spk_loss_ratio 0.03 (its
    default, train.py:25) against (1-ratio)·pit; the round-3 leaderboard
    used 1.0 here and the spk term destabilized training (divergence at
    step ~700, frame_der 0.09→0.64).
    """

    def loss_fn(params, batch, rng, train):
        logits, vecs = model.apply(
            params,
            batch["audio"],
            frame_mask=batch["frame_mask"],
            deterministic=not train,
            rngs={"dropout": rng} if train else None,
        )
        pit, labels_perm, best_perm = L.pit_loss(
            logits, batch["labels"], frame_mask=batch["frame_mask"], spk_mask=batch.get("spk_mask")
        )
        # channel i's label column is best_perm[b, i] → its global speaker id
        gids = jnp.take_along_axis(batch["spk_ids"], best_perm, axis=-1)  # (B, S)
        has_speech = jnp.sum(labels_perm, axis=1) > 0  # (B, S)
        valid = has_speech & (gids >= 0)
        table_logits = model.apply(params, vecs, method=model.spk_distance_logits)  # (B, S, N)
        logp = jax.nn.log_softmax(table_logits, axis=-1)
        picked = jnp.take_along_axis(logp, jnp.maximum(gids, 0)[..., None], axis=-1)[..., 0]
        spk = -jnp.sum(picked * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        stats = M.diarization_error_stats(logits, labels_perm, batch["frame_mask"])
        total = (1.0 - spk_loss_weight) * pit + spk_loss_weight * spk
        return total, {
            "pit_loss": pit,
            "spk_loss": spk,
            "frame_der": M.der_from_stats(stats),
        }

    return loss_fn


def make_ssnd_loss(model, arcface_weight: float = 0.01, bce_alpha: float = 0.75, bce_gamma: float = 2.0,
                   mask_prob: float = 0.5):
    """loss_fn for SSNDModel: focal BCE on per-slot VAD + ArcFace CE on
    predicted speaker embeddings (reference ssnd_model.py:445-520).

    Batch: audio (B, N_samples), aux_embs (B, S, emb), labels (B, S, T_vad),
    spk_gids (B, S) global ids (-1 = empty slot, excluded from ArcFace).

    Query construction follows the reference's training protocol
    (ssnd_model.py:592-633): present slots get their E_all row; with
    probability mask_prob ONE present slot's query is replaced by the
    pseudo-speaker e_pse while its VAD labels stay — this is what teaches
    the pseudo slot to DETECT an unenrolled speaker (online discovery);
    empty slots get 50% e_non / 50% a random (distractor) speaker row,
    both with zero labels. (Round 3 fed e_pse for every empty slot with
    zero labels, teaching "pseudo slot = silence" — online discovery
    predicted nothing and SSND scored 100% DER.)
    """

    def loss_fn(params, mutable, batch, rng, train):
        variables = {"params": params, **mutable}
        gids = batch["spk_gids"]
        B, S = gids.shape
        if "aux_embs" in batch:
            aux = batch["aux_embs"]
        else:
            E_all = params["E_all"]
            e_pse = params["e_pse"][0]
            e_non = params["e_non"][0]
            present = gids >= 0
            k1, k2, k3, k4 = jax.random.split(rng, 4)
            aux_present = E_all[jnp.maximum(gids, 0)]
            rand_gid = jax.random.randint(k1, (B, S), 0, E_all.shape[0])
            use_non = jax.random.bernoulli(k2, 0.5, (B, S))
            aux_empty = jnp.where(use_non[..., None], e_non, E_all[rand_gid])
            aux = jnp.where(present[..., None], aux_present, aux_empty)
            if train:
                midx = jax.random.randint(k3, (B,), 0, S)
                do_mask = jax.random.bernoulli(k4, mask_prob, (B,)) & present[jnp.arange(B), midx]
                masked_rows = jnp.where(
                    do_mask[:, None], e_pse, aux[jnp.arange(B), midx]
                )
                aux = aux.at[jnp.arange(B), midx].set(masked_rows)
        if train:
            # teacher-forced representation queries: q_aux = VAD labels
            # (reference ssnd_model.py:673)
            (vad, emb), new_mut = model.apply(
                variables, batch["audio"], aux, True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
                vad_labels=batch["labels"],
            )
            new_mut = dict(new_mut)
        else:
            vad, emb = model.apply(
                variables, batch["audio"], aux, False, vad_labels=batch["labels"]
            )
            new_mut = mutable
        # focal BCE over (B, S, T)
        labels = batch["labels"]
        p = jax.nn.sigmoid(vad)
        ce = L.bce_with_logits(vad, labels)
        p_t = p * labels + (1 - p) * (1 - labels)
        a_t = bce_alpha * labels + (1 - bce_alpha) * (1 - labels)
        bce = jnp.mean(a_t * (1 - p_t) ** bce_gamma * ce)

        gids = batch["spk_gids"]  # (B, S)
        valid = (gids >= 0).reshape(-1)
        flat_emb = emb.reshape(-1, emb.shape[-1])
        flat_gid = jnp.maximum(gids.reshape(-1), 0)
        logits_arc = model.apply(variables, flat_emb, flat_gid, method=model.arcface_logits)
        logp = jax.nn.log_softmax(logits_arc, axis=-1)
        n_all = logits_arc.shape[-1]
        smooth = 0.05
        onehot = jax.nn.one_hot(flat_gid, n_all) * (1 - smooth) + smooth / n_all
        ce_arc = -jnp.sum(onehot * logp, axis=-1)
        arc = jnp.sum(ce_arc * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        # reference adds a small embedding-norm penalty (ssnd_model.py:477)
        arc = arc + 0.001 * jnp.mean(jnp.linalg.norm(flat_emb, axis=-1))
        # top-1 speaker-id accuracy: the direct signal that the
        # representation decoder aligns with E_all (CE alone starts ~11
        # from the margin+scale and moves slowly)
        acc = jnp.sum((jnp.argmax(logits_arc, -1) == flat_gid) * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        stats = M.diarization_error_stats(vad.transpose(0, 2, 1), labels.transpose(0, 2, 1))
        return bce + arcface_weight * arc, (
            {"bce_loss": bce, "arcface_loss": arc, "arcface_acc": acc,
             "frame_der": M.der_from_stats(stats)},
            new_mut,
        )

    return loss_fn


def make_tsvad_loss(model, n_label_frames: int, freeze_encoder: bool = False):
    """loss_fn (has_mutable=True) for TSVADModel: masked per-speaker BCE.

    freeze_encoder stop-gradients the speech encoder (the reference's
    freeze_speech_encoder_updates window, model.py:771 — here a per-run
    flag: train the backends first with the pretrained encoder frozen,
    then resume with it unfrozen)."""

    def loss_fn(params, mutable, batch, rng, train):
        if train:
            logits, new_mut = model.apply(
                {"params": params, **mutable},
                batch["audio"],
                batch["target_embs"],
                n_label_frames,
                train=True,
                freeze_encoder=freeze_encoder,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            new_mut = dict(new_mut)
        else:
            logits = model.apply(
                {"params": params, **mutable}, batch["audio"], batch["target_embs"], n_label_frames, train=False
            )
            new_mut = mutable
        loss = L.standard_bce(logits, batch["labels"])
        stats = M.diarization_error_stats(logits, batch["labels"])
        return loss, ({"frame_der": M.der_from_stats(stats)}, new_mut)

    return loss_fn


def make_tsvad3_loss(model, n_label_frames: int, freeze_speech_encoder: bool = False):
    """loss_fn (has_mutable) for TSVAD3Model: enrollment *waveforms*
    (batch['enroll_audio'] (B, S, Nts)) are embedded by the in-model speaker
    encoder (reference egs/alimeeting/ts_vad3 online utt spk-emb); masked
    per-speaker BCE like TS-VAD2."""

    def loss_fn(params, mutable, batch, rng, train):
        targets = batch["enroll_audio"] if "enroll_audio" in batch else batch["target_embs"]
        if train:
            logits, new_mut = model.apply(
                {"params": params, **mutable}, batch["audio"], targets, n_label_frames,
                train=True, freeze_speech_encoder=freeze_speech_encoder,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            new_mut = dict(new_mut)
        else:
            logits = model.apply(
                {"params": params, **mutable}, batch["audio"], targets, n_label_frames, train=False
            )
            new_mut = mutable
        loss = L.standard_bce(logits, batch["labels"])
        stats = M.diarization_error_stats(logits, batch["labels"])
        return loss, ({"frame_der": M.der_from_stats(stats)}, new_mut)

    return loss_fn


def make_ots_vad_loss(model):
    """loss_fn (has_mutable) for OTSVADModel: the chunk is split into two
    adjacent half-blocks; the model self-enrolls on the left block with its
    TRUE labels and predicts the right block (reference ots_vad training —
    no enrollment embeddings anywhere). Labels are (B, T25, S) over the full
    chunk; the model's ×8 frame rate is 12.5 Hz, so labels subsample ::2."""

    def loss_fn(params, mutable, batch, rng, train):
        audio = batch["audio"]
        labels = jnp.transpose(batch["labels"][:, ::2], (0, 2, 1))  # (B, S, T12)
        n = audio.shape[1] // 2
        t = labels.shape[-1] // 2
        left, right = audio[:, :n], audio[:, n:]
        y_left, y_right = labels[:, :, :t], labels[:, :, t: 2 * t]
        if train:
            logits, new_mut = model.apply(
                {"params": params, **mutable}, left, right, y_left,
                train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            new_mut = dict(new_mut)
        else:
            logits = model.apply({"params": params, **mutable}, left, right, y_left, train=False)
            new_mut = mutable
        T = min(logits.shape[-1], y_right.shape[-1])
        logits, y_right = logits[..., :T], y_right[..., :T]
        loss = L.standard_bce(logits, y_right)
        stats = M.diarization_error_stats(
            jnp.transpose(logits, (0, 2, 1)), jnp.transpose(y_right, (0, 2, 1))
        )
        return loss, ({"frame_der": M.der_from_stats(stats)}, new_mut)

    return loss_fn


def make_streaming_tsvad_loss(model, n_label_frames: int):
    """loss_fn for StreamingTSVADModel over TS-VAD chunk batches: masked
    per-speaker BCE on the chunk-masked full-sequence forward (reference
    ts_vad2_streaming/model.py training with static_chunk_size attention
    masks; the best recipe, run_ts_vad2_streaming.sh:157, uses the static
    chunk). No batch stats — the streaming model is conv+LayerNorm only."""

    def loss_fn(params, batch, rng, train):
        # `params` is the full variables dict ({"params": ...}), like the
        # other non-mutable families
        logits = model.apply(
            params,
            batch["audio"],
            batch["target_embs"],
            n_label_frames,
            train,
            rngs={"dropout": rng} if train else {},
        )
        loss = L.standard_bce(logits, batch["labels"])
        stats = M.diarization_error_stats(logits, batch["labels"])
        return loss, {"frame_der": M.der_from_stats(stats)}

    return loss_fn


def make_vad_loss(model):
    """loss_fn for NeuralVAD (system SAD): frame BCE on the union of
    speaker activities. Labels come from any EEND-style chunk dataset run
    at subsampling=1 (one label per frame_shift hop)."""
    import optax

    def loss_fn(params, batch, rng, train):
        del rng, train  # VAD model has no dropout
        logits = model.apply(params, batch["audio"])  # (B, T_frames)
        speech = (batch["labels"].max(axis=-1) > 0).astype(jnp.float32)  # (B, T_lab)
        T = min(logits.shape[1], speech.shape[1])
        mask = batch["frame_mask"][:, :T]
        bce = optax.sigmoid_binary_cross_entropy(logits[:, :T], speech[:, :T])
        loss = jnp.sum(bce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        acc = jnp.sum(((logits[:, :T] > 0) == (speech[:, :T] > 0.5)) * mask) / jnp.maximum(
            jnp.sum(mask), 1.0
        )
        return loss, {"vad_acc": acc}

    return loss_fn


def make_m2f_loss(model):
    """loss_fn for EENDM2FModel over EEND chunk batches: Hungarian-matched
    set criterion (reference eend_m2f/criterion.py:176). Batch labels are
    (B, T, S) per-frame; the criterion wants per-query targets (B, S, T)."""
    from ..models.eend_m2f import m2f_criterion

    def loss_fn(params, batch, rng, train):
        out = model.apply(
            params, batch["audio"], train=train,
            rngs={"dropout": rng} if train else None,
        )
        labels = jnp.transpose(batch["labels"], (0, 2, 1))  # (B, S, T)
        loss, aux = m2f_criterion(out, labels, model.cfg, frame_mask=batch.get("frame_mask"))
        return loss, aux

    return loss_fn


def make_sond_loss_from_audio(model, frame_size: int = 400, frame_shift: int = 160, sample_rate: int = 16000):
    """loss_fn (has_mutable) for SONDModel over TS-VAD chunk batches.

    Computes the 100 Hz kaldi fbank from raw audio on device, uses the
    target-speaker embeddings as the profile inventory, and subsamples the
    25 Hz labels to the model's 12.5 Hz output rate (ResNet34 ×8 downsample,
    reference sond/resnet34_encoder.py)."""
    from ..models.sond import make_sond_loss
    from ..ops.features import kaldi_fbank_auto

    base = make_sond_loss(model)

    def loss_fn(params, mutable, batch, rng, train):
        fbank = kaldi_fbank_auto(
            batch["audio"], num_mel_bins=model.cfg.feat_dim, sample_rate=sample_rate
        )
        labels = batch["labels"][:, ::2]  # 25 Hz → 12.5 Hz
        # by construction: pad/crop fbank to 8·T_labels so the ×8 encoder
        # (ceil rounding, SONDModel.n_out_frames) emits exactly one frame
        # per label — no silent cropping of either stream
        t_fb = 8 * labels.shape[1]
        if fbank.shape[1] < t_fb:
            fbank = jnp.pad(fbank, ((0, 0), (0, t_fb - fbank.shape[1]), (0, 0)))
        fbank = fbank[:, :t_fb]
        b2 = dict(fbank=fbank, spk_embs=batch["target_embs"], labels=labels)
        return base(params, mutable, b2, rng, train)

    return loss_fn


def make_spk_loss(model, frame_size: int = 400, frame_shift: int = 160, sample_rate: int = 16000):
    """loss_fn (has_mutable) for SpeakerClassifier: on-device kaldi fbank →
    AAM-softmax CE (the objective behind the reference's external
    modelscope/wespeaker encoder checkpoints). Aux carries top-1 accuracy."""
    from ..ops.features import kaldi_fbank_auto

    def loss_fn(params, mutable, batch, rng, train):
        fbank = kaldi_fbank_auto(
            batch["audio"], num_mel_bins=model.cfg.feat_dim,
            sample_rate=sample_rate, mean_norm=True,
        )
        variables = {"params": params, **mutable}
        if train:
            logits, new_mut = model.apply(
                variables, fbank, batch["label"], True, mutable=["batch_stats"],
            )
            new_mut = dict(new_mut)
        else:
            logits = model.apply(variables, fbank, None, False)
            new_mut = mutable
        logp = jax.nn.log_softmax(logits, axis=-1)
        onehot = jax.nn.one_hot(batch["label"], logits.shape[-1])
        loss = -jnp.mean(jnp.sum(onehot * logp, axis=-1))
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        return loss, ({"acc": acc}, new_mut)

    return loss_fn
