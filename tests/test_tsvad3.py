"""TS-VAD3: online enrollment speaker embeddings + attention fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from speaker_diarization_tpu.models.tsvad import TSVADConfig
from speaker_diarization_tpu.models.tsvad3 import AttFuse, TSVAD3Config, TSVAD3Model

BASE = TSVADConfig(
    max_num_speaker=4,
    transformer_ffn_embed_dim=128,
    num_transformer_layer=1,
    dropout=0.0,
    encoder_block_layers=(2, 2),
)
CFG = TSVAD3Config(base=BASE, speaker_encoder_layers=(2, 2), fuse_speaker_embedding_feat=True)


def _inputs(B=1, secs=1, ts_secs=0.5, seed=0):
    rng = np.random.default_rng(seed)
    audio = jnp.asarray(rng.standard_normal((B, secs * 16000)).astype(np.float32) * 0.05)
    targets = jnp.asarray(rng.standard_normal((B, 4, int(ts_secs * 16000))).astype(np.float32) * 0.05)
    return audio, targets


class TestTSVAD3:
    def test_forward_from_enrollment_wavs(self):
        model = TSVAD3Model(cfg=CFG)
        audio, targets = _inputs()
        v = model.init(jax.random.PRNGKey(0), audio, targets, 25)
        logits = model.apply(v, audio, targets, 25)
        assert logits.shape == (1, 25, 4)
        assert np.isfinite(np.asarray(logits)).all()

    def test_enrollment_identity_matters(self):
        # swapping two speakers' enrollment audio must permute conditioning
        model = TSVAD3Model(cfg=CFG)
        audio, targets = _inputs(seed=1)
        v = model.init(jax.random.PRNGKey(0), audio, targets, 25)
        base = np.asarray(model.apply(v, audio, targets, 25))
        perm = targets[:, jnp.asarray([1, 0, 2, 3])]
        swapped = np.asarray(model.apply(v, audio, perm, 25))
        assert not np.allclose(base[..., 0], swapped[..., 0], atol=1e-4)

    def test_freeze_speaker_encoder_blocks_grads(self):
        model = TSVAD3Model(cfg=CFG)
        audio, targets = _inputs(seed=2)
        v = model.init(jax.random.PRNGKey(0), audio, targets, 25)
        labels = jnp.asarray((np.random.default_rng(3).random((1, 25, 4)) < 0.3).astype(np.float32))

        def loss(params, freeze):
            logits = model.apply(
                {"params": params, **{k: v[k] for k in v if k != "params"}},
                audio, targets, 25, freeze_speaker_encoder=freeze,
            )
            import optax

            return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

        g_free = jax.grad(loss)(v["params"], False)["speaker_encoder"]
        g_frozen = jax.grad(loss)(v["params"], True)["speaker_encoder"]
        assert max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g_free)) > 0
        assert max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g_frozen)) == 0

    def test_use_spk_embed_mode_matches_tsvad2_contract(self):
        cfg = TSVAD3Config(base=BASE, use_spk_embed=True, fuse_speaker_embedding_feat=False)
        model = TSVAD3Model(cfg=cfg)
        audio, _ = _inputs(seed=4)
        embs = jnp.asarray(np.random.default_rng(5).standard_normal((1, 4, 192)).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), audio, embs, 25)
        logits = model.apply(v, audio, embs, 25)
        assert logits.shape == (1, 25, 4)

    def test_att_fuse_shapes(self):
        m = AttFuse(out_dim=16)
        spk = jnp.asarray(np.random.default_rng(6).standard_normal((2, 30, 16)).astype(np.float32))
        sp = jnp.asarray(np.random.default_rng(7).standard_normal((2, 10, 16)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), spk, sp)
        out = m.apply(v, spk, sp)
        assert out.shape == (2, 10, 16)
