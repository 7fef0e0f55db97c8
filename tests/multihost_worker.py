"""Worker for the multi-process (multi-host) distributed test.

Run as: python multihost_worker.py <process_id> <num_processes> <port> <out.npz> [local_devices]

Each process gets `local_devices` (default 2) virtual CPU devices and joins the jax.distributed
coordination service — the same `jax.distributed.initialize` path real
multi-host TPU slices use for DCN rendezvous (the TPU-native analogue of
the reference's NCCL MASTER_ADDR/PORT setup, dist.py:24-42). The global
mesh spans 2·num_processes devices; each process feeds its host-local
batch shard.
"""

import sys


def main():
    pid, nproc, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    local_devices = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    import jax

    # a sitecustomize pins JAX_PLATFORMS to the remote-TPU plugin; override
    # through jax.config before the backend initializes (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
        )

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from speaker_diarization_tpu.models import EENDModel
    from speaker_diarization_tpu.parallel import make_mesh
    from speaker_diarization_tpu.train import Trainer, TrainerConfig
    from speaker_diarization_tpu.train.tasks import make_eend_loss

    assert jax.process_count() == nproc
    n_global = nproc * local_devices
    assert len(jax.devices()) == n_global
    mesh = make_mesh(n_data=n_global, n_model=1)

    model = EENDModel(n_speakers=2, d_model=32, n_layers=1, n_heads=2, d_ff=64, dropout=0.0, frontend=None)
    B_global, T, F = 8, 50, 345  # fixed global batch; feature dim = spliced frontend
    rng = np.random.default_rng(0)

    def global_batch(step):
        r = np.random.default_rng(1000 + step)
        return dict(
            audio=r.standard_normal((B_global, T, F)).astype(np.float32) * 0.1,
            labels=(r.random((B_global, T, 2)) < 0.3).astype(np.float32),
            frame_mask=np.ones((B_global, T), np.float32),
            spk_mask=np.ones((B_global, 2), np.float32),
        )

    per_proc = B_global // nproc
    loss_fn = make_eend_loss(model)
    trainer = Trainer(
        loss_fn,
        TrainerConfig(
            optimizer="adam", schedule="const", learning_rate=1e-3, seed=0,
            deterministic_reduce=True,
        ),
        mesh=mesh,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(global_batch(0)["audio"][:1]))
    state = trainer.init_state(params)
    losses = []
    for step in range(5):
        gb = global_batch(step)
        local = {k: v[pid * per_proc: (pid + 1) * per_proc] for k, v in gb.items()}
        state, aux = trainer.train_step(state, local)
        losses.append(float(aux["loss"]))

    final = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), state.params
    )
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(final)[0]
    }
    np.savez(out, losses=np.array(losses), **flat)
    print(f"proc{pid} done losses={losses}")


if __name__ == "__main__":
    main()
