"""Worker process for tests/test_multihost.py — NOT a pytest file.

Joins a 2-process jax.distributed runtime (4 virtual CPU devices each →
one GLOBAL 8-device ('data',) mesh), runs the real sparse-label train step
over mesh-sharded batches through the production helpers
(config flags → parallel/distributed.initialize_from_args →
parallel/mesh.shard_batch/shard_pytree), and prints the final loss and
confusion-matrix checksum for the parent to compare against its own
single-process 8-device run.
"""

import os
import sys


def main():
    pid, port = int(sys.argv[1]), int(sys.argv[2])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    # the product path: --dist_* flags wire the global runtime during
    # argument finalisation, before any jax computation
    from pixelpick_tpu.config import default_args

    args = default_args(
        write_files=False, dataset_name="cv",
        dist_coordinator=f"localhost:{port}",
        dist_num_processes=2, dist_process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np

    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import create_train_state, make_train_step
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch, shard_pytree

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (3, 3), padding=1, name="c1")(x)
            pred = nn.Conv(4, (1, 1), name="cls")(nn.relu(h))
            return {"pred": pred, "emb": h}

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)))
    tx = make_optimizer(args, variables["params"], iters_per_epoch=5)
    step = make_train_step(model, tx, n_classes=4, mean=[0.5] * 3,
                           std=[0.25] * 3, donate=False)

    mesh = get_mesh(args)
    assert mesh is not None and mesh.devices.size == 8
    state = shard_pytree(create_train_state(variables["params"], {}, tx), mesh)

    # every process builds the IDENTICAL global batch (same seed — the
    # multi-host contract, parallel/distributed.py); shard_batch hands jax
    # only this process's rows
    loss = hist = None
    for i in range(3):
        rng = np.random.default_rng(100 + i)
        batch = {
            "x": rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8),
            "coords": rng.integers(0, 16, (8, 6, 2)).astype(np.int32),
            "labels": rng.integers(0, 4, (8, 6)).astype(np.int32),
            "valid": np.ones((8, 6), bool),
        }
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding.spec == ("data",)
        state, loss, hist = step(state, sharded, jax.random.PRNGKey(1))

    print(f"RESULT {pid} loss={float(loss):.10f} "
          f"hist={int(np.asarray(hist).sum())}", flush=True)

    # --spatial_query_sharding under multi-process: height-stripe sharding
    # must route through _put_global (each process hands jax only its local
    # stripe of the identical global batch) and reproduce the local result
    from pixelpick_tpu.parallel.mesh import shard_batch_spatial

    rng = np.random.default_rng(7)
    sp = {"x": rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8)}
    sharded = shard_batch_spatial(sp, mesh)
    assert sharded["x"].sharding.spec == (None, "data"), \
        sharded["x"].sharding.spec
    params_r = shard_pytree(variables["params"], mesh)

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x.astype(jnp.float32) / 255.0)["pred"]

    chk_sp = float(jnp.abs(fwd(params_r, sharded["x"])).sum())
    chk_local = float(jnp.abs(fwd(variables["params"], sp["x"])).sum())
    ok = abs(chk_sp - chk_local) <= 1e-4 * max(abs(chk_local), 1.0)
    print(f"SPATIAL {pid} ok={ok} chk={chk_sp:.6f}", flush=True)


if __name__ == "__main__":
    main()
