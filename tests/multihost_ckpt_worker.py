"""Worker for tests/test_multihost.py::test_two_process_orbax_checkpoint —
NOT a pytest file. Saves/loads an orbax checkpoint of mesh-replicated
global arrays from both jax.distributed processes (orbax barriers all
processes in save(); the actual writes/commit run through the primary).
"""

import os
import sys


def main():
    pid, port, root = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from pixelpick_tpu.config import default_args

    default_args(write_files=False, dataset_name="cv",
                 dist_coordinator=f"localhost:{port}",
                 dist_num_processes=2, dist_process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from pixelpick_tpu.engine.checkpoint import (
        load_checkpoint, save_checkpoint, wait_for_checkpoints,
    )
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_pytree

    mesh = get_mesh(n_devices=8)
    params = shard_pytree({"w": jnp.arange(12.0).reshape(3, 4),
                           "b": jnp.full((4,), 7.0)}, mesh)
    stats = shard_pytree({"mean": jnp.ones((4,)) * 3.5}, mesh)
    path = f"{root}/best.ckpt"

    # three saves: exercises step numbering + primary-only pruning (each
    # save prunes all-but-the-newest DURABLE step before writing its own)
    save_checkpoint(path, jax.tree.map(lambda x: x - 5.0, params), stats,
                    backend="orbax")
    save_checkpoint(path, params, stats, backend="orbax")
    save_checkpoint(path, jax.tree.map(lambda x: x + 1.0, params), stats,
                    backend="orbax")
    wait_for_checkpoints()

    tmpl_p = {"w": jnp.zeros((3, 4)), "b": jnp.zeros((4,))}
    tmpl_s = {"mean": jnp.zeros((4,))}
    p2, s2 = load_checkpoint(path, tmpl_p, tmpl_s)
    np.testing.assert_allclose(np.asarray(p2["w"]),
                               np.arange(12.0).reshape(3, 4) + 1.0)
    np.testing.assert_allclose(np.asarray(p2["b"]), np.full((4,), 8.0))
    np.testing.assert_allclose(np.asarray(s2["mean"]), np.full((4,), 3.5))

    orbax_root = os.path.abspath(path) + ".orbax"
    steps = sorted(d for d in os.listdir(orbax_root) if d.startswith("step_"))
    print(f"RESULT {pid} ok steps={','.join(steps)}", flush=True)


if __name__ == "__main__":
    main()
