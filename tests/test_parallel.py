"""Multi-device sharding on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_sharded_train_step_matches_single_device():
    """Data-parallel gradient psum: one sharded step over 8 devices produces
    the same update as the unsharded step on the full batch."""
    import flax.linen as nn
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import create_train_state, make_train_step
    from pixelpick_tpu.ops.resize import resize_align_corners

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (3, 3), padding=1, name="c1")(x)
            pred = nn.Conv(4, (1, 1), name="cls")(nn.relu(h))
            return {"pred": pred, "emb": h}

    args = default_args("cv")
    model = Tiny()
    x0 = jnp.zeros((8, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x0)
    tx = make_optimizer(args, variables["params"], iters_per_epoch=5)
    step = make_train_step(model, tx, n_classes=4, mean=[0.5] * 3,
                           std=[0.25] * 3, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "x": rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8),
        "coords": rng.integers(0, 16, (8, 6, 2)).astype(np.int32),
        "labels": rng.integers(0, 4, (8, 6)).astype(np.int32),
        "valid": np.ones((8, 6), bool),
    }
    key = jax.random.PRNGKey(1)

    state = create_train_state(variables["params"], {}, tx)
    _, loss_ref, hist_ref = step(state, batch, key)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
               for k, v in batch.items()}
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    new_state, loss_sh, hist_sh = step(state_r, sharded, key)

    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hist_ref), np.asarray(hist_sh))


def test_shard_batch_helpers():
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch

    mesh = get_mesh(n_devices=8)
    assert mesh is not None and mesh.devices.size == 8
    batch = {"x": np.zeros((16, 4, 4), np.float32),
             "odd": np.zeros((3, 2), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec == ("data",)
    # non-divisible leading axis falls back to replication
    assert out["odd"].sharding.spec == ()
    assert get_mesh(n_devices=1) is None
