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


def _tiny_seg_model(n_classes=4):
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (3, 3), padding=1, name="c1")(x)
            pred = nn.Conv(n_classes, (1, 1), name="cls")(nn.relu(h))
            return {"pred": pred, "emb": h}

    return Tiny()


def test_sharded_pool_sweep_matches_single_device():
    """P2 (SURVEY §2.2): the batched acquisition kernel over a mesh-sharded
    pool batch picks the SAME pixels as the unsharded run — the pool sweep
    is embarrassingly parallel and sharding must not change acquisitions."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from pixelpick_tpu.active.acquisition import make_score_fn
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch

    model = _tiny_seg_model()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (16, 16, 24, 3), dtype=np.uint8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 24, 3)))
    batch = {
        "x": x,
        "y": rng.integers(0, 4, (16, 16, 24)).astype(np.int32),
        "excluded": rng.random((16, 16, 24)) < 0.1,
    }
    score_fn = make_score_fn(model, strategy="margin_sampling", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=6,
                             top_n_percent=0.05, reverse_order=False,
                             ignore_index=11)
    key = jax.random.PRNGKey(3)
    idx_1, stats_1 = score_fn(variables["params"], {}, batch, key)

    mesh = get_mesh(n_devices=8)
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == ("data",)
    idx_8, stats_8 = score_fn(variables["params"], {}, sharded, key)

    np.testing.assert_array_equal(np.asarray(idx_1), np.asarray(idx_8))
    np.testing.assert_allclose(np.asarray(stats_1["entropy"]),
                               np.asarray(stats_8["entropy"]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(stats_1["labels"]),
                                  np.asarray(stats_8["labels"]))


def test_sharded_bucketed_sweep_matches_single_device():
    """Same pick-for-pick guarantee on the bucketed (variable-size) path:
    per-image true sizes ride along and padding stays unpickable."""
    from pixelpick_tpu.active.acquisition import make_score_fn
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch

    model = _tiny_seg_model()
    rng = np.random.default_rng(1)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 24, 3)))
    hw = np.tile(np.array([[12, 20]], np.int32), (8, 1))
    batch = {
        "x": rng.integers(0, 255, (8, 16, 24, 3), dtype=np.uint8),
        "y": rng.integers(0, 4, (8, 16, 24)).astype(np.int32),
        "excluded": np.zeros((8, 16, 24), bool),
        "hw": hw,
    }
    batch["excluded"][:, 12:, :] = True
    batch["excluded"][:, :, 20:] = True
    score_fn = make_score_fn(model, strategy="entropy", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=5,
                             top_n_percent=0.1, reverse_order=False,
                             ignore_index=11)
    key = jax.random.PRNGKey(9)
    idx_1, _ = score_fn(variables["params"], {}, batch, key)
    idx_8, _ = score_fn(variables["params"], {},
                        shard_batch(batch, get_mesh(n_devices=8)), key)
    np.testing.assert_array_equal(np.asarray(idx_1), np.asarray(idx_8))
    # no pick lands in the pad region
    ys, xs = np.asarray(idx_1) // 24, np.asarray(idx_1) % 24
    assert (ys < 12).all() and (xs < 20).all()


def test_sharded_eval_step_matches_single_device():
    """Validation sharded over the mesh: identical confusion matrix."""
    from pixelpick_tpu.engine.trainer import make_eval_step
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch

    model = _tiny_seg_model()
    rng = np.random.default_rng(2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 24, 3)))
    batch = {
        "x": rng.integers(0, 255, (8, 16, 24, 3), dtype=np.uint8),
        "y": rng.integers(0, 4, (8, 16, 24)).astype(np.int32),
    }
    eval_fn = make_eval_step(model, n_classes=4, mean=[0.5] * 3,
                             std=[0.25] * 3)
    hist_1, _, _ = eval_fn(variables["params"], {}, batch)
    hist_8, _, _ = eval_fn(variables["params"], {},
                           shard_batch(batch, get_mesh(n_devices=8)))
    np.testing.assert_array_equal(np.asarray(hist_1), np.asarray(hist_8))


def test_device_pipeline_emits_mesh_sharded_batches(tmp_path):
    """--device_augment composes with data parallelism: the staged pipeline
    emits batches sharded over the ('data',) mesh with identical content."""
    from tests.helpers import synthetic_args
    from pixelpick_tpu.data import get_dataset
    from pixelpick_tpu.data.device_pipeline import DevicePipeline
    from pixelpick_tpu.parallel.mesh import get_mesh

    args = synthetic_args(tmp_path, n_pixels_by_us=4, batch_size=8)
    ds = get_dataset(args, val=False, query=False)
    ds.crop_size = (48, 64)

    pipe_plain = DevicePipeline(ds, args)
    pipe_plain.set_queries(ds.queries)
    pipe_mesh = DevicePipeline(ds, args, mesh=get_mesh(n_devices=8))
    pipe_mesh.set_queries(ds.queries)

    idxs = np.arange(8)
    key = jax.random.PRNGKey(5)
    b0 = pipe_plain.sample_batch(idxs, key)
    b1 = pipe_mesh.sample_batch(idxs, key)
    assert b1["x"].sharding.spec == ("data",)
    np.testing.assert_allclose(np.asarray(b0["x"]), np.asarray(b1["x"]),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(b0["coords"]),
                                  np.asarray(b1["coords"]))
    np.testing.assert_array_equal(np.asarray(b0["valid"]),
                                  np.asarray(b1["valid"]))

    # a non-divisible remainder batch pads to a device multiple with
    # valid=False duplicate rows and KEEPS the sharded spec (round-4 weak
    # #5: it used to fall back to an unsharded program)
    b2 = pipe_mesh.sample_batch(np.arange(6), jax.random.PRNGKey(6))
    assert b2.pop("n_real") == 6
    assert np.asarray(b2["x"]).shape[0] == 8
    assert b2["x"].sharding.spec == ("data",)
    valid2 = np.asarray(b2["valid"])
    assert not valid2[6:].any()  # pad rows are loss/metric-inert
    # the real rows' content matches the unpadded plain-pipeline batch
    b3 = pipe_plain.sample_batch(np.arange(6), jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.asarray(b2["x"])[:6], np.asarray(b3["x"]),
                               atol=1e-5)
    np.testing.assert_array_equal(valid2[:6], np.asarray(b3["valid"]))


def test_pad_batch_to_devices_unit():
    from pixelpick_tpu.parallel.mesh import get_mesh, pad_batch_to_devices

    mesh = get_mesh(n_devices=8)
    batch = {"x": np.arange(11 * 4).reshape(11, 4).astype(np.float32),
             "valid": np.ones((11, 3), bool),
             "y": np.zeros((11, 2), np.int64),
             "excluded": np.zeros((11, 2), bool),
             "index": np.arange(11, dtype=np.int32)}
    out, n_real = pad_batch_to_devices(batch, mesh, pad_label=255)
    assert n_real == 11 and out["x"].shape[0] == 16
    np.testing.assert_array_equal(out["x"][:11], batch["x"])
    np.testing.assert_array_equal(out["x"][11:], np.tile(batch["x"][-1:],
                                                         (5, 1)))
    assert not out["valid"][11:].any() and out["valid"][:11].all()
    assert (out["y"][11:] == 255).all() and (out["y"][:11] == 0).all()
    assert out["excluded"][11:].all() and not out["excluded"][:11].any()
    assert (out["index"][11:] == -1).all()
    # already-divisible batches pass through untouched
    same, n = pad_batch_to_devices({"x": np.zeros((16, 2))}, mesh)
    assert n == 16 and same["x"].shape[0] == 16
    # no mesh, no target: identity
    same2, n2 = pad_batch_to_devices(batch, None)
    assert n2 == 11 and same2 is batch
    # target_rows pads to the exact requested size (compile dedupe)
    out3, n3 = pad_batch_to_devices({"x": np.zeros((3, 2))}, None,
                                    target_rows=8)
    assert n3 == 3 and out3["x"].shape[0] == 8


def test_remainder_train_batch_shards_with_identical_loss():
    """Round-4 weak #5 closure: a remainder train batch padded with
    valid=False rows keeps the P('data') spec and produces the exact
    same loss and confusion matrix as the unpadded (replicated) step."""
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import create_train_state, make_train_step
    from pixelpick_tpu.parallel.mesh import (
        get_mesh, pad_batch_to_devices, shard_batch,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    args = default_args("cv")
    model = _tiny_seg_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    tx = make_optimizer(args, variables["params"], iters_per_epoch=5)
    step = make_train_step(model, tx, n_classes=4, mean=[0.5] * 3,
                           std=[0.25] * 3, donate=False)

    rng = np.random.default_rng(7)
    batch = {
        "x": rng.integers(0, 255, (11, 16, 16, 3), dtype=np.uint8),
        "coords": rng.integers(0, 16, (11, 6, 2)).astype(np.int32),
        "labels": rng.integers(0, 4, (11, 6)).astype(np.int32),
        "valid": np.ones((11, 6), bool),
    }
    key = jax.random.PRNGKey(2)
    state = create_train_state(variables["params"], {}, tx)
    _, loss_ref, hist_ref = step(state, batch, key)

    mesh = get_mesh(n_devices=8)
    padded, n_real = pad_batch_to_devices(batch, mesh)
    assert n_real == 11 and padded["x"].shape[0] == 16
    sharded = shard_batch(padded, mesh)
    assert sharded["x"].sharding.spec == ("data",)  # no P() fallback
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    _, loss_sh, hist_sh = step(state_r, sharded, key)

    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hist_ref), np.asarray(hist_sh))


def test_megabatch_scan_under_sharded_batch_matches_unsharded():
    """--micro_batch_size under a data-parallel mesh: the scan reshapes a
    P('data')-sharded megabatch into microbatches — GSPMD must preserve
    the exact same update sequence (collectives inserted as needed). The
    combination is degenerate for parallelism (each bs-4 update spans the
    whole mesh) and the driver warns, but it must stay CORRECT."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import (
        create_train_state, make_microbatch_train_step,
    )
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch

    args = default_args("cv")
    model = _tiny_seg_model()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    tx = make_optimizer(args, variables["params"], iters_per_epoch=4)
    mega = make_microbatch_train_step(model, tx, micro_bs=4, n_classes=4,
                                      mean=[0.5] * 3, std=[0.25] * 3,
                                      donate=False)
    rng = np.random.default_rng(9)
    batch = {
        "x": rng.integers(0, 255, (16, 16, 16, 3), dtype=np.uint8),
        "coords": rng.integers(0, 16, (16, 6, 2)).astype(np.int32),
        "labels": rng.integers(0, 4, (16, 6)).astype(np.int32),
        "valid": np.ones((16, 6), bool),
    }
    key = jax.random.PRNGKey(4)
    state = create_train_state(variables["params"], {}, tx)
    _, losses_1, hist_1 = mega(state, batch, key)

    mesh = get_mesh(n_devices=8)
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.spec == ("data",)
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    _, losses_8, hist_8 = mega(state_r, sharded, key)
    np.testing.assert_allclose(np.asarray(losses_8), np.asarray(losses_1),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(hist_8), np.asarray(hist_1))


def test_remainder_val_batch_shards_with_identical_hist():
    """Same closure for validation: remainder val batches pad with
    ignore-labelled duplicate rows — identical confusion matrix, sharded."""
    from pixelpick_tpu.engine.trainer import make_eval_step
    from pixelpick_tpu.parallel.mesh import (
        get_mesh, pad_batch_to_devices, shard_batch,
    )

    model = _tiny_seg_model()
    rng = np.random.default_rng(8)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 24, 3)))
    batch = {
        "x": rng.integers(0, 255, (5, 16, 24, 3), dtype=np.uint8),
        "y": rng.integers(0, 4, (5, 16, 24)).astype(np.int32),
    }
    eval_fn = make_eval_step(model, n_classes=4, mean=[0.5] * 3,
                             std=[0.25] * 3)
    hist_ref, _, _ = eval_fn(variables["params"], {}, batch)

    mesh = get_mesh(n_devices=8)
    padded, n_real = pad_batch_to_devices(batch, mesh, pad_label=11,
                                          target_rows=8)
    sharded = shard_batch(padded, mesh)
    assert sharded["x"].sharding.spec == ("data",)
    hist_sh, _, _ = eval_fn(variables["params"], {}, sharded)
    np.testing.assert_array_equal(np.asarray(hist_ref), np.asarray(hist_sh))


def test_spatially_sharded_sweep_matches_single_device():
    """--spatial_query_sharding (SURVEY §2.2's optional extra): the sweep
    sharded by HEIGHT stripes — model parallelism over the image — picks
    the same pixels. The stride-2 model forces GSPMD to insert conv halo
    exchanges AND run the align-corners upsample over a sharded H axis."""
    import flax.linen as nn
    from pixelpick_tpu.active.acquisition import make_score_fn
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch_spatial

    class TinyS2(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (3, 3), strides=2, padding=1, name="c1")(x)
            h = nn.relu(nn.Conv(8, (3, 3), padding=1, name="c2")(h))
            pred = nn.Conv(4, (1, 1), name="cls")(h)  # half-res: score
            return {"pred": pred, "emb": h}           # path upsamples

    model = TinyS2()
    rng = np.random.default_rng(4)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 24, 3)))
    batch = {
        "x": rng.integers(0, 255, (4, 32, 24, 3), dtype=np.uint8),
        "y": rng.integers(0, 4, (4, 32, 24)).astype(np.int32),
        "excluded": rng.random((4, 32, 24)) < 0.1,
    }
    score_fn = make_score_fn(model, strategy="margin_sampling", n_classes=4,
                             mean=[0.5] * 3, std=[0.25] * 3, n_pixels=6,
                             top_n_percent=0.05, reverse_order=False,
                             ignore_index=11)
    key = jax.random.PRNGKey(11)
    idx_1, stats_1 = score_fn(variables["params"], {}, batch, key)

    mesh = get_mesh(n_devices=8)
    sharded = shard_batch_spatial(batch, mesh)
    assert sharded["x"].sharding.spec == (None, "data")
    assert sharded["excluded"].sharding.spec == (None, "data")
    idx_8, stats_8 = score_fn(variables["params"], {}, sharded, key)

    np.testing.assert_array_equal(np.asarray(idx_1), np.asarray(idx_8))
    np.testing.assert_allclose(np.asarray(stats_1["entropy"]),
                               np.asarray(stats_8["entropy"]), rtol=1e-5)


def test_shard_batch_spatial_fallbacks():
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch_spatial

    mesh = get_mesh(n_devices=8)
    batch = {"x": np.zeros((2, 16, 8, 3), np.float32),   # H=16 divides 8
             "hw": np.zeros((2, 2), np.int32),           # 2-D: replicate
             "odd": np.zeros((2, 12, 8), np.float32)}    # H=12: replicate
    out = shard_batch_spatial(batch, mesh)
    assert out["x"].sharding.spec == (None, "data")
    assert out["hw"].sharding.spec == ()
    assert out["odd"].sharding.spec == ()
    assert shard_batch_spatial(batch, None) is batch
