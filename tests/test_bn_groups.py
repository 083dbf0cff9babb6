"""Ghost/grouped BatchNorm (--bn_group_size): reference-bs4 BN statistics
at any larger batch (SURVEY.md §7 hard-part 4; reference trains bs=4 on one
device, model.py:21 + args.py:109)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelpick_tpu.models.layers import TorchBatchNorm, _BNCore


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .normal(1.5, 2.0, shape).astype(np.float32))


def test_bncore_matches_flax_batchnorm_exactly():
    """groups=0 must be bit-identical to flax nn.BatchNorm (train + eval +
    running stats) so that round-1 checkpoints and parity results carry."""
    x = _rand((8, 5, 6, 7))
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32, param_dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)
    y_ref, m_ref = ref.apply(v, x, mutable=["batch_stats"])

    mine = _BNCore(dtype=jnp.float32, groups=0)
    v2 = mine.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    y_my, m_my = mine.apply(v2, x, False, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_my))
    np.testing.assert_array_equal(np.asarray(m_ref["batch_stats"]["mean"]),
                                  np.asarray(m_my["batch_stats"]["mean"]))
    np.testing.assert_array_equal(np.asarray(m_ref["batch_stats"]["var"]),
                                  np.asarray(m_my["batch_stats"]["var"]))

    ref_e = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)
    y_re = ref_e.apply({"params": v["params"],
                        "batch_stats": m_ref["batch_stats"]}, x)
    y_me = mine.apply({"params": v2["params"],
                       "batch_stats": m_ref["batch_stats"]}, x, True)
    np.testing.assert_array_equal(np.asarray(y_re), np.asarray(y_me))


def test_grouped_bn_equals_stacked_small_batches():
    """groups=4 on a batch of 8 == two independent bs-4 BatchNorms, and the
    running stats take the mean of the per-group moments."""
    x = _rand((8, 5, 6, 7), seed=1)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5,
                       dtype=jnp.float32, param_dtype=jnp.float32)
    v = ref.init(jax.random.PRNGKey(0), x)
    g = _BNCore(dtype=jnp.float32, groups=4)
    vg = g.init(jax.random.PRNGKey(0), x, False)

    y_g, m_g = g.apply(vg, x, False, mutable=["batch_stats"])
    y_a, m_a = ref.apply(v, x[:4], mutable=["batch_stats"])
    y_b, m_b = ref.apply(v, x[4:], mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_g),
                                  np.asarray(jnp.concatenate([y_a, y_b])))
    # flax update: ra = 0.9*0 + 0.1*moment; grouped: 0.1*mean(moments)
    exp = (np.asarray(m_a["batch_stats"]["mean"])
           + np.asarray(m_b["batch_stats"]["mean"])) / 2
    np.testing.assert_allclose(np.asarray(m_g["batch_stats"]["mean"]), exp,
                               rtol=1e-6)


def test_grouped_bn_is_mesh_independent():
    """The grouping depends only on batch content: with G = per-device batch
    it is exactly local-replica BN, so a sharded and an unsharded apply give
    identical outputs."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    x = _rand((8, 4, 4, 3), seed=2)
    g = _BNCore(dtype=jnp.float32, groups=1)  # per-sample = per-virtual-chip
    vg = g.init(jax.random.PRNGKey(0), x, False)
    apply = jax.jit(lambda v, x: g.apply(v, x, False,
                                         mutable=["batch_stats"]))
    y0, _ = apply(vg, x)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(vg, NamedSharding(mesh, P()))
    y1, _ = apply(vs, xs)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_remainder_batch_falls_back_to_whole_batch():
    x = _rand((6, 3, 3, 5), seed=3)
    g = _BNCore(dtype=jnp.float32, groups=4)
    vg = g.init(jax.random.PRNGKey(0), x, False)
    w = _BNCore(dtype=jnp.float32, groups=0)
    y_g, _ = g.apply(vg, x, False, mutable=["batch_stats"])
    y_w, _ = w.apply(vg, x, False, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_g), np.asarray(y_w))


def test_model_level_bn_groups_changes_train_stats_only():
    """A DeepLab built with bn_group_size=2 must (a) produce the same
    variable tree (checkpoint compatible), (b) differ from global-BN only
    through the statistics (train mode), (c) be identical in eval mode."""
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.models import get_model, init_model

    hw = (48, 64)
    a0 = default_args("cv", write_files=False)
    a2 = default_args("cv", write_files=False, bn_group_size=2)
    m0, m2 = get_model(a0), get_model(a2)
    p0, s0 = init_model(m0, jax.random.PRNGKey(0), hw)
    p2, s2 = init_model(m2, jax.random.PRNGKey(0), hw)
    assert jax.tree_util.tree_structure((p0, s0)) \
        == jax.tree_util.tree_structure((p2, s2))
    chex = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), p0, p2)
    del chex

    x = jnp.asarray(np.random.default_rng(0)
                    .integers(0, 255, (4, *hw, 3)).astype(np.float32) / 255.0)
    # eval mode: identical (running stats path has no grouping)
    y0 = m0.apply({"params": p0, "batch_stats": s0}, x, train=False)
    y2 = m2.apply({"params": p0, "batch_stats": s0}, x, train=False)
    np.testing.assert_array_equal(np.asarray(y0["pred"]),
                                  np.asarray(y2["pred"]))
    # train mode: grouped stats change the normalisation
    rng = {"dropout": jax.random.PRNGKey(1)}
    t0, _ = m0.apply({"params": p0, "batch_stats": s0}, x, train=True,
                     rngs=rng, mutable=["batch_stats"])
    t2, _ = m2.apply({"params": p0, "batch_stats": s0}, x, train=True,
                     rngs=rng, mutable=["batch_stats"])
    assert float(jnp.abs(t0["pred"] - t2["pred"]).max()) > 1e-6
