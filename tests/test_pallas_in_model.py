"""The Pallas depthwise kernel is a drop-in inside MobileNetV2: identical
parameter tree, identical outputs (CPU interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp

from pixelpick_tpu.models import layers
from pixelpick_tpu.models.mobilenet_v2 import MobileNetV2


def test_mobilenet_same_outputs_both_impls():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 48, 64, 3)).astype(np.float32))
    try:
        layers.set_depthwise_impl("xla")
        model_xla = MobileNetV2(output_stride=16)
        variables = model_xla.init(jax.random.PRNGKey(0), x, train=False)
        hx, lx = model_xla.apply(variables, x, train=False)

        layers.set_depthwise_impl("pallas")
        model_pl = MobileNetV2(output_stride=16)
        # identical param tree: the pallas module uses the same names/shapes
        vp = model_pl.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(vp["params"]) == \
            jax.tree_util.tree_structure(variables["params"])
        hp, lp = model_pl.apply(variables, x, train=False)
    finally:
        layers.set_depthwise_impl("xla")

    np.testing.assert_allclose(np.asarray(hp), np.asarray(hx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                               rtol=1e-4, atol=1e-4)


def test_gradients_flow_through_pallas_model():
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 32, 32, 3)).astype(np.float32))
    try:
        layers.set_depthwise_impl("pallas")
        model = MobileNetV2(output_stride=16)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            h, _l = model.apply({"params": params,
                                 "batch_stats": variables["batch_stats"]},
                                x, train=False)
            return (h ** 2).mean()

        g = jax.grad(loss)(variables["params"])
    finally:
        layers.set_depthwise_impl("xla")
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
