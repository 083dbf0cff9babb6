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


def test_conv3x3_matmul_matches_lax_conv():
    """Conv3x3MatMul (tap-decomposed matmuls) == nn.Conv numerically, same
    param layout, incl. dilation (ASPP) and bias."""
    import flax.linen as nn
    from pixelpick_tpu.models.layers import Conv3x3MatMul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 12, 7)), jnp.float32)
    for dil, bias in ((1, False), (2, False), (1, True)):
        m = Conv3x3MatMul(features=5, dilation=dil, use_bias=bias)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = nn.Conv(5, (3, 3), padding=((dil, dil), (dil, dil)),
                      kernel_dilation=(dil, dil), use_bias=bias,
                      precision="highest")
        y = m.apply(v, x)
        y_ref = ref.apply({"params": dict(v["params"])}, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-5)


def test_conv3x3_matmul_in_deeplab_matches_xla(monkeypatch):
    """The whole DeepLab forward under set_conv3x3_impl('matmul') equals the
    lax.conv build with identical params."""
    import pixelpick_tpu.models.layers as layers
    from pixelpick_tpu.models.deeplab import DeepLab

    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3)),
                    jnp.float32)
    model = DeepLab(n_classes=5)
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    out_xla = model.apply(v, x, train=False)

    monkeypatch.setattr(layers, "_CONV3X3_IMPL", "matmul")
    model2 = DeepLab(n_classes=5)
    v2 = model2.init(jax.random.PRNGKey(0), x, train=False)
    # identical param tree (same names/shapes) regardless of the impl
    assert jax.tree.structure(v2["params"]) == jax.tree.structure(v["params"])
    out_mm = model2.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_mm["pred"]),
                               np.asarray(out_xla["pred"]), atol=2e-4)


def test_conv3x3_wgradmm_matches_lax_conv():
    """conv3x3_wgrad_mm: forward equals lax.conv, and BOTH gradients (dx, dk)
    equal the plain conv's — the custom wgrad is the same contraction as
    XLA's transposed-conv wgrad, just expressed as 9 tap einsums."""
    from pixelpick_tpu.models.layers import conv3x3_wgrad_mm, _conv3x3_same

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 9, 11, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 4)) * 0.2, jnp.float32)
    for dil in (1, 2):
        y = conv3x3_wgrad_mm(x, k, dil, "highest")
        y_ref = _conv3x3_same(x, k, dil, "highest")
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-5)

        def loss(fn, xx, kk):
            return jnp.sum(jnp.sin(fn(xx, kk, dil, "highest")))

        gx, gk = jax.grad(loss, argnums=(1, 2))(conv3x3_wgrad_mm, x, k)
        gx_r, gk_r = jax.grad(loss, argnums=(1, 2))(_conv3x3_same, x, k)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r),
                                   atol=1e-5)


def test_remat_blocks_exact():
    """remat_blocks=True changes memory scheduling only: outputs and
    gradients are identical to the plain build (same ops, same order)."""
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((2, 32, 32, 3)).astype(np.float32))
    base = MobileNetV2(output_stride=16)
    v = base.init(jax.random.PRNGKey(0), x, train=False)
    rem = MobileNetV2(output_stride=16, remat_blocks=True)
    vr = rem.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(vr["params"]) == jax.tree.structure(v["params"])

    def loss(model, params):
        h, low = model.apply({"params": params,
                              "batch_stats": v["batch_stats"]},
                             x, train=False)
        return jnp.sum(h ** 2) + jnp.sum(low ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(v["params"])
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
