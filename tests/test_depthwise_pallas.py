"""Pallas depthwise conv: forward (interpret mode) and custom-VJP gradients
against the XLA grouped-conv reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixelpick_tpu.ops.depthwise import depthwise_conv3x3, depthwise_reference


@pytest.mark.parametrize("stride,dilation,hw,ch", [
    (1, 1, (12, 16), 8),
    (2, 1, (12, 16), 8),
    (1, 2, (14, 18), 16),
    (2, 1, (18, 24), 32),
])
def test_forward_matches_xla(stride, dilation, hw, ch):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, *hw, ch)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ch)).astype(np.float32))
    pad = dilation
    got = depthwise_conv3x3(x, w, stride, dilation, pad, True)  # interpret
    ref = depthwise_reference(x, w, stride, dilation, pad)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_custom_vjp_matches_xla_grads(stride, dilation):
    rng = np.random.default_rng(1)
    hw, ch = (12, 16), 8
    x = jnp.asarray(rng.standard_normal((2, *hw, ch)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, ch)).astype(np.float32))
    pad = dilation

    def loss_pallas(x, w):
        return (depthwise_conv3x3(x, w, stride, dilation, pad, True) ** 2).sum()

    def loss_ref(x, w):
        return (depthwise_reference(x, w, stride, dilation, pad) ** 2).sum()

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_uneven_rows_tile_divisor():
    """h_out not a power of two: the tile picker must find a divisor."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 23, 30, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 8)).astype(np.float32))
    got = depthwise_conv3x3(x, w, 1, 2, 2, True)
    ref = depthwise_reference(x, w, 1, 2, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vmem_overflow_falls_back_to_xla(monkeypatch):
    """If even a one-row tile exceeds the VMEM budget, the op must fall back
    to lax.conv instead of compiling an oversized Mosaic scratch."""
    import pixelpick_tpu.ops.depthwise as dw

    monkeypatch.setattr(dw, "VMEM_BUDGET", 1024)  # force overflow
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 8, 16, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4)).astype(np.float32)
    y = dw.depthwise_conv3x3(jnp.asarray(x), jnp.asarray(w), 1, 1, 1,
                             interpret=True)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w).reshape(3, 3, 1, 4), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
