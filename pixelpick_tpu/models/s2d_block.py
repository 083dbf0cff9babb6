"""Inverted-residual block evaluated in space-to-depth (s2d) layout — exact.

See ``ops/s2d.py`` for the math and the why (the early MobileNetV2 blocks
run 16-96 channels at 180x240 and waste most of every 128-lane VMEM tile;
s2d(2) packs 2x2 spatial cells into channels so the same bytes move at
full lane utilisation, at the ORIGINAL FLOP count).

``InvertedResidualS2D`` consumes a phase-major s2d tensor
(B, H/2, W/2, 4*inp) and reproduces the reference block
(``mobilenet_v2.py:24-66``) EXACTLY, including the
fixed_padding-before-the-block idiosyncrasy:

- expand/project 1x1 convs -> phase-batched matmuls (original FLOPs);
- the expand BN computes its moments with the PADDED pixel count (the
  reference normalises over the padded map whose rim the 1x1 conv zeroes);
- the depthwise taps that read the rim's relu6(BN(0)) values are restored
  with the rho * border_weight_map rank-1 correction;
- stride 1 emits s2d layout; stride 2 emits the NORMAL layout (the s2
  output grid is the cell grid), where the tail (dw_bn, project) runs
  through the standard modules.

Parameter/batch-stats tree is IDENTICAL to ``InvertedResidual`` (same
names, shapes, initialisers), so checkpoints and the torch converter are
layout-agnostic.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pixelpick_tpu.models.layers import (
    TorchBatchNorm, conv, he_normal_fan_in, relu6,
)
from pixelpick_tpu.ops.s2d import (
    border_weight_map, conv_s2d_1x1, conv_s2d_dw, rep_phase, to_s2d,
)


class _ConvParam(nn.Module):
    """Parameter holder matching nn.Conv/Conv1x1 kernel layout."""

    shape: Tuple[int, ...]
    kernel_init: nn.initializers.Initializer = he_normal_fan_in

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.kernel_init, self.shape, jnp.float32)


class _S2DBNCore(nn.Module):
    """Phase-grouped BatchNorm core on phase-major s2d tensors.

    Variable layout identical to layers._BNCore (scale/bias params,
    mean/var batch_stats, one entry per ORIGINAL channel); moments reduce
    over (batch-group, H, W, phase) — the same value set as the standard
    path, so statistics match up to f32 reduction order. ``count_override``
    divides the sums by a per-sample pixel count LARGER than the grid
    (reference: BN over the padded map whose rim contributes zeros).
    Returns (y, bn_zero) where bn_zero (ng, C) is the normalisation of an
    exact zero — the rim value the depthwise correction needs.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    groups: int = 0
    count_override: Optional[int] = None

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c4 = x.shape[-1]
        c = c4 // 4
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_running_average:
            mul = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (x - rep_phase(ra_mean.value)) * rep_phase(mul) \
                + rep_phase(bias)
            bn_zero = (-ra_mean.value) * mul + bias
            return jnp.asarray(y, self.dtype), bn_zero[None, :]

        b, h, w, _ = x.shape
        g = self.groups if 0 < self.groups < b and b % self.groups == 0 else b
        ng = b // g
        xf = x.astype(jnp.float32).reshape(ng, g, h, w, 4, c)
        n = g * h * w * 4 if self.count_override is None \
            else g * self.count_override
        s1 = xf.sum(axis=(1, 2, 3, 4))
        s2 = (xf * xf).sum(axis=(1, 2, 3, 4))
        mu = s1 / n                                         # (ng, c)
        var = jnp.maximum(0.0, s2 / n - mu * mu)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value \
                + (1 - self.momentum) * mu.mean(0)
            ra_var.value = self.momentum * ra_var.value \
                + (1 - self.momentum) * var.mean(0)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale     # (ng, c)
        y = (xf - mu[:, None, None, None, None, :]) \
            * mul[:, None, None, None, None, :] \
            + bias[None, None, None, None, None, :]
        bn_zero = (-mu) * mul + bias                        # (ng, c)
        return jnp.asarray(y.reshape(x.shape), self.dtype), bn_zero


class S2DBatchNorm(nn.Module):
    """TorchBatchNorm twin for s2d tensors (same variable paths)."""

    dtype: jnp.dtype = jnp.float32
    groups: int = 0
    count_override: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return _S2DBNCore(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          groups=self.groups,
                          count_override=self.count_override,
                          name="bn")(x, not train)


class InvertedResidualS2D(nn.Module):
    """One inverted-residual block in s2d layout (exact rewrite).

    Input (B, h2, w2, 4*inp) phase-major; output s2d (stride 1) or normal
    layout (stride 2). dilation must be 1 (the early blocks' case).
    """

    inp: int
    oup: int
    stride: int
    expand_ratio: int
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x_s2d, train: bool):
        hidden = int(round(self.inp * self.expand_ratio))
        use_res = self.stride == 1 and self.inp == self.oup
        b, h2, w2, _ = x_s2d.shape
        ho, wo = 2 * h2, 2 * w2            # original block-input extent
        pad_count = (ho + 2) * (wo + 2)    # fixed_padding'ed map pixels
        precision = "highest" if self.dtype == jnp.float32 else None

        def mm(z, w1x1):
            return conv_s2d_1x1(z, w1x1.astype(self.dtype),
                                precision=precision)

        if self.expand_ratio != 1:
            we = _ConvParam((1, 1, self.inp, hidden), name="expand")()
            h = mm(x_s2d.astype(self.dtype), we[0, 0])
            # reference BN sees the padded map (rim = conv of zeros = 0):
            # same sums, padded count
            h, bn_zero = S2DBatchNorm(self.dtype, self.bn_groups,
                                      count_override=pad_count,
                                      name="expand_bn")(h, train)
            h = relu6(h)
            rho = relu6(bn_zero)           # (ng, hidden) rim value
        else:
            h = x_s2d.astype(self.dtype)
            rho = None                     # rim is a literal zero

        wd = _ConvParam((3, 3, 1, hidden), name="dw")()
        wdw = wd[:, :, 0, :].astype(self.dtype)
        y = conv_s2d_dw(h, wdw, self.stride)
        if rho is not None:
            m = border_weight_map(wdw, (ho, wo), self.stride)
            m = to_s2d(m) if self.stride == 1 else m
            ng = rho.shape[0]
            rho_b = jnp.repeat(rho.astype(self.dtype), b // ng, axis=0)
            if self.stride == 1:
                rho_b = rep_phase(rho_b)  # phase-major channels
            y = y + rho_b[:, None, None, :] * m

        if self.stride == 1:
            y, _ = S2DBatchNorm(self.dtype, self.bn_groups,
                                name="dw_bn")(y, train)
            y = relu6(y)
            wp = _ConvParam((1, 1, hidden, self.oup), name="project")()
            y = mm(y, wp[0, 0])
            y, _ = S2DBatchNorm(self.dtype, self.bn_groups,
                                name="project_bn")(y, train)
            return x_s2d + y if use_res else y

        # stride 2: normal layout from here on — standard modules
        y = TorchBatchNorm(self.dtype, self.bn_groups, name="dw_bn")(y, train)
        y = relu6(y)
        y = conv(self.oup, (1, 1), dtype=self.dtype, name="project")(y)
        y = TorchBatchNorm(self.dtype, self.bn_groups,
                           name="project_bn")(y, train)
        return y
