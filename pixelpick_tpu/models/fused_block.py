"""Flax wrapper for the fused inverted-residual Pallas kernel.

:class:`FusedIRBlock` is a drop-in for :class:`InvertedResidual`
(models/mobilenet_v2.py; reference ``networks/mobilenet_v2.py:24-66``): it
declares the *identical* variable tree (``expand/kernel``,
``expand_bn/bn/{scale,bias,mean,var}``, ``dw/kernel``, ``dw_bn/...``,
``project/kernel``, ``project_bn/...``) so checkpoints, the torch
converter and every test are implementation-agnostic — and routes the
compute through ``ops/fused_ir.py`` when eligible:

- training, stride 1, expand_ratio != 1 (t=6 blocks),
- on a TPU backend (interpret mode elsewhere, used by the CPU tests),
- ghost-BN group = the effective ``_BNCore`` group for this batch, and
- the per-group working set fits the VMEM budget (measured: only the
  23x30 64-ch-class blocks compile — Mosaic's backward liveness runs
  5-6x the logical estimate; larger blocks fall back — see PERF.md
  "Whole-subgraph fusion: measured").

Measured in the full train step the fused path is NET-NEGATIVE
(113.5 vs 108.1 ms baseline, PERF.md) — it ships as a tested opt-in
experiment, not a default.

Everything else (eval mode, remainder batches, oversized blocks, t=1)
takes an inline unfused path that reproduces ``InvertedResidual``'s math
op-for-op (same einsum 1x1s, same grouped ``lax.conv``, same
``ghost_bn_train`` / running-stat affine).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from pixelpick_tpu.models.layers import (
    fixed_pad, ghost_bn_train, he_normal_fan_in, relu6,
)
from pixelpick_tpu.ops.fused_ir import fused_ir_block, vmem_estimate_bytes

# Per-program VMEM budget (on the vmem_estimate_bytes scale) gating which
# blocks take the fused kernel. Calibrated against measured Mosaic
# compiles on v5e: the kernel raises Mosaic's scoped-vmem limit to 100 MB
# of the 128 MB physical VMEM (ops/fused_ir.py:_VMEM_LIMIT — the default
# limit is ~16 MB and rejects every real shape), and Mosaic's actual
# backward-kernel liveness measures 5-6x the logical estimate (96ch:
# 23.2 MB estimated -> 121.6 MB actual, scoped-vmem OOM; 64ch: 15.7 MB
# estimated, compiles). 16 MB on the estimate scale therefore admits
# exactly the block class proven to compile. Env-overridable for probing.
import os as _os

FUSED_VMEM_BUDGET = int(_os.environ.get("PIXELPICK_FUSED_VMEM_BUDGET",
                                        16 * 1024 * 1024))


class _ConvKernel(nn.Module):
    """Parameter container matching ``nn.Conv``/``Conv1x1`` layout."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", he_normal_fan_in, self.shape,
                          jnp.float32)


class _BNVars(nn.Module):
    """Parameter/stat container matching ``_BNCore`` (name 'bn')."""

    c: int

    @nn.compact
    def __call__(self):
        core = _BNLeaf(self.c, name="bn")
        return core()


class _BNLeaf(nn.Module):
    c: int

    @nn.compact
    def __call__(self):
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,),
                          jnp.float32)
        return scale, bias, mean, var


class FusedIRBlock(nn.Module):
    """Inverted-residual block, fused-kernel when eligible (see module
    docstring). Attribute surface mirrors :class:`InvertedResidual`."""

    inp: int
    oup: int
    stride: int
    dilation: int
    expand_ratio: int
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        hidden = int(round(self.inp * self.expand_ratio))
        use_res = self.stride == 1 and self.inp == self.oup
        if self.expand_ratio != 1:
            we = _ConvKernel((1, 1, self.inp, hidden), name="expand")()
            g1, b1, m1, v1 = _BNVars(hidden, name="expand_bn")()
        else:  # t=1 blocks have no expand stage (InvertedResidual parity)
            we = g1 = b1 = m1 = v1 = None
        wd = _ConvKernel((3, 3, 1, hidden), name="dw")()
        g2, b2, m2, v2 = _BNVars(hidden, name="dw_bn")()
        wp = _ConvKernel((1, 1, hidden, self.oup), name="project")()
        g3, b3, m3, v3 = _BNVars(self.oup, name="project_bn")()

        b = x.shape[0]
        group = self.bn_groups \
            if 0 < self.bn_groups < b and b % self.bn_groups == 0 else b
        est = vmem_estimate_bytes(group, x.shape[1], x.shape[2], self.inp,
                                  hidden, self.oup, self.dilation,
                                  jnp.dtype(self.dtype).itemsize)
        eligible = (train and self.stride == 1 and self.expand_ratio != 1
                    and est <= FUSED_VMEM_BUDGET
                    and not self.is_initializing())
        if eligible:
            interpret = jax.default_backend() != "tpu"
            y, stats = fused_ir_block(
                x, we[0, 0].astype(self.dtype),
                wd[:, :, 0, :].astype(self.dtype),
                wp[0, 0].astype(self.dtype),
                g1, b1, g2, b2, g3, b3,
                group, self.dilation, use_res, interpret)
            mu1, var1, mu2, var2, mu3, var3 = stats
            for ref_m, ref_v, mu, var in ((m1, v1, mu1, var1),
                                          (m2, v2, mu2, var2),
                                          (m3, v3, mu3, var3)):
                self._ema(ref_m, ref_v, mu, var)
            return y
        return self._unfused(x, train, use_res, we, wd, wp,
                             (g1, b1, m1, v1), (g2, b2, m2, v2),
                             (g3, b3, m3, v3))

    @staticmethod
    def _ema(ref_m, ref_v, mu, var, momentum: float = 0.9):
        # identical to _BNCore's running-stat update (models/layers.py)
        ref_m.value = momentum * ref_m.value \
            + (1 - momentum) * lax.stop_gradient(mu.mean(0))
        ref_v.value = momentum * ref_v.value \
            + (1 - momentum) * lax.stop_gradient(var.mean(0))

    # --- unfused path: op-for-op InvertedResidual / _BNCore -------------

    def _bn(self, h, train: bool, scale, bias, ref_m, ref_v,
            eps: float = 1e-5):
        if not train:
            mul = lax.rsqrt(ref_v.value + eps) * scale
            return jnp.asarray((h - ref_m.value) * mul + bias, self.dtype)
        y, mu, var = ghost_bn_train(h, scale, bias, self.bn_groups, eps,
                                    self.dtype)
        if not self.is_initializing():
            self._ema(ref_m, ref_v, mu, var)
        return y

    def _conv1x1(self, h, kernel):
        # Conv1x1's einsum form (models/layers.py — the axon XLA-TPU
        # stride-2-consumer bug workaround); identical precision choices.
        precision = "highest" if self.dtype == jnp.float32 else None
        return jnp.einsum("bhwc,co->bhwo", h.astype(self.dtype),
                          kernel[0, 0].astype(self.dtype),
                          precision=precision)

    def _unfused(self, x, train, use_res, we, wd, wp, bn1, bn2, bn3):
        precision = "highest" if self.dtype == jnp.float32 else None
        h = fixed_pad(x, 3, self.dilation)
        if self.expand_ratio != 1:
            h = self._conv1x1(h, we)
            h = self._bn(h, train, *bn1)
            h = relu6(h)
        ch = h.shape[-1]
        h = lax.conv_general_dilated(
            h.astype(self.dtype), wd.astype(self.dtype),
            (self.stride, self.stride), ((0, 0), (0, 0)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch, precision=precision)
        h = self._bn(h, train, *bn2)
        h = relu6(h)
        h = self._conv1x1(h, wp)
        h = self._bn(h, train, *bn3)
        return x + h if use_res else h
