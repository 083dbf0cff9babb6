"""MobileNetV2 backbone for DeepLabv3+, Flax/NHWC.

Architecture parity with the reference (``networks/mobilenet_v2.py``):

- inverted-residual settings table (``:82-91``) with the output-stride
  dilation schedule of the reference's loop (``:98-113``): at os=16 the
  (6,96,3,1) and (6,160,3,2) groups run stride-1/dilation-1 (rate only
  doubles *after* the 160 group) and the final (6,320,1,1) group uses
  dilation 2 — an idiosyncrasy of the reference we reproduce exactly;
- TF-style ``fixed_padding`` applied to the *block input*, i.e. before the
  1x1 expand conv (``:60-61``). Because BN shifts the zero border, padding
  placement is numerically observable; we keep it for pretrained-weight
  fidelity;
- splits features after the 4th entry: low-level (stride 4, 24ch) /
  high-level (stride 16, 320ch) (``:125-126``);
- optional MC-dropout: a train-time Dropout2d appended to the feature stack
  (``:115-116``) and a query-time Dropout2d on the low-level features
  (``:127, 134-135``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from pixelpick_tpu.models.layers import (
    TorchBatchNorm, conv, relu6, fixed_pad, Dropout2d,
)

# (expand_ratio t, channels c, repeats n, stride s) — mobilenet_v2.py:82-91
INVERTED_RESIDUAL_SETTINGS = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


def block_plan(output_stride: int, width_mult: float = 1.0):
    """Expand the settings table into per-block (in, out, stride, dilation,
    expand_ratio), reproducing the reference's stride->dilation loop."""
    plan = []
    input_channel = int(32 * width_mult)
    current_stride = 2  # after the stem conv
    rate = 1
    for t, c, n, s in INVERTED_RESIDUAL_SETTINGS:
        if current_stride == output_stride:
            stride, dilation = 1, rate
            rate *= s
        else:
            stride, dilation = s, 1
            current_stride *= s
        out_channel = int(c * width_mult)
        for i in range(n):
            plan.append((input_channel, out_channel,
                         stride if i == 0 else 1, dilation, t))
            input_channel = out_channel
    return plan, input_channel


class InvertedResidual(nn.Module):
    """One inverted-residual block (mobilenet_v2.py:24-66)."""

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
        h = fixed_pad(x, 3, self.dilation)  # pad the whole block input (:61)
        if self.expand_ratio != 1:
            h = conv(hidden, (1, 1), dtype=self.dtype, name="expand")(h)
            h = TorchBatchNorm(self.dtype, self.bn_groups, name="expand_bn")(h, train)
            h = relu6(h)
        h = conv(hidden, (3, 3), self.stride, dilation=self.dilation,
                 groups=hidden, dtype=self.dtype, name="dw")(h)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="dw_bn")(h, train)
        h = relu6(h)
        h = conv(self.oup, (1, 1), dtype=self.dtype, name="project")(h)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="project_bn")(h, train)
        return x + h if use_res else h


class MobileNetV2(nn.Module):
    output_stride: int = 16
    width_mult: float = 1.0
    mc_dropout: bool = False
    mc_dropout_p: float = 0.2
    # the reference's turn_on_dropout (deeplab.py:33-36) re-enables only
    # nn.Dropout modules; nn.Dropout2d is NOT an nn.Dropout subclass, so
    # these two Dropout2d sites stay INACTIVE during MC-committee scoring
    # there. False (default) reproduces that; True (--mc_dropout2d_committee)
    # adds them as extra committee variance sources.
    mc_dropout2d_committee: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0
    # evaluate the first s2d_until blocks in space-to-depth layout (exact
    # rewrite, models/s2d_block.py): the 180x240/90x120 blocks with 16-96
    # channels waste most of every 128-lane VMEM tile and were measured at
    # ~3-4x over the bandwidth roofline (scripts/perf_backbone.py). 0 = off.
    s2d_until: int = 0
    # rematerialise each inverted-residual block in the backward pass
    # (jax.checkpoint per block): the backbone is HBM-bandwidth-bound
    # (~1-2% MFU measured, 68 of the 108 ms bs48 step), and the t=6 expand
    # intermediates (96-192ch at 180x240/90x120) dominate the stored-
    # activation traffic. Recomputing them from the thin block inputs
    # trades idle MXU flops for HBM bytes. Gradients are bit-identical
    # (same ops, same order). Measured by perf_probe.py variant 'remat'.
    remat_blocks: bool = False
    # run eligible stride-1 t=6 blocks through the fused Pallas kernel
    # (ops/fused_ir.py): whole ghost-BN group resident in VMEM, thin block
    # in/out as the only HBM traffic, backward recomputed in-kernel. Blocks
    # that don't fit (high-res early blocks) fall back to identical unfused
    # math inside FusedIRBlock — the variable tree is unchanged either way.
    fused_ir: bool = False

    @nn.compact
    def __call__(self, x, train: bool, mc_dropout_on: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (high_level 1/16 320ch, low_level 1/4 24ch)."""
        from pixelpick_tpu.models.s2d_block import InvertedResidualS2D
        from pixelpick_tpu.ops.s2d import from_s2d, to_s2d

        plan, _ = block_plan(self.output_stride, self.width_mult)
        # static_argnums counts self as 0; (x, train) are 1, 2
        Block = nn.checkpoint(InvertedResidual, static_argnums=(2,)) \
            if self.remat_blocks else InvertedResidual

        # stem: conv 3x3 stride 2, torch padding=1 (mobilenet_v2.py:7-12)
        h = conv(int(32 * self.width_mult), (3, 3), 2, padding=1,
                 dtype=self.dtype, name="stem")(x)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="stem_bn")(h, train)
        h = relu6(h)

        low = None
        in_s2d = False
        for i, (inp, oup, stride, dilation, t) in enumerate(plan):
            use_s2d = (i < self.s2d_until and dilation == 1
                       and (in_s2d or (h.shape[1] % 2 == 0
                                       and h.shape[2] % 2 == 0)))
            if use_s2d:
                if not in_s2d:
                    h = to_s2d(h)
                    in_s2d = True
                h = InvertedResidualS2D(
                    inp, oup, stride, t, dtype=self.dtype,
                    bn_groups=self.bn_groups, name=f"block_{i}")(h, train)
                if stride == 2:
                    in_s2d = False  # the s2 cell conv emits normal layout
            else:
                if in_s2d:
                    h = from_s2d(h)
                    in_s2d = False
                if self.fused_ir and stride == 1 and t != 1:
                    from pixelpick_tpu.models.fused_block import FusedIRBlock
                    h = FusedIRBlock(inp, oup, stride, dilation, t,
                                     dtype=self.dtype,
                                     bn_groups=self.bn_groups,
                                     name=f"block_{i}")(h, train)
                else:
                    h = Block(inp, oup, stride, dilation, t,
                              dtype=self.dtype,
                              bn_groups=self.bn_groups,
                              name=f"block_{i}")(h, train)
            if i == 2:  # features[0:4] = stem + blocks 0..2 (:125)
                low = from_s2d(h) if in_s2d else h
        if in_s2d:
            h = from_s2d(h)

        if self.mc_dropout:
            on = train or (mc_dropout_on and self.mc_dropout2d_committee)
            # train-time feature dropout appended to the stack (:115-116)
            h = Dropout2d(self.mc_dropout_p, name="feat_dropout")(h, active=on)
            # low-level-feature dropout (:127,134-135)
            low = Dropout2d(self.mc_dropout_p, name="low_dropout")(low, active=on)
        return h, low
