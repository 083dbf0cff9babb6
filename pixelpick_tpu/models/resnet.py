"""ResNet backbones (18/34/50/101) with the dilated-stride variant, Flax/NHWC.

Parity with the reference stack:

- classic torchvision-style ResNet v1 (``networks/backbones/resnet_models.py``):
  7x7/s2 prefix (or deep-base 3x 3x3), maxpool 3x3/s2, BasicBlock for 18/34,
  Bottleneck (stride on the 3x3) for 50/101;
- the dilated transform (``resnet_backbone.py:42-85 _nostride_dilate``):
  at dilate_scale=8, layer3 runs stride-1 with dilation 2 and layer4
  stride-1 with dilation 4 (first block's 3x3 gets dilation d/2 where the
  stride was removed). The reference's FPN encoder uses multi_grid=None
  (``encoder.py:28``), reproduced here;
- returns the four stage features [c2, c3, c4, c5]
  (``resnet_backbone.py:90-104``), at strides 4/8/8/8 when dilated.

The reference's ``width_multiplier`` plumbing is internally inconsistent for
w != 1 (``resnet_models.py:139-146`` scales the downsample BN but not the
conv); here all widths scale uniformly.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from pixelpick_tpu.models.layers import TorchBatchNorm, conv, he_normal_fan_out

LAYER_SPECS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        h = conv(self.planes, (3, 3), self.stride, padding=self.first_dilation,
                 dilation=self.first_dilation, dtype=self.dtype,
                 kernel_init=he_normal_fan_out, name="conv1")(x)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn1")(h, train)
        h = nn.relu(h)
        h = conv(self.planes, (3, 3), padding=self.dilation,
                 dilation=self.dilation, dtype=self.dtype,
                 kernel_init=he_normal_fan_out, name="conv2")(h)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn2")(h, train)
        if self.downsample:
            residual = conv(self.planes, (1, 1), self.stride, dtype=self.dtype,
                            kernel_init=he_normal_fan_out, name="down_conv")(x)
            residual = TorchBatchNorm(self.dtype, self.bn_groups, name="down_bn")(residual, train)
        return nn.relu(h + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    first_dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        h = conv(self.planes, (1, 1), dtype=self.dtype,
                 kernel_init=he_normal_fan_out, name="conv1")(x)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn1")(h, train)
        h = nn.relu(h)
        # stride lives on the 3x3 (resnet_models.py:65-66)
        h = conv(self.planes, (3, 3), self.stride, padding=self.first_dilation,
                 dilation=self.first_dilation, dtype=self.dtype,
                 kernel_init=he_normal_fan_out, name="conv2")(h)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn2")(h, train)
        h = nn.relu(h)
        h = conv(self.planes * 4, (1, 1), dtype=self.dtype,
                 kernel_init=he_normal_fan_out, name="conv3")(h)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn3")(h, train)
        if self.downsample:
            residual = conv(self.planes * 4, (1, 1), self.stride,
                            dtype=self.dtype, kernel_init=he_normal_fan_out,
                            name="down_conv")(x)
            residual = TorchBatchNorm(self.dtype, self.bn_groups, name="down_bn")(residual, train)
        return nn.relu(h + residual)


def _stage_plan(n_layers: int, dilate_scale: int):
    """Per-stage (stride, dilation, first_dilation) mirroring
    _nostride_dilate (resnet_backbone.py:49-85) with multi_grid=None."""
    # defaults: layer1 s1, layers2-4 s2
    plan = [(1, 1, 1), (2, 1, 1), (2, 1, 1), (2, 1, 1)]
    if dilate_scale == 8:
        # layer3: stride removed, dilation 2 (first block's 3x3 gets d//2=1)
        plan[2] = (1, 2, 1)
        # layer4: stride removed, dilation 4 (first block's 3x3 gets 2)
        plan[3] = (1, 4, 2)
    elif dilate_scale == 16:
        plan[3] = (1, 2, 1)
    return plan


class ResNetBackbone(nn.Module):
    """Returns [c2, c3, c4, c5] stage features."""

    n_layers: int = 50
    dilate_scale: int = 8  # 0 = no dilation (stride-32 classic)
    width_multiplier: float = 1.0
    deep_base: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, ...]:
        block_kind, depths = LAYER_SPECS[self.n_layers]
        Block = BasicBlock if block_kind == "basic" else Bottleneck
        expansion = 1 if block_kind == "basic" else 4
        w = self.width_multiplier

        if self.deep_base:
            h = conv(64, (3, 3), 2, padding=1, dtype=self.dtype,
                     kernel_init=he_normal_fan_out, name="conv1")(x)
            h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn1")(h, train)
            h = nn.relu(h)
            h = conv(64, (3, 3), padding=1, dtype=self.dtype,
                     kernel_init=he_normal_fan_out, name="conv2")(h)
            h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn2")(h, train)
            h = nn.relu(h)
            h = conv(128, (3, 3), padding=1, dtype=self.dtype,
                     kernel_init=he_normal_fan_out, name="conv3")(h)
            h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn3")(h, train)
            h = nn.relu(h)
            in_ch = 128
        else:
            in_ch = int(64 * w)
            h = conv(in_ch, (7, 7), 2, padding=3, dtype=self.dtype,
                     kernel_init=he_normal_fan_out, name="conv1")(x)
            h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn1")(h, train)
            h = nn.relu(h)

        # maxpool 3x3 s2 pad1 with -inf padding (torch semantics)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        plan = _stage_plan(self.n_layers, self.dilate_scale)
        for li, (n_blocks, (stride, dil, first_dil)) in enumerate(
                zip(depths, plan), start=1):
            planes = int(64 * (2 ** (li - 1)) * w)
            for bi in range(n_blocks):
                down = bi == 0 and (stride != 1 or in_ch != planes * expansion)
                h = Block(planes=planes,
                          stride=stride if bi == 0 else 1,
                          dilation=dil,
                          first_dilation=first_dil if bi == 0 else dil,
                          downsample=down, dtype=self.dtype,
                          bn_groups=self.bn_groups,
                          name=f"layer{li}_{bi}")(h, train)
                in_ch = planes * expansion
            feats.append(h)
        return tuple(feats)
