"""Atrous Spatial Pyramid Pooling, Flax/NHWC (reference ``networks/aspp.py``).

Four atrous branches (dilations 1/6/12/18 at os=16 or 1/12/24/36 at os=8)
plus a global-average-pool branch, concatenated 5x256 -> 1x1 conv 256,
dropout 0.5 (``aspp.py:49-79``). The reference's bilinear align-corners
upsample of the 1x1 GAP map (``aspp.py:70``) is a pure broadcast — done
directly here.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pixelpick_tpu.models.layers import TorchBatchNorm, conv


ASPP_IN_PLANES = {"mobilenet": 320, "drn": 512, "resnet": 2048}


class ASPP(nn.Module):
    output_stride: int = 16
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool, dropout_on: bool = False):
        if self.output_stride == 16:
            dilations = (1, 6, 12, 18)
        elif self.output_stride == 8:
            dilations = (1, 12, 24, 36)
        else:
            raise NotImplementedError(self.output_stride)

        branches = []
        for i, d in enumerate(dilations, start=1):
            k = (1, 1) if d == 1 else (3, 3)
            pad = 0 if d == 1 else d
            b = conv(256, k, padding=pad, dilation=d, dtype=self.dtype,
                     name=f"aspp{i}")(x)
            b = TorchBatchNorm(self.dtype, self.bn_groups, name=f"aspp{i}_bn")(b, train)
            branches.append(nn.relu(b))

        # global-average-pool branch (aspp.py:54-57,69-70)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = conv(256, (1, 1), dtype=self.dtype, name="gap_conv")(g)
        g = TorchBatchNorm(self.dtype, self.bn_groups, name="gap_bn")(g, train)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, branches[0].shape)
        branches.append(g)

        h = jnp.concatenate(branches, axis=-1)  # 1280
        h = conv(256, (1, 1), dtype=self.dtype, name="proj")(h)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="proj_bn")(h, train)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not (train or dropout_on))(h)
        return h
