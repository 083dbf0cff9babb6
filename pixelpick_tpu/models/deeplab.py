"""DeepLabv3+ (MobileNetV2 + ASPP + decoder head), Flax/NHWC.

Parity with reference ``networks/deeplab.py:12-61`` and the head in
``networks/decoders.py:104-132``:

  backbone -> (high 1/16, low 1/4)
  ASPP(high) -> 256ch, bilinear align-corners up to 1/4
  low -> 1x1 conv 24->48 + BN + ReLU
  concat [aspp | low] -> 304ch
  SegmentHead: 3x3 304->256 BN ReLU Drop(0.5), 3x3 256->256 BN ReLU
               Drop(mc_p), 1x1 -> n_classes
  pred & emb bilinear align-corners up to input resolution

TPU-native addition: ``upsample=False`` skips the final x4 upsample and
returns the 1/4-resolution head outputs. The sparse-label train step gathers
interpolated logits at labelled coordinates instead (exactly equal to
upsample-then-index by linearity of bilinear interpolation — see
``ops/resize.py``), so the full-resolution logits never exist during
training.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pixelpick_tpu.models.aspp import ASPP
from pixelpick_tpu.models.layers import TorchBatchNorm, conv
from pixelpick_tpu.models.mobilenet_v2 import MobileNetV2
from pixelpick_tpu.ops.resize import resize_align_corners


class SegmentHead(nn.Module):
    """DeepLabv3+ decoder head (decoders.py:104-132)."""

    n_classes: int
    mc_dropout_p: float = 0.2
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool, dropout_on: bool = False):
        h = conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn1")(h, train)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not (train or dropout_on))(h)
        h = conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = TorchBatchNorm(self.dtype, self.bn_groups, name="bn2")(h, train)
        emb = nn.relu(h)
        emb = nn.Dropout(self.mc_dropout_p,
                         deterministic=not (train or dropout_on))(emb)
        pred = conv(self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                    name="classifier")(emb)
        return emb, pred


class DeepLab(nn.Module):
    n_classes: int
    output_stride: int = 16
    width_mult: float = 1.0
    mc_dropout: bool = False
    mc_dropout_p: float = 0.2
    mc_dropout2d_committee: bool = False  # see MobileNetV2 (fidelity flag)
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0
    s2d_until: int = 0  # see MobileNetV2 (space-to-depth early blocks)
    remat_blocks: bool = False  # see MobileNetV2 (per-block remat)
    fused_ir: bool = False  # see MobileNetV2 (fused inverted-residual kernel)

    @nn.compact
    def __call__(self, x, train: bool = False, mc_dropout_on: bool = False,
                 upsample: bool = True):
        high, low = MobileNetV2(
            output_stride=self.output_stride, width_mult=self.width_mult,
            mc_dropout=self.mc_dropout, mc_dropout_p=self.mc_dropout_p,
            mc_dropout2d_committee=self.mc_dropout2d_committee,
            dtype=self.dtype, bn_groups=self.bn_groups,
            s2d_until=self.s2d_until, remat_blocks=self.remat_blocks,
            fused_ir=self.fused_ir,
            name="backbone",
        )(x, train, mc_dropout_on)

        a = ASPP(self.output_stride, dtype=self.dtype,
                 bn_groups=self.bn_groups, name="aspp")(
            high, train, mc_dropout_on)

        ll = conv(48, (1, 1), dtype=self.dtype, name="low_level_conv")(low)
        ll = TorchBatchNorm(self.dtype, self.bn_groups, name="low_level_bn")(ll, train)
        ll = nn.relu(ll)

        a = resize_align_corners(a, ll.shape[1:3])
        h = jnp.concatenate([a, ll], axis=-1)  # [256 | 48] (deeplab.py:50)

        emb, pred = SegmentHead(self.n_classes, self.mc_dropout_p,
                                dtype=self.dtype, bn_groups=self.bn_groups,
                                name="seg_head")(
            h, train, mc_dropout_on)

        if not upsample:
            return {"pred": pred, "emb": emb}
        out_hw = x.shape[1:3]
        return {
            "pred": resize_align_corners(pred.astype(jnp.float32), out_hw),
            "emb": resize_align_corners(emb.astype(jnp.float32), out_hw),
        }
