"""FPN segmentation model (reference ``networks/model.py:6 FPNSeg`` +
``networks/decoders.py:6-101``), Flax/NHWC.

Encoder: dilated ResNet (strides 4/8/8/8) -> [c2, c3, c4, c5].
Decoder: lateral 1x1 convs to 256ch, top-down upsample-add (bilinear,
half-pixel — the reference uses ``align_corners`` default False here,
``decoders.py:82``), then per-level chains of (3x3 conv + GroupNorm(32) +
ReLU + x2 bilinear upsample) bringing every level to input resolution;
``emb = p2+p3+p4+p5``, 1x1 classifier. Unlike DeepLab there is no final
upsample in forward — the chains already land at input resolution
(SURVEY.md §3.2).

``upsample=False`` keeps the fused pyramid at 1/4 resolution for the
sparse-label train step (the last x2/x4 upsamples of each chain are linear,
so gathering at 1/4 then interpolating is NOT identical here — instead we
simply keep full-res heads for FPN and gather from them; the flag returns
full-res anyway, documented for interface parity).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from pixelpick_tpu.models.layers import conv, he_normal_fan_in
from pixelpick_tpu.models.resnet import ResNetBackbone
from pixelpick_tpu.ops.resize import resize_bilinear


class UpsampleBlock(nn.Module):
    out_channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = conv(self.out_channels, (3, 3), padding=1, use_bias=True,
                 dtype=self.dtype, name="conv")(x)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(h)
        h = nn.relu(h)
        hw = (h.shape[1] * 2, h.shape[2] * 2)
        return resize_bilinear(h, hw, align_corners=False)


class FPNDecoder(nn.Module):
    n_classes: int
    n_layers: int = 50
    width_multiplier: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...]):
        c2, c3, c4, c5 = feats
        p5 = conv(256, (1, 1), use_bias=True, dtype=self.dtype,
                  name="lat_layer_0")(c5)
        p4 = self._up_add(p5, conv(256, (1, 1), use_bias=True,
                                   dtype=self.dtype, name="lat_layer_1")(c4))
        p3 = self._up_add(p4, conv(256, (1, 1), use_bias=True,
                                   dtype=self.dtype, name="lat_layer_2")(c3))
        p2 = self._up_add(p3, conv(256, (1, 1), use_bias=True,
                                   dtype=self.dtype, name="lat_layer_3")(c2))

        def chain(x, n, name):
            for i in range(n):
                x = UpsampleBlock(128, dtype=self.dtype,
                                  name=f"{name}_{i}")(x)
            return x

        p5 = chain(p5, 3, "upsample_blocks_0")
        p4 = chain(p4, 3, "upsample_blocks_1")
        p3 = chain(p3, 3, "upsample_blocks_2")
        p2 = chain(p2, 2, "upsample_blocks_3")
        emb = p2 + p3 + p4 + p5
        pred = conv(self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                    name="classifier")(emb)
        return {"emb": emb, "pred": pred}

    @staticmethod
    def _up_add(x, y):
        return resize_bilinear(x, y.shape[1:3], align_corners=False) + y


class FPNSeg(nn.Module):
    n_classes: int
    n_layers: int = 50
    width_multiplier: float = 1.0
    dilate_scale: int = 8
    mc_dropout_p: float = 0.2
    dtype: jnp.dtype = jnp.float32
    bn_groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False, mc_dropout_on: bool = False,
                 upsample: bool = True):
        feats = ResNetBackbone(
            n_layers=self.n_layers, dilate_scale=self.dilate_scale,
            width_multiplier=self.width_multiplier, dtype=self.dtype,
            bn_groups=self.bn_groups, name="encoder")(x, train)
        out = FPNDecoder(self.n_classes, self.n_layers,
                         self.width_multiplier, dtype=self.dtype,
                         name="decoder")(feats)
        return {"pred": out["pred"].astype(jnp.float32),
                "emb": out["emb"].astype(jnp.float32)}
