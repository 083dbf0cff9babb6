"""Shared Flax building blocks.

Conventions (TPU-native): NHWC activations, HWIO kernels, BatchNorm with
torch semantics (momentum 0.1 => flax momentum 0.9, eps 1e-5), compute dtype
switchable to bfloat16 while params/statistics stay f32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

# torch kaiming_normal_(default leaky_relu a=0, fan_in) == He normal fan_in
he_normal_fan_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# torch ResNet init: normal(0, sqrt(2 / (k*k*out_ch))) == He normal fan_out
he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class TorchBatchNorm(nn.Module):
    """BatchNorm matching ``torch.nn.BatchNorm2d`` defaults.

    Under a sharded (data-parallel) batch inside ``jit``, the batch moments
    are computed over the *global* batch automatically (XLA inserts the
    collectives) — the TPU-native generalisation of the reference's
    single-device BN.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="bn",
        )(x)


class Conv1x1(nn.Module):
    """1x1 convolution expressed as a channel matmul (einsum on the MXU).

    Two reasons over ``lax.conv``: (1) a pointwise conv *is* a matmul — this
    is the natural MXU mapping; (2) the axon XLA-TPU backend miscomputes any
    ``lax.conv`` whose output feeds a stride-2 convolution (~40% deviation;
    minimal repro: conv1x1 -> dw-conv/s2 — see git history), while the
    dot-general form is exact. Parameter shape/naming stays (1,1,I,O)
    ``kernel`` (+ ``bias``), identical to ``nn.Conv``, so checkpoints and
    the torch converter are unaffected.
    """

    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = he_normal_fan_in

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, x.shape[-1], self.features), jnp.float32)
        precision = "highest" if self.dtype == jnp.float32 else None
        y = jnp.einsum("bhwc,co->bhwo", x.astype(self.dtype),
                       kernel[0, 0].astype(self.dtype), precision=precision)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def conv(features: int, kernel: Tuple[int, int], stride=1, *, dilation=1,
         padding="VALID", groups: int = 1, use_bias: bool = False,
         dtype=jnp.float32, name: Optional[str] = None,
         kernel_init=he_normal_fan_in):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    stride_t = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if (tuple(kernel) == (1, 1) and stride_t == (1, 1) and groups == 1
            and padding in ("VALID", ((0, 0), (0, 0)))):
        return Conv1x1(features=features, use_bias=use_bias, dtype=dtype,
                       kernel_init=kernel_init, name=name)
    if (_DEPTHWISE_IMPL == "pallas" and tuple(kernel) == (3, 3)
            and groups == features and not use_bias
            and padding in ("VALID", ((0, 0), (0, 0)))):
        d = dilation if isinstance(dilation, int) else dilation[0]
        return PallasDepthwise(features=features, stride=stride_t[0],
                               dilation=d, dtype=dtype,
                               kernel_init=kernel_init, name=name)
    # f32 mode must use HIGHEST precision: JAX's default conv precision runs
    # reduced-precision passes (observable ~1e-2 drift vs torch f32, verified
    # in tests/test_model_parity.py). bf16 mode keeps the fast default path.
    precision = "highest" if dtype == jnp.float32 else None
    return nn.Conv(
        precision=precision,
        features=features,
        kernel_size=kernel,
        strides=(stride, stride) if isinstance(stride, int) else stride,
        padding=padding,
        kernel_dilation=(dilation, dilation) if isinstance(dilation, int) else dilation,
        feature_group_count=groups,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=kernel_init,
        name=name,
    )


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def fixed_padding_amounts(kernel_size: int, dilation: int) -> Tuple[int, int]:
    """TF-style explicit padding used by the reference MobileNetV2
    (``networks/mobilenet_v2.py:15-21``)."""
    effective = kernel_size + (kernel_size - 1) * (dilation - 1)
    total = effective - 1
    beg = total // 2
    return beg, total - beg


def fixed_pad(x, kernel_size: int, dilation: int):
    beg, end = fixed_padding_amounts(kernel_size, dilation)
    return jnp.pad(x, ((0, 0), (beg, end), (beg, end), (0, 0)))


_DEPTHWISE_IMPL = "xla"


def set_depthwise_impl(name: str) -> None:
    """'xla' (grouped conv, default) or 'pallas' (ops/depthwise.py kernel).
    Process-global; set before model tracing (--pallas_dw does this)."""
    global _DEPTHWISE_IMPL
    assert name in ("xla", "pallas"), name
    _DEPTHWISE_IMPL = name


class PallasDepthwise(nn.Module):
    """3x3 depthwise conv backed by the Pallas kernel. Parameter layout is
    identical to ``nn.Conv`` grouped form — kernel (3, 3, 1, C) — so
    checkpoints/converters are implementation-agnostic."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = he_normal_fan_in

    @nn.compact
    def __call__(self, x):
        import jax

        from pixelpick_tpu.ops.depthwise import depthwise_conv3x3

        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, 1, self.features), jnp.float32)
        interpret = jax.default_backend() != "tpu"
        return depthwise_conv3x3(
            x.astype(self.dtype), kernel[:, :, 0, :].astype(self.dtype),
            self.stride, self.dilation, 0, interpret)


class Dropout2d(nn.Module):
    """Channel dropout (zeroes whole feature maps), torch ``nn.Dropout2d``."""

    rate: float

    @nn.compact
    def __call__(self, x, active: bool):
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2),
                          deterministic=not active)(x)
