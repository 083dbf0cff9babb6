"""Shared Flax building blocks.

Conventions (TPU-native): NHWC activations, HWIO kernels, BatchNorm with
torch semantics (momentum 0.1 => flax momentum 0.9, eps 1e-5), compute dtype
switchable to bfloat16 while params/statistics stay f32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch kaiming_normal_(default leaky_relu a=0, fan_in) == He normal fan_in
he_normal_fan_in = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
# torch ResNet init: normal(0, sqrt(2 / (k*k*out_ch))) == He normal fan_out
he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def ghost_bn_train(x, scale, bias, groups: int, epsilon: float,
                   dtype) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Train-mode (ghost) BatchNorm math shared by :class:`_BNCore` and the
    fused inverted-residual path (models/fused_block.py). Returns
    (y, mu, var) with mu/var of shape (n_groups, C) in f32 — the caller owns
    the running-stat EMA update."""
    b = x.shape[0]
    g = groups if 0 < groups < b and b % groups == 0 else b
    ng = b // g
    xf = x.astype(jnp.float32).reshape(ng, g, *x.shape[1:])
    mu = xf.mean(axis=(1, 2, 3))                        # (ng, c)
    mu2 = (xf * xf).mean(axis=(1, 2, 3))
    var = jnp.maximum(0.0, mu2 - mu * mu)               # fast variance
    exp = (slice(None), None, None, None, slice(None))
    mul = jax.lax.rsqrt(var + epsilon)[exp] * scale
    y = (x.reshape(xf.shape) - mu[exp]) * mul + bias
    return jnp.asarray(y.reshape(x.shape), dtype), mu, var


class _BNCore(nn.Module):
    """BatchNorm with optional fixed-size statistic groups ("ghost BN").

    ``groups == 0``: moments over the whole (global, if sharded) batch —
    flax ``nn.BatchNorm`` semantics, replicated here numerics-for-numerics
    (f32 fast-variance stats, (x - mean) * rsqrt(var + eps) * scale + bias,
    result cast to ``dtype``). Variable layout is identical to
    ``nn.BatchNorm`` (params scale/bias, batch_stats mean/var), so
    checkpoints and the torch converter are implementation-agnostic.

    ``groups == G > 0``: the batch is split into contiguous groups of G
    samples; each group is normalised with its own moments and the running
    stats take the group-mean of the per-group moments. This reproduces the
    reference's single-device bs=4 BatchNorm *statistics* at any larger
    batch (``--batch_size 48 --bn_group_size 4`` = 12 independent bs-4 BNs
    per step), and — because the grouping depends only on batch content —
    is mesh-independent: with G = per-device batch it is also exactly
    "local-replica BN" under data parallelism, with zero cross-device BN
    collectives. (Ghost BN: Hoffer et al., NeurIPS 2017.)

    Batches not divisible by G (e.g. the loader's remainder batch) fall
    back to whole-batch moments — the trace-time shape decides.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    groups: int = 0

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_running_average:
            mul = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (x - ra_mean.value) * mul + bias
            return jnp.asarray(y, self.dtype)

        y, mu, var = ghost_bn_train(x, scale, bias, self.groups,
                                    self.epsilon, self.dtype)
        if not self.is_initializing():
            ra_mean.value = self.momentum * ra_mean.value \
                + (1 - self.momentum) * mu.mean(0)
            ra_var.value = self.momentum * ra_var.value \
                + (1 - self.momentum) * var.mean(0)
        return y


class TorchBatchNorm(nn.Module):
    """BatchNorm matching ``torch.nn.BatchNorm2d`` defaults.

    Under a sharded (data-parallel) batch inside ``jit`` with ``groups=0``,
    the batch moments are computed over the *global* batch automatically
    (XLA inserts the collectives). ``groups=G`` gives ghost/local-replica
    BN — see :class:`_BNCore`.
    """

    dtype: jnp.dtype = jnp.float32
    groups: int = 0

    @nn.compact
    def __call__(self, x, train: bool):
        return _BNCore(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       groups=self.groups, name="bn")(x, not train)


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


class Conv3x3MatMul(nn.Module):
    """'Same'-shape 3x3 conv decomposed into 9 shifted channel matmuls.

    Each kernel tap contributes ``x_shifted @ W[ky,kx]`` — nine
    [H*W, C_in] x [C_in, C_out] einsums accumulated in f32, the natural MXU
    mapping (same rationale as :class:`Conv1x1`). Parameter layout stays
    (3, 3, I, O) ``kernel`` + optional ``bias``, identical to ``nn.Conv``,
    so checkpoints and the torch converter are implementation-agnostic.

    Valid only for stride 1 with ``padding == dilation`` (output == input
    shape) — exactly the decoder-head and ASPP-atrous convs, which carry
    ~86% of the model's FLOPs (SegmentHead 304->256->256 at 1/4 res).
    Enabled with ``--conv3x3_matmul`` / ``set_conv3x3_impl('matmul')``.
    """

    features: int
    dilation: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = he_normal_fan_in

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        d = self.dilation
        h, w = x.shape[1:3]
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        precision = "highest" if self.dtype == jnp.float32 else None
        xc = xp.astype(self.dtype)
        kc = kernel.astype(self.dtype)
        acc = None
        for ky in range(3):
            for kx in range(3):
                win = jax.lax.slice(
                    xc, (0, ky * d, kx * d, 0),
                    (xc.shape[0], ky * d + h, kx * d + w, cin))
                term = jnp.einsum("bhwc,co->bhwo", win, kc[ky, kx],
                                  precision=precision,
                                  preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
        y = acc.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _conv3x3_same(x, k, dilation: int, precision):
    d = dilation
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


from functools import partial  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_wgrad_mm(x, k, dilation: int, precision=None):
    """Same-shape stride-1 3x3 conv: XLA conv for forward AND dgrad, but the
    weight gradient as 9 tap einsums ([Cin, B*H*W] x [B*H*W, Cout] matmuls
    with f32 accumulation) instead of XLA's transposed-conv wgrad kernel.
    Mathematically identical contraction; measured by perf_probe 'wmm'."""
    return _conv3x3_same(x, k, dilation, precision)


def _c3wm_fwd(x, k, dilation, precision):
    return _conv3x3_same(x, k, dilation, precision), (x, k)


def _c3wm_bwd(dilation, precision, res, g):
    x, k = res
    # dgrad: XLA's own transposed conv (via vjp of the forward wrt x)
    _, pullback = jax.vjp(
        lambda xx: _conv3x3_same(xx, k, dilation, precision), x)
    dx, = pullback(g)
    # wgrad: 9 shifted-window einsums on the MXU
    d = dilation
    b, h, w, cin = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    taps = []
    for ky in range(3):
        for kx in range(3):
            win = jax.lax.slice(xp, (0, ky * d, kx * d, 0),
                                (b, ky * d + h, kx * d + w, cin))
            taps.append(jnp.einsum("bhwi,bhwo->io", win, g,
                                   preferred_element_type=jnp.float32))
    dk = jnp.stack(taps, 0).reshape(3, 3, cin, g.shape[-1]).astype(k.dtype)
    return dx, dk


conv3x3_wgrad_mm.defvjp(_c3wm_fwd, _c3wm_bwd)


class Conv3x3WgradMM(nn.Module):
    """nn.Conv-compatible 3x3 same-shape conv backed by
    :func:`conv3x3_wgrad_mm` (XLA forward/dgrad, matmul wgrad). Parameter
    layout identical to ``nn.Conv``. Enabled with
    ``set_conv3x3_impl('wgradmm')``."""

    features: int
    dilation: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = he_normal_fan_in

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, cin, self.features), jnp.float32)
        precision = "highest" if self.dtype == jnp.float32 else None
        y = conv3x3_wgrad_mm(x.astype(self.dtype),
                             kernel.astype(self.dtype), self.dilation,
                             precision)
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
    d = dilation if isinstance(dilation, int) else dilation[0]
    if (_CONV3X3_IMPL == "matmul" and tuple(kernel) == (3, 3)
            and stride_t == (1, 1) and groups == 1
            and padding == ((d, d), (d, d))):
        return Conv3x3MatMul(features=features, dilation=d, use_bias=use_bias,
                             dtype=dtype, kernel_init=kernel_init, name=name)
    if (_CONV3X3_IMPL == "wgradmm" and tuple(kernel) == (3, 3)
            and stride_t == (1, 1) and groups == 1
            and padding == ((d, d), (d, d))):
        return Conv3x3WgradMM(features=features, dilation=d,
                              use_bias=use_bias, dtype=dtype,
                              kernel_init=kernel_init, name=name)
    if (_DEPTHWISE_IMPL == "pallas" and tuple(kernel) == (3, 3)
            and groups == features and not use_bias
            and padding in ("VALID", ((0, 0), (0, 0)))):
        return PallasDepthwise(features=features, stride=stride_t[0],
                               dilation=d, dtype=dtype,
                               kernel_init=kernel_init, name=name)
    if (_DEPTHWISE_IMPL == "xla_nowgrad" and tuple(kernel) == (3, 3)
            and groups == features and not use_bias
            and padding in ("VALID", ((0, 0), (0, 0)))):
        return DepthwiseNoWgrad(features=features, stride=stride_t[0],
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
_CONV3X3_IMPL = "xla"


def set_depthwise_impl(name: str) -> None:
    """'xla' (grouped conv, default), 'pallas' (ops/depthwise.py kernel),
    'xla_nowgrad' (DIAGNOSTIC: kernel stop-gradient — no depthwise wgrad;
    for cost attribution only, never for training). Process-global; set
    before model tracing (--pallas_dw does this)."""
    global _DEPTHWISE_IMPL
    assert name in ("xla", "pallas", "xla_nowgrad"), name
    _DEPTHWISE_IMPL = name


def set_conv3x3_impl(name: str) -> None:
    """'xla' (lax.conv), 'matmul' (tap-decomposed Conv3x3MatMul) or
    'wgradmm' (XLA fwd/dgrad, tap-matmul wgrad — Conv3x3WgradMM) for
    same-shape stride-1 3x3 convs. Process-global; set before tracing
    (--conv3x3_matmul does this)."""
    global _CONV3X3_IMPL
    assert name in ("xla", "matmul", "wgradmm"), name
    _CONV3X3_IMPL = name


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


class DepthwiseNoWgrad(nn.Module):
    """DIAGNOSTIC ONLY: grouped 3x3 conv whose kernel is stop-gradient'ed,
    removing the depthwise weight-gradient convs from the backward pass so
    their cost can be measured by subtraction. Same param layout as
    ``nn.Conv``; never use for actual training."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    kernel_init: nn.initializers.Initializer = he_normal_fan_in

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, 1, self.features), jnp.float32)
        k = jax.lax.stop_gradient(kernel).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, (self.stride, self.stride),
            ((0, 0), (0, 0)), rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.features)


class Dropout2d(nn.Module):
    """Channel dropout (zeroes whole feature maps), torch ``nn.Dropout2d``."""

    rate: float

    @nn.compact
    def __call__(self, x, active: bool):
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2),
                          deterministic=not active)(x)
