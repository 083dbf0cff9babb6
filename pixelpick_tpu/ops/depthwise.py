"""Pallas depthwise 3x3 convolution (TPU kernel, opt-in).

Depthwise convolutions never touch the MXU — they are 9 shifted
multiply-accumulates per channel, i.e. pure VPU + HBM-bandwidth work. XLA's
grouped-conv lowering measured 280–470 GB/s effective bandwidth on our
MobileNetV2 shapes (see git history); this kernel streams whole padded
images through VMEM and performs the 9 taps as vector MACs, aiming at the
bandwidth roof.

Forward is a Pallas kernel (grid over the batch, with an XLA fallback for
images exceeding VMEM); backward is a ``jax.custom_vjp`` computed
with regular XLA ops (transposed dilated conv for dx, tap-reduction einsum
for dw) — exactness over cleverness for the bwd.

Used by MobileNetV2 when ``pixelpick_tpu.models.layers.set_depthwise_impl
("pallas")`` is active (flag ``--pallas_dw``); default stays on XLA's
grouped conv. Correctness is tested in interpreter mode on CPU and
numerically on TPU against ``lax.conv_general_dilated``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

# (Element-indexed halo tiling shelved: Mosaic requires all-Element specs
# and then refuses to pipeline them — see _dw_forward docstring)

try:  # TPU-only helpers; interpret mode works without them
    from jax.experimental.pallas import tpu as pltpu
    _MEMSPACE = dict(memory_space=pltpu.VMEM)
except Exception:  # pragma: no cover
    pltpu = None
    _MEMSPACE = {}

VMEM_BUDGET = 6 * 1024 * 1024  # per-image block budget (bytes)


def _dw_kernel(x_ref, w_ref, o_ref, *, taps, stride, tile_out, w_out, ch):
    xv = x_ref[0]
    acc = None
    for (ky, kx), (oy, ox) in taps:
        sl = lax.slice(
            xv,
            (oy, ox, 0),
            (oy + (tile_out - 1) * stride + 1,
             ox + (w_out - 1) * stride + 1, ch),
            (stride, stride, 1),
        ).astype(jnp.float32)
        tap = sl * w_ref[ky, kx, :].astype(jnp.float32)
        acc = tap if acc is None else acc + tap
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_forward(x: jnp.ndarray, w: jnp.ndarray, stride: int, dilation: int,
                interpret: bool = False) -> jnp.ndarray:
    """x: (B,H,W,C) pre-padded NHWC; w: (3,3,C). VALID depthwise conv.

    Grid over the batch: one program streams one padded image through VMEM
    (MobileNetV2's dw layers are 1.5–8 MB per image at bf16). Images whose
    block would exceed the VMEM budget fall back to XLA's grouped conv —
    row-tiling with halo windows needs Element-indexed blocks, which
    Mosaic currently refuses to pipeline (kept for a future round).
    """
    b, h, wd, ch = x.shape
    eff = 1 + 2 * dilation  # effective kernel extent
    h_out = (h - eff) // stride + 1
    w_out = (wd - eff) // stride + 1
    taps = [((ky, kx), (ky * dilation, kx * dilation))
            for ky in range(3) for kx in range(3)]

    # XLA fallback: (a) image too big for a VMEM block; (b) stride > 1 —
    # Mosaic's vector.extract_strided_slice only allows unit strides
    # (verified on the v5e stack), so strided taps can't lower.
    if stride != 1 or h * wd * ch * x.dtype.itemsize > VMEM_BUDGET:
        return lax.conv_general_dilated(
            x, w.reshape(3, 3, 1, ch), (stride, stride),
            ((0, 0), (0, 0)), rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch)

    kernel = functools.partial(_dw_kernel, taps=taps, stride=stride,
                               tile_out=h_out, w_out=w_out, ch=ch)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wd, ch), lambda bi: (bi, 0, 0, 0), **_MEMSPACE),
            pl.BlockSpec((3, 3, ch), lambda bi: (0, 0, 0), **_MEMSPACE),
        ],
        out_specs=pl.BlockSpec((1, h_out, w_out, ch),
                               lambda bi: (bi, 0, 0, 0), **_MEMSPACE),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, ch), x.dtype),
        interpret=interpret,
    )(x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def depthwise_conv3x3(x, w, stride: int = 1, dilation: int = 1,
                      padding: int = 1, interpret: bool = False):
    """Depthwise 3x3 conv, NHWC, symmetric ``padding``; w: (3,3,C)."""
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    return _dw_forward(xp, w, stride, dilation, interpret)


def _fwd(x, w, stride, dilation, padding, interpret):
    return depthwise_conv3x3(x, w, stride, dilation, padding, interpret), (x, w)


def _bwd(stride, dilation, padding, interpret, res, g):
    x, w = res
    ch = x.shape[-1]
    # dx: transposed conv == conv of the (lhs-dilated) grad with the
    # spatially flipped kernel
    w_flip = w[::-1, ::-1, :]
    kernel = w_flip.reshape(3, 3, 1, ch)
    eff = 1 + 2 * dilation
    pad_lo = eff - 1 - padding
    h_pad = x.shape[1] + 2 * padding
    # align output extent with the forward's valid range under stride
    h_out = (h_pad - eff) // stride + 1
    rem_h = h_pad - ((h_out - 1) * stride + eff)
    w_pad = x.shape[2] + 2 * padding
    w_out = (w_pad - eff) // stride + 1
    rem_w = w_pad - ((w_out - 1) * stride + eff)
    dx = lax.conv_general_dilated(
        g, kernel,
        window_strides=(1, 1),
        padding=((pad_lo, pad_lo + rem_h), (pad_lo, pad_lo + rem_w)),
        lhs_dilation=(stride, stride),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ch,
        precision=lax.Precision.HIGHEST,
    )
    # dw: per-tap reduction over batch and space
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    taps = []
    gh, gw = g.shape[1:3]
    for ky in range(3):
        for kx in range(3):
            sl = lax.slice(
                xp,
                (0, ky * dilation, kx * dilation, 0),
                (xp.shape[0], ky * dilation + (gh - 1) * stride + 1,
                 kx * dilation + (gw - 1) * stride + 1, ch),
                (1, stride, stride, 1),
            )
            taps.append(jnp.einsum("bhwc,bhwc->c", sl.astype(jnp.float32),
                                   g.astype(jnp.float32)))
    dw = jnp.stack(taps).reshape(3, 3, ch).astype(w.dtype)
    return dx.astype(x.dtype), dw


depthwise_conv3x3.defvjp(_fwd, _bwd)


def depthwise_reference(x, w, stride=1, dilation=1, padding=1):
    """XLA grouped-conv reference for tests/benchmarks."""
    ch = x.shape[-1]
    return lax.conv_general_dilated(
        x, w.reshape(3, 3, 1, ch), (stride, stride),
        ((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=ch,
        precision=lax.Precision.HIGHEST,
    )
