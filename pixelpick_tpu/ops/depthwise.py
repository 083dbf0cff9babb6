"""Pallas depthwise 3x3 convolution (TPU kernel, opt-in, experimental).

Depthwise convolutions never touch the MXU — they are 9 shifted
multiply-accumulates per channel, i.e. pure VPU + HBM-bandwidth work. This
kernel row-tiles each image with halo windows (manual HBM→VMEM DMA, since
Blocked specs cannot express overlapping reads) and performs the 9 taps as
unit-stride vector MACs; it handles any image size and dilation at
stride 1. stride 2 falls back to XLA (Mosaic vector slices are unit-stride
only; a space-to-depth phase-split variant is future work).

**Measured verdict (honest slope-drain timing, v5e)**: numerics are exact,
but inside the full bf16 train step the Pallas path is ~2x SLOWER than
XLA's grouped-conv lowering (212 vs 108 ms/step at bs48) — the standalone
kernel pays pad materialisation, non-pipelined DMA and broken
elementwise-fusion chains that XLA's fused conv avoids. XLA therefore
stays the default; this kernel is kept as a correct, tested substrate for
a future fused inverted-residual block.

Forward is the Pallas kernel; backward is a ``jax.custom_vjp`` computed
with regular XLA ops (transposed dilated conv for dx, tap-reduction einsum
for dw) — exactness over cleverness for the bwd.

Enabled via ``pixelpick_tpu.models.layers.set_depthwise_impl("pallas")``
(flag ``--pallas_dw``). Correctness is tested in interpreter mode on CPU
and numerically on TPU against ``lax.conv_general_dilated``.
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


def _row_tile(h_out: int, wd: int, ch: int, eff: int, itemsize: int) -> int:
    """Largest divisor of h_out whose VMEM working set fits the budget.

    Working set per program: input slab (tile+halo, input dtype), output
    tile (input dtype), f32 accumulator + one f32 tap temporary (Mosaic's
    scoped-vmem stack holds both live at the add).

    Returns 0 when even a one-row tile exceeds the budget (pathologically
    wide images after the channel pad to 128) — the caller must fall back
    to XLA's grouped conv rather than hand Mosaic an oversized scratch."""
    best = 0
    for th in range(1, h_out + 1):
        if h_out % th:
            continue
        slab = (th + eff - 1) * wd * ch * itemsize
        out = th * wd * ch * itemsize
        f32_tmp = 2 * th * wd * ch * 4
        if slab + out + f32_tmp <= VMEM_BUDGET:
            best = th
    return best


def _dw_halo_kernel(x_hbm, w_ref, o_ref, scratch, sem, *, taps, tile_out,
                    tile_in, w_out, ch):
    """One program computes ``tile_out`` output rows of one image: DMA the
    input slab (tile + halo rows) from HBM into VMEM scratch, then 9
    static-offset vector MACs. Manual DMA because halo windows overlap —
    Blocked specs can't express overlapping reads."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.dslice(ti * tile_out, tile_in)], scratch, sem)
    cp.start()
    cp.wait()
    xv = scratch[...]
    acc = None
    for (ky, kx), (oy, ox) in taps:
        sl = lax.slice(xv, (oy, ox, 0),
                       (oy + tile_out, ox + w_out, ch)).astype(jnp.float32)
        tap = sl * w_ref[ky, kx, :].astype(jnp.float32)
        acc = tap if acc is None else acc + tap
    o_ref[0] = acc.astype(o_ref.dtype)


def _dw_forward(x: jnp.ndarray, w: jnp.ndarray, stride: int, dilation: int,
                interpret: bool = False) -> jnp.ndarray:
    """x: (B,H,W,C) pre-padded NHWC; w: (3,3,C). VALID depthwise conv.

    stride 1 (any size, any dilation): grid (batch, row-tiles); each program
    DMAs its input slab (tile + halo) from HBM into VMEM scratch and runs
    the 9 taps as unit-stride vector MACs — row tiling keeps arbitrarily
    large images inside VMEM, and the manual copy expresses the overlapping
    halo windows Blocked specs cannot.

    stride 2 falls back to XLA's grouped conv: Mosaic's strided vector
    slices are unit-stride only (verified on the v5e stack); the
    space-to-depth phase-split variant is the remaining follow-up.
    """
    b, h, wd, ch = x.shape
    ch_orig = ch
    eff = 1 + 2 * dilation  # effective kernel extent
    h_out = (h - eff) // stride + 1
    w_out = (wd - eff) // stride + 1
    taps = [((ky, kx), (ky * dilation, kx * dilation))
            for ky in range(3) for kx in range(3)]

    if stride != 1 or pltpu is None:
        return lax.conv_general_dilated(
            x, w.reshape(3, 3, 1, ch), (stride, stride),
            ((0, 0), (0, 0)), rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch)

    # Mosaic DMA: slices of an HBM ref must be tile-aligned along the
    # sublane/lane dims — (8) on width, (128) on channels. Right-pad both
    # (the physical memref is lane-padded to 128 anyway, so the channel pad
    # adds no real traffic); taps never read the extra columns and the
    # caller slices the junk channels off the output.
    wd8 = -(-wd // 8) * 8
    ch128 = -(-ch // 128) * 128
    tile_out = _row_tile(h_out, wd8, ch128, eff, x.dtype.itemsize)
    if tile_out == 0:
        # even a one-row tile blows the VMEM budget (very wide image after
        # the channel pad): XLA's grouped conv instead of a Mosaic failure
        return lax.conv_general_dilated(
            x, w.reshape(3, 3, 1, ch), (stride, stride),
            ((0, 0), (0, 0)), rhs_dilation=(dilation, dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch)
    if wd8 != wd or ch128 != ch:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wd8 - wd), (0, ch128 - ch)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, ch128 - ch)))
        wd, ch = wd8, ch128
    tile_in = tile_out + eff - 1
    kernel = functools.partial(_dw_halo_kernel, taps=taps, tile_out=tile_out,
                               tile_in=tile_in, w_out=w_out, ch=ch)
    y = pl.pallas_call(
        kernel,
        grid=(b, h_out // tile_out),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, ch), lambda bi, ti: (0, 0, 0), **_MEMSPACE),
        ],
        out_specs=pl.BlockSpec((1, tile_out, w_out, ch),
                               lambda bi, ti: (bi, ti, 0, 0), **_MEMSPACE),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, ch), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_in, wd, ch), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(x, w)
    if ch != ch_orig:
        y = y[..., :ch_orig]
    return y


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
