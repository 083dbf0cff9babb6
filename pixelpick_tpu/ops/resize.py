"""Bilinear resize with exact torch semantics, as interpolation matmuls.

The reference leans on ``F.interpolate(mode='bilinear')`` in two flavours:

- ``align_corners=True`` throughout the DeepLab path (``deeplab.py:49,55,58``,
  ``aspp.py:70``): source coordinate ``s = d * (in - 1) / (out - 1)``;
- default half-pixel (``align_corners=False``) in the FPN decoder
  (``decoders.py:82,101``): ``s = (d + 0.5) * in / out - 0.5``.

``jax.image.resize`` implements neither exactly (its 'linear' uses
half-pixel with edge handling that differs at borders for upsampling),
and gather-based resizes scatter badly on TPU. Instead, bilinear resize is
**separable linear interpolation**, so we precompute a dense ``(out, in)``
row-interpolation matrix per axis at trace time (shapes are static) and
apply two matmuls — which XLA maps straight onto the MXU. Exactness in f32
is verified against ``torch.nn.functional.interpolate`` in
``tests/test_resize.py``.

Coordinate-gather variants are also provided for the sparse-label loss:
interpolating the low-res logits *at a handful of full-res pixel
coordinates* is identical to upsampling then indexing, because
interpolation is linear (used by ``engine/trainer.py``).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) bilinear interpolation matrix, f32."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    d = np.arange(out_size, dtype=np.float64)
    if align_corners:
        s = d * (in_size - 1) / (out_size - 1) if out_size > 1 else np.zeros_like(d)
    else:
        s = np.clip((d + 0.5) * in_size / out_size - 0.5, 0.0, in_size - 1)
    lo = np.floor(s).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 2) if in_size > 1 else lo
    frac = s - lo
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    mat[rows, lo] = 1.0 - frac
    if in_size > 1:
        mat[rows, lo + 1] += frac
    return mat.astype(np.float32)


def interp_matrix(in_size: int, out_size: int, align_corners: bool,
                  dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(_interp_matrix_np(in_size, out_size, align_corners), dtype)


def resize_bilinear(x: jnp.ndarray, out_hw, align_corners: bool) -> jnp.ndarray:
    """Resize NHWC (or HWC) ``x`` to ``out_hw`` with torch bilinear semantics.

    Two MXU matmuls: rows then columns. f32 accumulation regardless of input
    dtype; result cast back to ``x.dtype``.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return x[0] if squeeze else x
    dtype = x.dtype
    ah = interp_matrix(h, oh, align_corners)
    aw = interp_matrix(w, ow, align_corners)
    y = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32),
                   precision="highest")
    y = jnp.einsum("pw,bowc->bopc", aw, y, precision="highest")
    y = y.astype(dtype)
    return y[0] if squeeze else y


def resize_align_corners(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    return resize_bilinear(x, out_hw, align_corners=True)


def gather_bilinear_align_corners(
    feat: jnp.ndarray, coords_yx: jnp.ndarray, full_hw
) -> jnp.ndarray:
    """Evaluate the align-corners bilinear upsampling of ``feat`` at sparse
    full-resolution integer pixel coordinates, without materialising the
    upsampled map.

    Equivalent (exactly, by linearity) to
    ``resize_align_corners(feat, full_hw)[..., y, x, :]``, but O(K) gathers
    on the low-res map. This is the core trick of the sparse-label train
    step: the reference upsamples B×C×H×W logits to input resolution and
    takes cross-entropy at <=100 labelled pixels per image
    (``deeplab.py:55``, ``model.py:108-116``); we gather instead.

    Args:
      feat: (B, h, w, C) low-resolution features.
      coords_yx: (B, K, 2) int32 pixel coordinates in the full-res frame.
      full_hw: (H, W) full resolution.

    Returns:
      (B, K, C) interpolated features, f32.
    """
    bsz, h, w, _ = feat.shape
    big_h, big_w = int(full_hw[0]), int(full_hw[1])
    feat = feat.astype(jnp.float32)

    def src(d, in_size, out_size):
        if out_size == 1 or in_size == out_size:
            scale = 1.0 if in_size == out_size else 0.0
        else:
            scale = (in_size - 1) / (out_size - 1)
        s = d.astype(jnp.float32) * scale
        lo = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, max(in_size - 2, 0))
        frac = s - lo.astype(jnp.float32)
        return lo, frac

    ylo, yfrac = src(coords_yx[..., 0], h, big_h)  # (B, K)
    xlo, xfrac = src(coords_yx[..., 1], w, big_w)

    def take(yy, xx):
        flat = feat.reshape(bsz, h * w, -1)
        idx = yy * w + xx  # (B, K)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    yhi = jnp.minimum(ylo + 1, h - 1)
    xhi = jnp.minimum(xlo + 1, w - 1)
    f00 = take(ylo, xlo)
    f01 = take(ylo, xhi)
    f10 = take(yhi, xlo)
    f11 = take(yhi, xhi)
    wy = yfrac[..., None]
    wx = xfrac[..., None]
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def gather_bilinear_matmul(
    feat: jnp.ndarray, coords_yx: jnp.ndarray, full_hw
) -> jnp.ndarray:
    """Same contract as :func:`gather_bilinear_align_corners`, computed as a
    one-hot selection **matmul** instead of gathers.

    Rationale: under autodiff, a gather's backward is a scatter-add — one of
    the slowest patterns on TPU. Here the 4 bilinear taps become a sparse
    row-selection matrix built by broadcasted equality (no scatter), applied
    with one ``(K, hw) @ (hw, C)`` contraction per image on the MXU; the
    backward of a matmul is a matmul. K and hw are small (<=128, ~10k), so
    the dense one-hot costs ~B*K*hw compares + a tiny matmul.
    """
    bsz, h, w, c = feat.shape
    big_h, big_w = int(full_hw[0]), int(full_hw[1])
    k = coords_yx.shape[1]

    def src(d, in_size, out_size):
        if out_size == 1 or in_size == out_size:
            scale = 1.0 if in_size == out_size else 0.0
        else:
            scale = (in_size - 1) / (out_size - 1)
        s = d.astype(jnp.float32) * scale
        lo = jnp.clip(jnp.floor(s).astype(jnp.int32), 0, max(in_size - 2, 0))
        frac = s - lo.astype(jnp.float32)
        return lo, frac

    ylo, yfrac = src(coords_yx[..., 0], h, big_h)  # (B, K)
    xlo, xfrac = src(coords_yx[..., 1], w, big_w)
    yhi = jnp.minimum(ylo + 1, h - 1)
    xhi = jnp.minimum(xlo + 1, w - 1)
    wy = yfrac
    wx = xfrac

    # separable selection: bilinear weights factor into row x col one-hots
    # (2 nonzeros each), so intermediates stay (B,K,h)/(B,K,w) instead of
    # (B,K,h*w)
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    sel_y = ((rows[None, None, :] == ylo[..., None]) * (1 - wy)[..., None]
             + (rows[None, None, :] == yhi[..., None]) * wy[..., None])
    sel_x = ((cols[None, None, :] == xlo[..., None]) * (1 - wx)[..., None]
             + (cols[None, None, :] == xhi[..., None]) * wx[..., None])
    # degenerate h==1 (or lo==hi at the border): ylo == yhi makes both
    # equality terms hit the same row; weights still sum to 1
    feat32 = feat.astype(jnp.float32)
    tmp = jnp.einsum("bkh,bhwc->bkwc", sel_y.astype(jnp.float32), feat32)
    return jnp.einsum("bkw,bkwc->bkc", sel_x.astype(jnp.float32), tmp)
