"""Space-to-depth (s2d) rewrite of the early MobileNetV2 blocks — exact.

Why: the backbone's first blocks run at 180x240/90x120 with 16-96 channels.
TPU VMEM tiles are (8 sublanes, 128 lanes) with channels minor, so a C=16
tensor wastes 7/8 of every lane — measured ~3-4x over the bandwidth
roofline, making blocks 0-2 cost 35 of the 108 ms train step
(scripts/perf_backbone.py). s2d(2) packs each 2x2 spatial cell into
channels (C -> 4C), filling the lanes, and every op of an inverted
residual block has an EXACT s2d-space equivalent:

- 1x1 conv  -> block-diagonal dense matmul over 4C channels
  (``dense_1x1_kernel``: K[(c,p),(o,q)] = W[c,o] * delta(p,q));
- depthwise 3x3 stride-1 -> dense 3x3 "cell conv" over 4C channels
  (``dw_s1_cell_kernel``); stride-2 -> dense 2x2 cell conv emitting the
  normal layout (``dw_s2_cell_kernel``). The dense kernels are mostly
  structural zeros — irrelevant, the MXU is otherwise idle here, and a
  dense 128-wide conv is the fastest thing this hardware does;
- BatchNorm -> phase-grouped moments (4 consecutive channels per original
  channel in the c-major layout share statistics — same value set,
  bit-comparable up to f32 reduction order);
- the reference's fixed_padding-before-the-block (mobilenet_v2.py:60-61)
  is reproduced exactly: pad taps appear as structural zeros in the cell
  kernels, BN moments are computed with the PADDED pixel count (the rim
  contributes zeros to the sums), and the depthwise taps that read the
  rim's relu6(BN(0)) values are restored by a rank-1 border-correction
  term (rho * M, ``border_weight_map``).

Layout convention (c-major): s2d channel index = c*4 + (py*2 + px), so a
reshape (..., C, 4) groups the 4 phases of one original channel — which is
what the phase-grouped BN reduces over.

All builders are differentiable in the weights: gradients reach the
original (3,3,C)/(Cin,Cout) parameters through the scatter/einsum
construction, so the backward pass is dense-conv wgrads + cheap gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), c-major (c*4 + py*2 + px)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h2, w2, c, py, px
    return x.reshape(b, h // 2, w // 2, c * 4)


def from_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_s2d`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h2, py, w2, px, c
    return x.reshape(b, h2 * 2, w2 * 2, c)


def dense_1x1_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """1x1-conv weights (Cin, Cout) -> s2d matmul kernel (4Cin, 4Cout)."""
    cin, cout = w.shape
    eye = jnp.eye(4, dtype=w.dtype)
    k = jnp.einsum("co,pq->cpoq", w, eye)
    return k.reshape(4 * cin, 4 * cout)


def _tap_map(p: int, k: int):
    """1-D: original tap position p+k-1 -> (cell shift s, phase q)."""
    pos = p + k - 1
    return pos // 2, pos % 2  # Python floor semantics for pos = -1


def dw_s1_cell_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise (3,3,C) -> dense s2d cell kernel (3,3,4C,4C).

    Cell conv with SAME padding (1,1): out phase (py,px) of channel c at
    cell (i,j) sums w[ky,kx,c] * x[phase q, cell i+s] with (s, q) from
    ``_tap_map``; structural zeros elsewhere.
    """
    c = w.shape[-1]
    z = jnp.zeros((3, 3, 4, 4, c), w.dtype)
    for py in range(2):
        for px in range(2):
            for ky in range(3):
                for kx in range(3):
                    sy, qy = _tap_map(py, ky)
                    sx, qx = _tap_map(px, kx)
                    z = z.at[sy + 1, sx + 1, qy * 2 + qx,
                             py * 2 + px, :].add(w[ky, kx, :])
    eye = jnp.eye(c, dtype=w.dtype)
    k = jnp.einsum("ijqpc,cd->ijcqdp", z, eye)
    return k.reshape(3, 3, 4 * c, 4 * c)


def dw_s2_cell_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Depthwise (3,3,C) stride-2 -> dense cell kernel (2,2,4C,C).

    Cell conv stride 1, padding ((1,0),(1,0)), output in NORMAL layout
    (the stride-2 output grid coincides with the cell grid).
    """
    c = w.shape[-1]
    z = jnp.zeros((2, 2, 4, c), w.dtype)
    for ky in range(3):
        for kx in range(3):
            sy, qy = _tap_map(0, ky)
            sx, qx = _tap_map(0, kx)
            z = z.at[sy + 1, sx + 1, qy * 2 + qx, :].add(w[ky, kx, :])
    eye = jnp.eye(c, dtype=w.dtype)
    k = jnp.einsum("ijqc,cd->ijcqd", z, eye)
    return k.reshape(2, 2, 4 * c, c)


def conv_s2d_1x1(x_s2d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pointwise conv in s2d space: (B,h,w,4Cin) x (Cin,Cout) -> 4Cout."""
    k = dense_1x1_kernel(w)
    return jnp.einsum("bhwi,io->bhwo", x_s2d, k)


def conv_s2d_dw(x_s2d: jnp.ndarray, w: jnp.ndarray,
                stride: int) -> jnp.ndarray:
    """Depthwise 3x3 (fixed_padding semantics) in s2d space.

    stride 1: (B,h,w,4C) -> (B,h,w,4C) (s2d layout);
    stride 2: (B,h,w,4C) -> (B,h,w,C)  (normal layout — the s2 output grid
    is the cell grid). Pad taps are structural zeros; add the rho*M border
    correction (``border_weight_map``) when the rim carries nonzero values.
    """
    if stride == 1:
        k = dw_s1_cell_kernel(w)
        pad = ((1, 1), (1, 1))
    else:
        k = dw_s2_cell_kernel(w)
        pad = ((1, 0), (1, 0))
    return lax.conv_general_dilated(
        x_s2d, k, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def border_weight_map(w: jnp.ndarray, hw, stride: int) -> jnp.ndarray:
    """Per-position sum of depthwise-kernel weights whose tap falls on the
    fixed_padding rim of an (hw) input — (1, H_out, W_out, C).

    The reference pads the BLOCK input, so for t>1 blocks the depthwise
    conv's rim taps read relu6(BN(0)) = rho (not zero). The s2d cell conv
    treats the rim as zero; adding ``rho * border_weight_map`` restores the
    exact values. Computed as total_kernel_weight - conv(ones) (taps inside
    the real region cancel), so edge/corner asymmetry is automatic.
    """
    h, w_ = hw
    ones = jnp.ones((1, h, w_, w.shape[-1]), w.dtype)
    # fixed_padding for k=3, d=1 is (1,1)/(1,1) (layers.fixed_padding_amounts)
    inside = lax.conv_general_dilated(
        jnp.pad(ones, ((0, 0), (1, 1), (1, 1), (0, 0))),
        w[:, :, None, :], (stride, stride), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=w.shape[-1])
    total = w.sum((0, 1))
    return total[None, None, None, :] - inside
