"""Space-to-depth (s2d) rewrite of the early MobileNetV2 blocks — exact.

Why: the backbone's first blocks run at 180x240/90x120 with 16-96 channels.
TPU VMEM tiles are (8 sublanes, 128 lanes) with channels minor, so a C=16
tensor wastes 7/8 of every lane — measured ~3-4x over the bandwidth
roofline, making blocks 0-2 cost 35 of the 108 ms train step
(scripts/perf_backbone.py). s2d(2) packs each 2x2 spatial cell into
channels (C -> 4C), filling the lanes, and every op of an inverted
residual block has an EXACT, FLOP-neutral s2d-space equivalent:

- 1x1 conv  -> phase-batched matmul (``conv_s2d_1x1``): reshape
  (B,h,w,4,C) and contract C — the 4 phases are independent batch rows,
  so the MXU sees a 4x-taller, lane-dense matmul at the ORIGINAL FLOP
  count (a first attempt lowered this to a dense (4C,4C) block-diagonal
  matmul: 4x the FLOPs — see git history);
- depthwise 3x3 -> 9 shifted multiply-adds per output phase
  (``conv_s2d_dw``): out phase p at cell (i,j) sums
  w[ky,kx] * x[phase q(k,p), cell (i,j)+s(k,p)] with (s, q) from
  ``_tap_map``. Each tap is a static slice of the (cell-)padded tensor —
  lane-dense VPU work at exactly 9 MACs per output pixel, the original
  depthwise cost (the first attempt's dense (3,3,4C,4C) cell kernels
  cost 16*C times that and lost to XLA's grouped conv);
- BatchNorm -> phase-grouped moments (the 4 phase channels of one
  original channel share statistics — same value set, bit-comparable up
  to f32 reduction order; see models/s2d_block.py:_S2DBNCore);
- the reference's fixed_padding-before-the-block (mobilenet_v2.py:60-61)
  is reproduced exactly: pad taps read the zero cell-padding, BN moments
  are computed with the PADDED pixel count (the rim contributes zeros to
  the sums), and the depthwise taps that read the rim's relu6(BN(0))
  values are restored by a rank-1 border-correction term (rho * M,
  ``border_weight_map``).

Layout convention (PHASE-major): s2d channel index = (py*2 + px)*C + c,
so phase q of all channels is the contiguous lane block [q*C, (q+1)*C) —
sliceable without lane interleaving — and a reshape (..., 4, C) exposes
the phase axis that the phase-grouped BN and the 1x1 matmul batch over.

All ops are plain jnp/lax, so autodiff gives the exact backward pass:
slice transposes to pad, and the depthwise wgrad is 36 fused reductions.

MEASURED VERDICT (TPU v5e, full bs48 bf16 train step, perf_probe.py):
base 108 ms, s2d dense cell kernels 128 ms, this FLOP-neutral form
148 ms. The lane-utilisation win never materialises: the 9 shifted
tap reads (and their transposed pads in the backward) re-read the
activation tensor from HBM per tap, where XLA's grouped conv keeps a
sliding window in VMEM. The path stays correct, tested, and OPT-IN
(--s2d_backbone) as a record of the experiment; XLA remains the default.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def to_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major ((py*2+px)*C + c)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h2, w2, py, px, c
    return x.reshape(b, h // 2, w // 2, 4 * c)


def from_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_s2d`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h2, py, w2, px, c
    return x.reshape(b, h2 * 2, w2 * 2, c)


def rep_phase(v: jnp.ndarray) -> jnp.ndarray:
    """Per-original-channel vector (..., C) -> phase-major (..., 4C)."""
    return jnp.concatenate([v, v, v, v], axis=-1)


def conv_s2d_1x1(x_s2d: jnp.ndarray, w: jnp.ndarray,
                 precision=None) -> jnp.ndarray:
    """Pointwise conv in s2d space: (B,h,w,4Cin) x (Cin,Cout) -> 4Cout.

    Phase-batched: the original FLOP count, on a 4x-taller matmul.
    """
    b, h2, w2, _ = x_s2d.shape
    cin, cout = w.shape
    z = x_s2d.reshape(b, h2, w2, 4, cin)
    y = jnp.einsum("bhwpc,co->bhwpo", z, w, precision=precision)
    return y.reshape(b, h2, w2, 4 * cout)


def _tap_map(p: int, k: int):
    """1-D: original tap position p+k-1 -> (cell shift s, phase q)."""
    pos = p + k - 1
    return pos // 2, pos % 2  # Python floor semantics for pos = -1


def conv_s2d_dw(x_s2d: jnp.ndarray, w: jnp.ndarray,
                stride: int) -> jnp.ndarray:
    """Depthwise 3x3 (fixed_padding semantics) in s2d space — FLOP-exact.

    stride 1: (B,h,w,4C) -> (B,h,w,4C) (s2d layout);
    stride 2: (B,h,w,4C) -> (B,h,w,C)  (normal layout — the s2 output grid
    is the cell grid). The zero cell-padding IS the fixed_padding rim; add
    the rho*M border correction (``border_weight_map``) when the rim
    carries nonzero values. ``w`` is the (3, 3, C) depthwise kernel.
    """
    b, h2, w2, c4 = x_s2d.shape
    c = c4 // 4
    # cell padding: 1 before each dim always; 1 after only for stride 1
    # (stride-1 output phases py=1 reach cell +1, stride-2 taps reach -1..0)
    after = 1 if stride == 1 else 0
    xp = jnp.pad(x_s2d, ((0, 0), (1, after), (1, after), (0, 0)))

    def tap(sy, sx, qy, qx):
        q = qy * 2 + qx
        return lax.slice(xp, (0, 1 + sy, 1 + sx, q * c),
                         (b, 1 + sy + h2, 1 + sx + w2, (q + 1) * c))

    def phase_out(py, px):
        acc = None
        for ky in range(3):
            sy, qy = _tap_map(py, ky)
            for kx in range(3):
                sx, qx = _tap_map(px, kx)
                term = w[ky, kx][None, None, None, :] * tap(sy, sx, qy, qx)
                acc = term if acc is None else acc + term
        return acc

    if stride == 1:
        return jnp.concatenate(
            [phase_out(py, px) for py in range(2) for px in range(2)],
            axis=-1)
    return phase_out(0, 0)


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
