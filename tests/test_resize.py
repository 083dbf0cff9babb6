"""Bilinear resize parity against torch.nn.functional.interpolate — the
number-one ranked 'hard part' for mIoU parity (SURVEY.md §7)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from pixelpick_tpu.ops.resize import (
    resize_bilinear, gather_bilinear_align_corners,
)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((23, 30), (90, 120)),   # 1/16 -> 1/4 (ASPP -> low-level concat)
    ((90, 120), (360, 480)), # 1/4 -> input (final logits upsample)
    ((1, 1), (23, 30)),      # GAP branch broadcast (aspp.py:70)
    ((45, 60), (23, 30)),    # downscale
    ((8, 8), (16, 16)),      # FPN scale_factor=2
])
def test_matches_torch_bilinear(align, in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 5)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    theirs = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=align,
    ).permute(0, 2, 3, 1).numpy()
    # f32 matmul accumulation differs from torch's per-pixel lerp by ~4e-5
    # on large outputs; values near zero make relative checks meaningless
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_identity_resize_is_noop():
    x = jnp.arange(24.0).reshape(1, 2, 3, 4)
    np.testing.assert_array_equal(np.asarray(resize_bilinear(x, (2, 3), True)), np.asarray(x))


def test_gather_equals_upsample_then_index():
    """Sparse gather-interpolation == dense upsample + indexing (by linearity).

    This is the correctness guarantee of the sparse-label train loss: gathering
    logits at labelled coordinates equals the reference's upsample-then-CE
    (model.py:108-116 + deeplab.py:55)."""
    rng = np.random.default_rng(1)
    feat = rng.standard_normal((2, 23, 30, 7)).astype(np.float32)
    full_hw = (360, 480)
    k = 50
    ys = rng.integers(0, full_hw[0], (2, k))
    xs = rng.integers(0, full_hw[1], (2, k))
    coords = np.stack([ys, xs], axis=-1).astype(np.int32)

    dense = np.asarray(resize_bilinear(jnp.asarray(feat), full_hw, align_corners=True))
    expected = np.stack([dense[b, ys[b], xs[b]] for b in range(2)])

    sparse = np.asarray(gather_bilinear_align_corners(
        jnp.asarray(feat), jnp.asarray(coords), full_hw))
    np.testing.assert_allclose(sparse, expected, rtol=1e-4, atol=1e-4)


def test_gather_also_matches_torch_directly():
    rng = np.random.default_rng(2)
    feat = rng.standard_normal((1, 12, 16, 3)).astype(np.float32)
    full_hw = (48, 64)
    up = F.interpolate(torch.from_numpy(feat).permute(0, 3, 1, 2), size=full_hw,
                       mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
    ys = rng.integers(0, 48, (1, 20)); xs = rng.integers(0, 64, (1, 20))
    coords = np.stack([ys, xs], -1).astype(np.int32)
    got = np.asarray(gather_bilinear_align_corners(jnp.asarray(feat),
                                                   jnp.asarray(coords), full_hw))
    np.testing.assert_allclose(got[0], up[0, ys[0], xs[0]], rtol=1e-5, atol=1e-5)
