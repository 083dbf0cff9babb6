"""Device-resident augmentation pipeline invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pixelpick_tpu.data.device_pipeline import (
    warp_sample, photometric_device, sparse_coords_device, _sample_geometry,
)


def _identity_geom(h, w):
    return (jnp.float32(1.0), jnp.int32(h), jnp.int32(w),
            jnp.int32(0), jnp.int32(0), jnp.bool_(False))


def test_warp_identity_is_exact():
    rng = np.random.default_rng(0)
    h, w = 24, 32
    x = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    y = rng.integers(0, 11, (h, w)).astype(np.int32)
    q = rng.random((h, w)) < 0.05
    xa, ya, qa = warp_sample(jnp.asarray(x), jnp.asarray(y), jnp.asarray(q),
                             (h, w), _identity_geom(h, w),
                             mean_fill=(0, 0, 0), ignore_index=11)
    np.testing.assert_allclose(np.asarray(xa), x.astype(np.float32), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ya), y)
    np.testing.assert_array_equal(np.asarray(qa), q)


def test_warp_flip():
    h, w = 8, 10
    y = np.arange(h * w).reshape(h, w).astype(np.int32)
    geom = (jnp.float32(1.0), jnp.int32(h), jnp.int32(w),
            jnp.int32(0), jnp.int32(0), jnp.bool_(True))
    _, ya, _ = warp_sample(jnp.zeros((h, w, 3), jnp.uint8), jnp.asarray(y),
                           jnp.zeros((h, w), bool), (h, w), geom,
                           mean_fill=(0, 0, 0), ignore_index=99)
    np.testing.assert_array_equal(np.asarray(ya), y[:, ::-1])


def test_warp_pad_region_fills():
    """Small source scaled below crop size: the pad region must be mean/ignore
    filled and the query mask False there (base_dataset.py:73-88)."""
    h, w = 8, 8
    ch, cw = 16, 16
    geom = (jnp.float32(1.0), jnp.int32(h), jnp.int32(w),
            jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    x = np.full((h, w, 3), 100, np.uint8)
    y = np.zeros((h, w), np.int32)
    q = np.ones((h, w), bool)
    xa, ya, qa = warp_sample(jnp.asarray(x), jnp.asarray(y), jnp.asarray(q),
                             (ch, cw), geom, mean_fill=(7, 8, 9),
                             ignore_index=11)
    assert np.asarray(ya)[10, 10] == 11
    assert not np.asarray(qa)[10:, 10:].any()
    np.testing.assert_allclose(np.asarray(xa)[12, 12], [7, 8, 9])
    np.testing.assert_allclose(np.asarray(xa)[4, 4], [100, 100, 100])


def test_warp_query_pixels_keep_their_labels():
    """Co-transform invariant (same as the host pipeline test): after a random
    warp, y at every surviving query location equals the source label of the
    pixel that landed there."""
    rng = np.random.default_rng(1)
    h, w = 24, 32
    ch, cw = 16, 20
    y = rng.integers(0, 11, (h, w)).astype(np.int32)
    code = np.arange(h * w, dtype=np.int32).reshape(h, w)
    q = rng.random((h, w)) < 0.2
    for seed in range(5):
        geom = _sample_geometry(jax.random.PRNGKey(seed), (h, w), (ch, cw),
                                {"random_scale": True, "crop": True,
                                 "random_hflip": True})
        _, ya, qa = warp_sample(jnp.zeros((h, w, 3), jnp.uint8),
                                jnp.asarray(y), jnp.asarray(q), (ch, cw),
                                geom, mean_fill=(0, 0, 0), ignore_index=99)
        _, ca, qa2 = warp_sample(jnp.zeros((h, w, 3), jnp.uint8),
                                 jnp.asarray(code), jnp.asarray(q), (ch, cw),
                                 geom, mean_fill=(0, 0, 0), ignore_index=-7)
        np.testing.assert_array_equal(np.asarray(qa), np.asarray(qa2))
        ys, xs = np.nonzero(np.asarray(qa))
        for yy, xx in zip(ys, xs):
            c = int(np.asarray(ca)[yy, xx])
            assert c != -7
            src = np.unravel_index(c, (h, w))
            assert q[src]
            assert int(np.asarray(ya)[yy, xx]) == y[src]


@pytest.mark.parametrize("rs", [0.5, 0.7, 1.3, 2.0])
def test_warp_scale_matches_pil_bilinear(rs):
    """The image path of the warp must reproduce PIL BILINEAR resizes —
    including the *antialiased* downscale (triangle support widens with
    1/scale), which the host pipeline gets from PIL (augment.py:_resize).
    PIL quantises filter coefficients, so allow ~1 uint8 level."""
    from PIL import Image

    rng = np.random.default_rng(3)
    h, w = 40, 56
    x = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    sh, sw = int(h * rs), int(w * rs)
    ref = np.asarray(Image.fromarray(x).resize((sw, sh), Image.BILINEAR),
                     dtype=np.float32)

    geom = (jnp.float32(rs), jnp.int32(sh), jnp.int32(sw),
            jnp.int32(0), jnp.int32(0), jnp.bool_(False))
    xa, _, _ = warp_sample(jnp.asarray(x),
                           jnp.zeros((h, w), jnp.int32),
                           jnp.zeros((h, w), bool), (sh, sw), geom,
                           mean_fill=(0, 0, 0), ignore_index=99)
    np.testing.assert_allclose(np.asarray(xa), ref, atol=1.5)


def test_photometric_stays_in_range_and_is_stochastic():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (16, 16, 3)).astype(np.float32))
    outs = [np.asarray(photometric_device(x, jax.random.PRNGKey(s),
                                          blur_kernel=3))
            for s in range(4)]
    for o in outs:
        assert o.min() >= 0 and o.max() <= 255
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


def test_sparse_coords_device_matches_host():
    from pixelpick_tpu.data.base import extract_sparse_labels

    rng = np.random.default_rng(2)
    q = rng.random((12, 16)) < 0.1
    y = rng.integers(0, 12, (12, 16)).astype(np.int32)  # 11 == ignore
    coords, labels, valid, over = sparse_coords_device(
        jnp.asarray(q), jnp.asarray(y), ignore_index=11, k_max=32)
    coords, labels, valid = map(np.asarray, (coords, labels, valid))
    hc, hl, hv = extract_sparse_labels(q, y, 11, 32)
    assert valid.sum() == hv.sum()
    got = {(int(cy), int(cx)) for (cy, cx), v in zip(coords, valid) if v}
    want = {(int(cy), int(cx)) for (cy, cx), v in zip(hc, hv) if v}
    assert got == want
    assert int(over) == 0  # k_max has headroom here

    # k_max too small: top-k DROPS labelled pixels; the kernel reports
    # exactly how many (the host path warns + bumps SPARSE_OVERFLOW_COUNT
    # for the same event — the device path must not truncate silently)
    n_q = int(q.sum())
    *_, over2 = sparse_coords_device(jnp.asarray(q), jnp.asarray(y),
                                     ignore_index=11, k_max=2)
    assert int(over2) == n_q - 2


def test_pipeline_batch_reports_overflow(tmp_path):
    """sample_batch carries a replicated scalar 'overflow' the driver
    drains per epoch; with adequate k_max it is 0, with a starved k_max it
    counts the dropped labelled pixels."""
    from tests.helpers import synthetic_args
    from pixelpick_tpu.data import get_dataset
    from pixelpick_tpu.data.device_pipeline import DevicePipeline

    args = synthetic_args(tmp_path, n_pixels_by_us=6, device_augment=True)
    ds = get_dataset(args)
    ds.crop_size = (48, 64)
    pipe = DevicePipeline(ds, args)
    pipe.set_queries(ds.queries)
    b = pipe.sample_batch(np.array([0, 1]), jax.random.PRNGKey(0))
    assert int(b["overflow"]) == 0

    starved = DevicePipeline(ds, args, k_max=1)
    starved.set_queries(ds.queries)
    b2 = starved.sample_batch(np.array([0, 1]), jax.random.PRNGKey(0))
    assert int(b2["overflow"]) > 0


def test_e2e_round_with_device_augment(tmp_path):
    from tests.helpers import synthetic_args
    from pixelpick_tpu.active.driver import ALModel

    args = synthetic_args(tmp_path, n_pixels_by_us=4, max_budget=8,
                          n_epochs=1, device_augment=True)
    model = ALModel(args)
    model.dataset.crop_size = (48, 64)
    # pipeline captured crop size at construction; rebuild with the right one
    from pixelpick_tpu.data.device_pipeline import DevicePipeline
    model.device_pipe = DevicePipeline(model.dataset, args)
    model()
    # init + rounds 0 and 1 (the final round labels too, model.py:82-87)
    assert model.dataset.n_pixels_total == 8 * 4 * 3


def test_variable_size_staging_voc(tmp_path):
    """VOC through the device pipeline: variable-size sources staged padded
    with per-image true sizes; the warp never samples the pad region and
    sparse labels stay inside the crop."""
    from tests.test_datasets_cs_voc import _make_voc
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.data.voc import VOC2012Segmentation
    from pixelpick_tpu.data.device_pipeline import DevicePipeline
    import os

    root = _make_voc(str(tmp_path / "voc"))
    args = default_args("voc", dir_dataset=root,
                        dir_checkpoints=str(tmp_path / "ck"),
                        n_pixels_by_us=6, size_base=100, size_crop=64,
                        batch_size=3, device_augment=True)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    ds = VOC2012Segmentation(args)
    pipe = DevicePipeline(ds, args)
    pipe.set_queries(ds.queries)

    assert pipe.variable_size
    # staging is padded to the max base-resized extent
    assert pipe.images.shape[1:3] == (100, 100)
    hw = np.asarray(pipe.hw)
    for i, q in enumerate(ds.queries):
        assert tuple(hw[i]) == q.shape

    batch = pipe.sample_batch(np.array([0, 1, 2]), jax.random.PRNGKey(7))
    assert batch["x"].shape == (3, 64, 64, 3)
    x = np.asarray(batch["x"])
    assert np.isfinite(x).all()
    coords = np.asarray(batch["coords"])
    valid = np.asarray(batch["valid"])
    labels = np.asarray(batch["labels"])
    assert (coords >= 0).all() and (coords < 64).all()
    assert valid.shape == labels.shape
    # every valid sparse label is a real class (pad labels are ignore=255)
    assert (labels[valid] >= 0).all() and (labels[valid] < args.n_classes).all()
    # determinism: same key -> same batch
    b2 = pipe.sample_batch(np.array([0, 1, 2]), jax.random.PRNGKey(7))
    np.testing.assert_allclose(x, np.asarray(b2["x"]), atol=1e-6)
    # different key -> different augmentation
    b3 = pipe.sample_batch(np.array([0, 1, 2]), jax.random.PRNGKey(8))
    assert not np.allclose(x, np.asarray(b3["x"]))


def test_cityscapes_staging(tmp_path):
    """Cityscapes (downsample cache, uniform shapes) stages through the
    fixed-size device-pipeline path."""
    from tests.test_datasets_cs_voc import _make_cityscapes
    from pixelpick_tpu.config import default_args
    import pixelpick_tpu.data.cityscapes as cs_mod
    from pixelpick_tpu.data.device_pipeline import DevicePipeline
    import os

    root = _make_cityscapes(str(tmp_path / "cityscapes"), hw=(64, 128))
    args = default_args("cs", dir_dataset=root,
                        dir_checkpoints=str(tmp_path / "ck"),
                        n_pixels_by_us=5, downsample=4, device_augment=True)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    ds = cs_mod.CityscapesDataset(args)
    ds.crop_size = (16, 32)  # synthetic images are 16x32 after d4
    pipe = DevicePipeline(ds, args)
    pipe.set_queries(ds.queries)
    assert not pipe.variable_size and pipe.hw is None

    batch = pipe.sample_batch(np.array([0, 1]), jax.random.PRNGKey(3))
    assert batch["x"].shape == (2, 16, 32, 3)
    labels = np.asarray(batch["labels"])
    valid = np.asarray(batch["valid"])
    assert (labels[valid] >= 0).all() and (labels[valid] < args.n_classes).all()
