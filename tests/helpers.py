"""Shared test fixtures: a synthetic CamVid-shaped dataset on disk."""

import os

import numpy as np
from PIL import Image


def make_synthetic_camvid(root, n_train=8, n_test=4, hw=(48, 64), n_classes=11,
                          seed=0):
    rng = np.random.default_rng(seed)
    for mode, n in (("train", n_train), ("test", n_test)):
        os.makedirs(f"{root}/{mode}", exist_ok=True)
        os.makedirs(f"{root}/{mode}annot", exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
            # piecewise-constant labels so training has learnable structure
            lab = np.zeros(hw, np.uint8)
            lab[:, hw[1] // 2:] = rng.integers(1, n_classes)
            lab[hw[0] // 2:, : hw[1] // 2] = rng.integers(1, n_classes)
            lab[0, 0] = n_classes  # a void pixel
            Image.fromarray(img).save(f"{root}/{mode}/{i:03d}.png")
            Image.fromarray(lab).save(f"{root}/{mode}annot/{i:03d}.png")
    return root


CLASS_COLOURS = np.array(
    [[(i * 23 + 11) % 256, (i * 97 + 64) % 256, (i * 151 + 128) % 256]
     for i in range(11)], dtype=np.int32)


def make_learnable_camvid(root, n_train=8, n_test=4, hw=(48, 64), n_classes=11,
                          seed=0, noise=8.0, grid=(4, 4),
                          confusable_delta=14.0):
    """Synthetic CamVid layout where class identity is recoverable from pixel
    colour: each pixel's RGB is its class's base colour plus Gaussian noise.

    Two properties make this an honest active-learning benchmark:

    - Labels tile the image with a random permutation of ALL classes (plus
      random extras), so every image has a near-identical class histogram —
      the model's global-context branch (ASPP image pooling) carries no
      image-identity signal and the only way to fit the labelled pixels
      across images is the local colour→class mapping, which transfers to
      val.
    - The last two classes are CONFUSABLE: their base colours differ by
      only ``confusable_delta`` per channel against ``noise``-sized jitter,
      so their colour distributions overlap. A trained model is genuinely
      low-margin on those tiles; margin sampling concentrates labels on
      that decision boundary while uniform-random spreads them — the
      textbook case where uncertainty sampling is more label-efficient."""
    rng = np.random.default_rng(seed)
    colours = CLASS_COLOURS.copy().astype(np.float64)
    colours[n_classes - 1] = colours[n_classes - 2] + confusable_delta
    gh, gw = grid
    th, tw = hw[0] // gh, hw[1] // gw
    for mode, n in (("train", n_train), ("test", n_test)):
        os.makedirs(f"{root}/{mode}", exist_ok=True)
        os.makedirs(f"{root}/{mode}annot", exist_ok=True)
        for i in range(n):
            classes = np.concatenate([
                rng.permutation(n_classes),
                rng.integers(0, n_classes, gh * gw - n_classes)])
            rng.shuffle(classes)
            lab = np.zeros(hw, np.uint8)
            for t, c in enumerate(classes):
                r, col = divmod(t, gw)
                lab[r * th:(r + 1) * th, col * tw:(col + 1) * tw] = c
            img = colours[lab] + rng.normal(0, noise, (*hw, 3))
            img = np.clip(img, 0, 255).astype(np.uint8)
            Image.fromarray(img).save(f"{root}/{mode}/{i:03d}.png")
            Image.fromarray(lab).save(f"{root}/{mode}annot/{i:03d}.png")
    return root


def synthetic_args(tmp_path, maker=None, **overrides):
    from pixelpick_tpu.config import default_args

    root = (maker or make_synthetic_camvid)(str(tmp_path / "camvid"))
    defaults = dict(
        dataset_name="cv",
        dir_dataset=root,
        dir_checkpoints=str(tmp_path / "ckpt"),
        n_pixels_by_us=5,
        max_budget=10,
        top_n_percent=0.05,
        batch_size=4,
        n_epochs=1,
        n_workers=2,
        pool_batch_size=4,
        debug=False,
    )
    defaults.update(overrides)
    args = default_args(write_files=False, **defaults)
    os.makedirs(args.dir_checkpoints, exist_ok=True)
    # the synthetic images are 48x64, not 360x480
    return args


def patch_crop_size(dataset, hw=(48, 64)):
    dataset.crop_size = hw
    return dataset
