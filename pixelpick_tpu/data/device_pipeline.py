"""Device-resident input pipeline (TPU-native, optional).

The reference's input pipeline is host-bound: PIL decode + augmentation in
dataloader workers, per-step host->device copies (``base_dataset.py:48-189``).
On TPU the accelerator outruns the host by orders of magnitude (measured:
the jitted train step sustains ~4000 imgs/s at bf16 while one host core
augments ~30 imgs/s), so this module moves the whole pipeline on device:

- the dataset (uniform-shape: CamVid, cached Cityscapes) is staged to HBM
  once as uint8 tensors (CamVid train = 190 MB);
- the reference's geometric augmentation (random scale U(0.5,2) -> pad ->
  random crop -> hflip) is re-expressed as a **fixed-shape inverse warp**:
  each output pixel gathers from a source coordinate computed from 4 random
  scalars per sample, so XLA sees static shapes. Labels/query masks use
  nearest taps; images use PIL-parity triangle-filter taps whose support
  widens with 1/scale — i.e. the same antialiased downscale PIL's BILINEAR
  applies — reducing to exact 2-tap bilinear on upscales (``_tap_weights``);
- photometric augmentation (colour jitter, grayscale, Gaussian blur) in
  pure jnp, vmapped with per-sample PRNG keys;
- sparse labelled-coordinate extraction (top-K over the augmented query
  mask) happens on device, producing the train step's (coords, labels,
  valid) directly.

Enabled with ``--device_augment``; the host loader remains the default (it
reproduces the reference's augmentation distribution exactly).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------- geometric warp ---------------------------

def _sample_geometry(key, src_hw, crop_hw, enabled):
    """Sample (rs, flip, top, left) reproducing base_dataset.py:48-127."""
    h, w = src_hw
    ch, cw = crop_hw
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if enabled.get("random_scale", True):
        rs = jax.random.uniform(k1, minval=0.5, maxval=2.0)
    else:
        rs = jnp.float32(1.0)
    sh = jnp.floor(h * rs).astype(jnp.int32)  # int(h*rs), torch truncation
    sw = jnp.floor(w * rs).astype(jnp.int32)
    if enabled.get("crop", True):
        ph = jnp.maximum(sh, ch)  # pad bottom/right to crop size
        pw = jnp.maximum(sw, cw)
        top = jax.random.randint(k2, (), 0, ph - ch + 1)
        left = jax.random.randint(k3, (), 0, pw - cw + 1)
    else:
        top = jnp.int32(0)
        left = jnp.int32(0)
    flip = (jax.random.uniform(k4) > 0.5) if enabled.get("random_hflip", True) \
        else jnp.bool_(False)
    return rs, sh, sw, top, left, flip


def _warp_coords(crop_hw, src_len, scaled_len, offset, coords_out):
    """Output index -> continuous source coordinate through scale+crop."""
    # position in the scaled image
    pos = coords_out.astype(jnp.float32) + offset.astype(jnp.float32)
    # scaled -> source (half-pixel mapping, torch/PIL bilinear convention)
    scale = src_len / scaled_len.astype(jnp.float32)
    return (pos + 0.5) * scale - 0.5, pos


def _tap_weights(u, src_len, fscale, n_taps=4):
    """PIL-style triangle-filter taps for one axis.

    PIL's BILINEAR resize antialiases downscales: the triangle filter's
    support scales with ``filterscale = max(1/scale, 1)`` and out-of-image
    taps are dropped with the remaining weights renormalised
    (Pillow ``precompute_coeffs``). For upscales (fscale==1) this reduces
    to exactly the classic 2-tap bilinear. fscale in [1, 2] (scale draws
    are U(0.5, 2.0)) needs taps floor(u)-1 .. floor(u)+2.

    Returns (idx (..., n_taps) int32 clipped, w (..., n_taps) normalised).
    """
    base = jnp.floor(u).astype(jnp.int32)
    offs = jnp.arange(-1, n_taps - 1, dtype=jnp.int32)
    idx = base[..., None] + offs
    dist = (idx.astype(jnp.float32) - u[..., None]) / fscale
    wt = jnp.maximum(0.0, 1.0 - jnp.abs(dist))
    wt = wt * ((idx >= 0) & (idx < src_len))   # drop out-of-image taps
    wt = wt / jnp.maximum(wt.sum(-1, keepdims=True), 1e-8)
    return jnp.clip(idx, 0, src_len - 1), wt


def warp_sample(x, y, q, crop_hw, rs_geom, *, mean_fill, ignore_index,
                src_hw=None):
    """Apply one sampled geometric transform to (x uint8, y int32, q bool).

    Returns x_f32 (ch,cw,3) with mean fill outside, y int32 (ignore fill),
    q bool (False fill).

    The warp is SEPARABLE — the source row coordinate depends only on the
    output row and the source column only on the output column (scale +
    crop + hflip are all axis-aligned) — so the image path is two
    interpolation-matrix matmuls (the MXU-native form ``ops/resize.py``
    uses), one per axis, built from the 1-D PIL-parity triangle taps. The
    earlier per-pixel form gathered a ``(ch, cw, 4, 4, 3)`` tap tensor;
    at batch scale XLA materialises it transposed with the tiny (4, 4)
    dims minor-most, and the TPU's (8, 128) tiled layout pads them 32-64x
    — a 50.9 GB allocation at bs48 360x480 (measured OOM). The matmul
    form peaks at the output image size.

    ``src_hw``: true (h, w) of the sample when the arrays are padded to a
    common staging shape (variable-size datasets, VOC) — may be traced.
    Taps are clipped to the true extent, so the pad region is never read
    (the one-hot matrices span the static staging extent; out-of-true-image
    taps carry zero weight).
    """
    h, w = (src_hw if src_hw is not None else x.shape[:2])
    sh_stage, sw_stage = x.shape[:2]  # static staging extent
    ch, cw = crop_hw
    rs, sh, sw, top, left, flip = rs_geom

    i1 = jnp.arange(ch, dtype=jnp.int32)
    j1 = jnp.arange(cw, dtype=jnp.int32)
    jj = jnp.where(flip, cw - 1 - j1, j1)

    u, pos_i = _warp_coords(crop_hw, h, sh, top, i1)   # (ch,)
    v, pos_j = _warp_coords(crop_hw, w, sw, left, jj)  # (cw,)
    inside = (pos_i < sh)[:, None] & (pos_j < sw)[None, :]

    # PIL-parity triangle taps: antialiased when downscaling (support
    # widens with 1/rs), exact 2-tap bilinear when upscaling
    fscale = jnp.maximum(1.0 / rs, 1.0)
    iu, wu = _tap_weights(u, h, fscale)        # (ch,4)
    iv, wv = _tap_weights(v, w, fscale)        # (cw,4)
    R = (jax.nn.one_hot(iu, sh_stage, dtype=jnp.float32)
         * wu[..., None]).sum(1)               # (ch, H)
    C = (jax.nn.one_hot(iv, sw_stage, dtype=jnp.float32)
         * wv[..., None]).sum(1)               # (cw, W)
    xf = x.astype(jnp.float32)
    # highest precision: keeps the matmul form bit-comparable to the old
    # gather-multiply form on TPU (default MXU precision quantizes the
    # 0-255 pixels to bf16); ~0.75 GFLOP/img — noise next to the step
    x_out = jnp.einsum("Sh,hwc->Swc", R, xf, precision="highest")
    x_out = jnp.einsum("Tw,Swc->STc", C, x_out, precision="highest")
    x_out = jnp.where(inside[..., None], x_out,
                      jnp.asarray(mean_fill, jnp.float32))

    # nearest taps for label / query mask (1-D per axis, outer-indexed)
    un = jnp.clip(jnp.round(u).astype(jnp.int32), 0, h - 1)  # (ch,)
    vn = jnp.clip(jnp.round(v).astype(jnp.int32), 0, w - 1)  # (cw,)
    y_out = jnp.where(inside, y[un][:, vn], ignore_index).astype(jnp.int32)
    q_out = jnp.where(inside, q[un][:, vn], False)
    return x_out, y_out, q_out


# --------------------------- photometric ---------------------------

def _rgb_to_gray(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])


def _adjust_hue(x, factor):
    """x in [0,255] f32; shift hue by factor (fraction of a turn)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    c = maxc - minc
    s = jnp.where(maxc > 0, c / jnp.maximum(maxc, 1e-8), 0.0)
    safe_c = jnp.maximum(c, 1e-8)
    hr = ((g - b) / safe_c) % 6.0
    hg = (b - r) / safe_c + 2.0
    hb = (r - g) / safe_c + 4.0
    hue = jnp.where(maxc == r, hr, jnp.where(maxc == g, hg, hb)) / 6.0
    hue = jnp.where(c == 0, 0.0, hue)
    hue = (hue + factor) % 1.0
    # hsv -> rgb
    i = jnp.floor(hue * 6.0)
    f = hue * 6.0 - i
    p = v * (1 - s)
    qq = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r_ = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [v, qq, p, p, t, v])
    g_ = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [t, v, v, qq, p, p])
    b_ = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [p, p, t, v, v, qq])
    return jnp.stack([r_, g_, b_], -1)


def photometric_device(x, key, *, jitter=(0.8, 0.8, 0.8, 0.2),
                       p_jitter=0.8, p_gray=0.2, blur_kernel=0,
                       enabled=None):
    """Per-sample photometric augs on a (ch,cw,3) f32 [0,255] image.

    Matches base_dataset.py:129-141 distributions: jitter factors, p=0.8
    apply, shuffled op order (torchvision ColorJitter semantics),
    grayscale p=0.2, blur p=0.5 sigma U(0.1,2).
    """
    enabled = enabled or {}
    kb, kc, ks, kh, kap, kg, kbl, kbs, kord = jax.random.split(key, 9)
    bf, cf, sf, hf = jitter

    if enabled.get("random_color_jitter", True):
        apply = jax.random.uniform(kap) < p_jitter
        f_b = jax.random.uniform(kb, minval=max(0, 1 - bf), maxval=1 + bf)
        f_c = jax.random.uniform(kc, minval=max(0, 1 - cf), maxval=1 + cf)
        f_s = jax.random.uniform(ks, minval=max(0, 1 - sf), maxval=1 + sf)
        f_h = jax.random.uniform(kh, minval=-hf, maxval=hf)

        def op_brightness(z):
            return jnp.clip(z * f_b, 0, 255)

        def op_contrast(z):
            gray_mean = jnp.mean(jnp.round(_rgb_to_gray(z)))
            return jnp.clip(z * f_c + (1 - f_c) * gray_mean, 0, 255)

        def op_saturation(z):
            gray = _rgb_to_gray(z)[..., None]
            return jnp.clip(z * f_s + (1 - f_s) * gray, 0, 255)

        def op_hue(z):
            if hf <= 0:
                return z
            return jnp.clip(_adjust_hue(z, f_h), 0, 255)

        # torchvision ColorJitter applies the enabled ops in a *shuffled*
        # order (host path: augment.py color_jitter rng.shuffle) — four
        # unrolled switches over a random permutation reproduce that
        ops = [op_brightness, op_contrast, op_saturation, op_hue]
        perm = jax.random.permutation(kord, 4)

        def jit_ops(z):
            for i in range(4):
                z = jax.lax.switch(perm[i], ops, z)
            return z

        x = jnp.where(apply, jit_ops(x), x)

    if enabled.get("random_grayscale", True):
        gray3 = jnp.broadcast_to(jnp.round(_rgb_to_gray(x))[..., None], x.shape)
        x = jnp.where(jax.random.uniform(kg) < p_gray, gray3, x)

    if enabled.get("random_gaussian_blur", True) and blur_kernel > 1:
        sigma = jax.random.uniform(kbs, minval=0.1, maxval=2.0)
        r = blur_kernel // 2
        t = jnp.arange(-r, r + 1, dtype=jnp.float32)
        g = jnp.exp(-(t ** 2) / (2 * sigma ** 2))
        g = g / g.sum()
        xp = jnp.pad(x, ((r, r), (0, 0), (0, 0)), mode="edge")
        xv = jnp.einsum("k,kijc->ijc", g, _shifted_stack(xp, blur_kernel, 0))
        xp2 = jnp.pad(xv, ((0, 0), (r, r), (0, 0)), mode="edge")
        xh = jnp.einsum("k,kijc->ijc", g, _shifted_stack(xp2, blur_kernel, 1))
        x = jnp.where(jax.random.uniform(kbl) < 0.5, xh, x)
    return x


def _shifted_stack(xp, k, axis):
    """k shifted views along ``axis`` stacked on a new leading axis."""
    n = xp.shape[axis] - k + 1
    slices = [jax.lax.slice_in_dim(xp, i, i + n, axis=axis) for i in range(k)]
    return jnp.stack(slices, 0)


# --------------------------- sparse extraction ---------------------------

def sparse_coords_device(q, y, ignore_index, k_max):
    """Device analogue of data/base.py:extract_sparse_labels: top-K positions
    of the (augmented) query mask -> (coords, labels, valid, overflow).

    ``overflow`` counts labelled pixels beyond ``k_max`` that top-k DROPPED —
    the host path warns and bumps ``base.SPARSE_OVERFLOW_COUNT`` for the
    same event (any overflow is a parity bug vs the reference's dense path,
    base.py); the driver drains this signal once per epoch alongside the
    losses so the production device path can't truncate labels silently."""
    ch, cw = q.shape
    flat = q.reshape(-1).astype(jnp.int32)
    _, idx = jax.lax.top_k(flat, k_max)
    picked = flat[idx] > 0
    ys = idx // cw
    xs = idx % cw
    labels = y[ys, xs].astype(jnp.int32)
    valid = picked & (labels != ignore_index)
    coords = jnp.stack([ys, xs], -1).astype(jnp.int32)
    overflow = jnp.maximum(flat.sum() - k_max, 0)
    return coords, labels, valid, overflow


# --------------------------- pipeline ---------------------------

class DevicePipeline:
    """Stage a uniform-shape dataset in HBM; produce augmented train batches
    with one jitted call per step.

    With a ``mesh``, the staged dataset is replicated across the devices
    (CamVid train is 190 MB — trivial) and the batch program's outputs are
    sharded on the leading axis over the ``('data',)`` mesh, so each device
    augments only its own batch shard and the train step consumes the batch
    in place — the production input path and data parallelism compose.
    """

    def _stage(self, arr):
        """Put a staging array in HBM. Multi-process: replicate it across
        the GLOBAL mesh (every process holds the identical host copy — the
        multi-host dataset contract) so the sharded batch program can
        consume it; single-process: a plain local device array."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import PartitionSpec as P

            from pixelpick_tpu.parallel.mesh import _put_global

            return _put_global(np.asarray(arr), self.mesh, P())
        return jnp.asarray(arr)

    def __init__(self, dataset, args, k_max: int | None = None, mesh=None):
        self.mesh = mesh
        # remainder batches pad to a multiple of lcm(pad_multiple, devices);
        # the driver sets pad_multiple to --micro_batch_size for megabatch
        # scans and pad_to_devices to (batch_size % n_devices == 0) — device
        # padding only when full batches shard, so bs<devices configs keep
        # their exact BN moments (see active/driver.py:_train_pad_multiple)
        self.pad_multiple = 1
        self.pad_to_devices = True
        n = len(dataset)
        self.variable_size = bool(getattr(dataset, "variable_size", False))
        # staging reads every image exactly once — don't let those reads
        # populate the dataset's host image/label caches (hundreds of MB
        # the device-augment path would pin but never read again)
        prev_cache = getattr(dataset, "cache_images", False)
        dataset.cache_images = False
        try:
            xs, ys = self._stack_dataset(dataset, n)
        finally:
            dataset.cache_images = prev_cache
        self.images = self._stage(xs)   # (N,H,W,3) uint8 in HBM
        self.labels = self._stage(ys)
        self.queries = None
        self.crop_hw = tuple(dataset.crop_size)
        self.k_max = int(k_max or dataset.k_max)
        self.ignore_index = dataset.ignore_index
        self.mean = np.asarray(args.mean, np.float32)
        self.std = np.asarray(args.std, np.float32)
        self.mean_fill = np.asarray(dataset.mean_fill, np.float32)
        geo = dict(dataset.geometric_augmentations)
        photo = dict(dataset.photometric_augmentations)
        blur_k = int((0.1 * min(self.crop_hw)) // 2 * 2 + 1) \
            if photo.get("random_gaussian_blur", True) else 0
        jitter = tuple(dataset.jitter)
        mean, std = self.mean, self.std
        mean_fill, ignore = self.mean_fill, self.ignore_index
        crop_hw, k_m = self.crop_hw, self.k_max

        def one(x, y, q, hw, key):
            kg, kp = jax.random.split(key)
            src_hw = x.shape[:2] if hw is None else (hw[0], hw[1])
            geom = _sample_geometry(kg, src_hw, crop_hw, geo)
            xa, ya, qa = warp_sample(x, y, q, crop_hw, geom,
                                     mean_fill=mean_fill, ignore_index=ignore,
                                     src_hw=None if hw is None else src_hw)
            xa = photometric_device(xa, kp, jitter=jitter,
                                    blur_kernel=blur_k, enabled=photo)
            xn = (xa / 255.0 - mean) / std
            coords, labels, valid, over = sparse_coords_device(
                qa, ya, ignore, k_m)
            return xn, coords, labels, valid, over

        def batch_impl(images, labels_, queries, indices, rng, n_real,
                       hws=None):
            keys = jax.random.split(rng, indices.shape[0])
            xb = images[indices]
            yb = labels_[indices]
            qb = queries[indices]
            if hws is None:
                xn, coords, lab, valid, over = jax.vmap(
                    lambda x, y, q, k: one(x, y, q, None, k))(xb, yb, qb, keys)
            else:
                xn, coords, lab, valid, over = jax.vmap(one)(
                    xb, yb, qb, hws[indices], keys)
            # remainder batches arrive padded to a device multiple with
            # duplicate indices (sample_batch): mask those rows out of the
            # loss/metrics (valid) and the overflow drain — n_real is a
            # traced scalar, so no recompile across remainder sizes
            rows = jnp.arange(indices.shape[0]) < n_real
            valid = valid & rows[:, None]
            # scalar (replicated) so the per-epoch drain costs one fetch
            return {"x": xn, "coords": coords, "labels": lab, "valid": valid,
                    "overflow": (over * rows).sum()}

        self._batch_fn = jax.jit(batch_impl)
        self._batch_fn_sharded = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from pixelpick_tpu.parallel.distributed import LockstepJit

            out = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            self._batch_fn_sharded = LockstepJit(jax.jit(
                batch_impl,
                out_shardings={"x": out, "coords": out, "labels": out,
                               "valid": out, "overflow": rep}),
                "pipe_sharded")
            if jax.process_count() > 1:
                # multi-process: the staged arrays are GLOBAL (replicated),
                # so the plain local jit can't consume them — remainder
                # batches fall back to replicated outputs instead
                self._batch_fn = LockstepJit(jax.jit(
                    batch_impl,
                    out_shardings={"x": rep, "coords": rep, "labels": rep,
                                   "valid": rep, "overflow": rep}),
                    "pipe_replicated")

    def _stack_dataset(self, dataset, n):
        """(images, labels) host stacks for staging; sets ``self.hw``
        (per-image true sizes, variable-size datasets only)."""
        if self.variable_size:
            # VOC-style: stage base-resized images padded to a common shape
            # with per-image true sizes; the warp clips its taps to the true
            # extent so the pad region is never sampled
            samples = [self._variable_sample(dataset, i) for i in range(n)]
            hs = [s[0].shape[0] for s in samples]
            ws = [s[0].shape[1] for s in samples]
            sh, sw = max(hs), max(ws)
            xs = np.zeros((n, sh, sw, 3), np.uint8)
            ys = np.full((n, sh, sw), dataset.ignore_index, np.int32)
            for i, (x, y) in enumerate(samples):
                xs[i, :x.shape[0], :x.shape[1]] = x
                ys[i, :y.shape[0], :y.shape[1]] = y
            self.hw = self._stage(np.stack([hs, ws], -1).astype(np.int32))
        else:
            xs = np.stack([dataset._load_x(i) for i in range(n)])
            ys = np.stack([dataset._load_y(i)
                           for i in range(n)]).astype(np.int32)
            self.hw = None
        return xs, ys

    @staticmethod
    def _variable_sample(dataset, i):
        """Base-resized (x uint8, y int32) for a variable-size dataset."""
        x, y = dataset._base_resized(i)
        return np.asarray(x, np.uint8), np.asarray(y, np.int32)

    def set_queries(self, queries_list) -> None:
        if self.variable_size:
            n = len(queries_list)
            sh, sw = self.images.shape[1:3]
            qs = np.zeros((n, sh, sw), bool)
            for i, q in enumerate(queries_list):
                qs[i, :q.shape[0], :q.shape[1]] = q
            self.queries = self._stage(qs)
        else:
            self.queries = self._stage(np.stack(queries_list))

    def sample_batch(self, indices: np.ndarray, rng) -> dict:
        assert self.queries is not None, "call set_queries() first"
        indices = np.asarray(indices, np.int32)
        n_real = len(indices)
        # pad remainder batches to a multiple of lcm(devices, pad_multiple)
        # with duplicate indices so they keep the sharded batch program
        # and reshape into megabatch scans; batch_impl masks the pad rows
        # out of valid/overflow via n_real. The duplicate rows' only
        # residue is BN statistics — an improvement over the whole-
        # remainder fallback moments (see mesh.py:pad_batch_to_devices)
        import math

        mult = self.pad_multiple
        if self.mesh is not None and self.pad_to_devices:
            mult = math.lcm(mult, self.mesh.devices.size)
        if mult > 1:
            target = -(-n_real // mult) * mult
            if target != n_real:
                indices = np.concatenate(
                    [indices, np.repeat(indices[-1:], target - n_real)])
        fn = self._batch_fn
        n_proc = jax.process_count()
        if self._batch_fn_sharded is not None \
                and len(indices) % self.mesh.devices.size == 0 \
                and len(indices) % n_proc == 0:
            fn = self._batch_fn_sharded
        if n_proc > 1:
            # the key was folded on this process's default device; pass it
            # as a host value so it enters the global program replicated
            rng = np.asarray(rng)
        batch = fn(self.images, self.labels, self.queries,
                   indices, rng, n_real, hws=self.hw)
        return dict(batch, n_real=n_real)
