"""Jitted train/eval step functions.

The reference's inner loop (``model.py:93-159``, ``train.py:14-103``)
densifies sparse labels to full resolution, upsamples B×C×H×W logits
(``deeplab.py:55``) and takes ``F.cross_entropy(..., ignore_index)`` — then
syncs metrics to host every iteration (``model.py:125``).

TPU-native redesign:

- **Sparse-label loss.** The head logits stay at 1/4 resolution; their
  align-corners bilinear interpolation is evaluated at the <= K labelled
  pixel coordinates via separable one-hot selection matmuls
  (``ops/resize.py:gather_bilinear_matmul`` — backward is a matmul, not a
  scatter) and the cross-entropy averaged over the valid ones. By linearity
  of interpolation this is *exactly* the reference's upsample-then-masked-CE
  (verified in ``tests/test_model_parity.py``), while the backward pass
  never touches a full-resolution tensor. Full-resolution heads (FPN) take
  a plain-indexing fast path.
- **Device metrics.** The train-time running mIoU only ever sees the
  labelled pixels (everything else is ``ignore_index`` under ``_fast_hist``'s
  mask), so it is computed from the same gathered logits — one (n, n)
  confusion matrix per step, accumulated on device.
- **One fused step.** forward + loss + backward + optax update (+ BN stats)
  compile into a single XLA program with donated state; uint8 images are
  normalised on device (4x less host->device traffic).
- Fully-supervised mode (``n_pixels_by_us == 0``) keeps the dense loss path.

All functions here are mesh-agnostic: under a sharded batch the same code is
data-parallel (XLA inserts gradient/BN collectives) — see ``parallel/mesh.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pixelpick_tpu.ops.resize import (
    gather_bilinear_align_corners, gather_bilinear_matmul,
    resize_align_corners,
)
from pixelpick_tpu.ops.uncertainty import vis_maps
from pixelpick_tpu.utils.metrics import confusion_matrix


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, batch_stats, tx) -> TrainState:
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def normalize_images(x_uint8: jnp.ndarray, mean, std) -> jnp.ndarray:
    """uint8 NHWC -> normalised f32 (torchvision to_tensor + Normalize)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x_uint8.astype(jnp.float32) / 255.0 - mean) / std


def sparse_ce_and_hist(logits_lr, coords, labels, valid, full_hw, n_classes,
                       gather_impl: str = "matmul"):
    """Cross-entropy + confusion matrix at sparse labelled coordinates.

    logits_lr: (B, h, w, C) low-res head logits.
    coords:    (B, K, 2) int32 full-res (y, x); padded entries arbitrary.
    labels:    (B, K) int32; valid: (B, K) bool (False on padding and on
               void-labelled pixels, reproducing CE ``ignore_index``).
    gather_impl: 'matmul' (one-hot selection matmul — TPU-friendly backward)
               or 'gather' (take_along_axis; backward scatters).
    """
    if logits_lr.shape[1:3] == tuple(full_hw):
        # full-resolution head (FPN): no interpolation — plain indexing.
        # (The one-hot matmul would cost O(K * H*W * C) here.)
        bsz, _, w_full, _ = logits_lr.shape
        flat = logits_lr.reshape(bsz, -1, logits_lr.shape[-1])
        idx = coords[..., 0] * w_full + coords[..., 1]
        logits = jnp.take_along_axis(flat, idx[..., None], axis=1)
    else:
        gather = gather_bilinear_matmul if gather_impl == "matmul" \
            else gather_bilinear_align_corners
        logits = gather(logits_lr, coords, full_hw)  # B,K,C
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.clip(labels, 0, n_classes - 1).astype(jnp.int32)
    ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    loss = -(ll * valid).sum() / n_valid
    pred = logits.argmax(-1)
    hist = confusion_matrix(jnp.where(valid, labels, -1), pred, n_classes)
    return loss, hist


def _sparse_loss_fn(model, *, n_classes: int, mean, std,
                    normalize: bool, gather_impl: str) -> Callable:
    """The sparse-label loss closure shared by ``make_train_step`` and
    ``make_microbatch_train_step``."""

    def loss_fn(params, batch_stats, batch, drop_rng):
        x = normalize_images(batch["x"], mean, std) if normalize \
            else batch["x"]
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, upsample=False,
            rngs={"dropout": drop_rng}, mutable=["batch_stats"],
        )
        full_hw = batch["x"].shape[1:3]
        loss, hist = sparse_ce_and_hist(
            out["pred"], batch["coords"], batch["labels"], batch["valid"],
            full_hw, n_classes, gather_impl=gather_impl)
        return loss, (mutated["batch_stats"], hist)

    return loss_fn


def make_train_step(model, tx, *, n_classes: int, mean, std,
                    donate: bool = True, normalize: bool = True,
                    gather_impl: str = "matmul") -> Callable:
    """Sparse-label train step. batch keys: x (uint8 B,H,W,3 — or already
    normalised f32 when ``normalize=False``, e.g. from the device pipeline),
    coords (B,K,2), labels (B,K), valid (B,K)."""
    loss_fn = _sparse_loss_fn(model, n_classes=n_classes, mean=mean, std=std,
                              normalize=normalize, gather_impl=gather_impl)
    return _jit_step(loss_fn, tx, donate)


def make_microbatch_train_step(model, tx, *, micro_bs: int, n_classes: int,
                               mean, std, donate: bool = True,
                               normalize: bool = True,
                               gather_impl: str = "matmul") -> Callable:
    """Megabatch scan-of-microbatches train step — ONE jitted dispatch that
    executes ``B // micro_bs`` SEQUENTIAL bs-``micro_bs`` optimizer updates
    over a device-resident megabatch via ``lax.scan``.

    This is mathematically the exact reference training schedule
    (``model.py:93-126`` at ``batch_size=4``): same update count, same
    sample order (the loader's shuffled epoch partitions at the same
    micro boundaries — 48 = 12 x 4), same per-update BatchNorm moments
    (each microbatch computes its own batch statistics, i.e. plain bs-4
    BN), same Adam/Poly-LR per-iteration stepping (the optimizer state
    advances once per microbatch inside the scan). What changes is purely
    the execution shape: the per-update Python dispatch and host-device
    round-trip of the tunnelled TPU stack are amortised over ``n_micro``
    updates, and the megabatch's images upload once. Bit-equality with
    ``n_micro`` separate ``make_train_step`` calls is asserted in
    ``tests/test_train_step.py``.

    The batch's leading dim must be a ``micro_bs`` multiple; remainder
    megabatches are padded with ``valid=False`` duplicate rows by the
    caller (``parallel/mesh.py:pad_batch_to_devices``) — the one deviation:
    pad rows join the FINAL microbatch's BN moments (the reference's last
    ragged batch computes moments over its true rows only).

    Returns ``(state, losses, hist)`` with ``losses`` of shape
    ``(n_micro,)`` (one per update — the epoch-mean log weights each
    update equally, exactly the reference's per-iter running loss) and
    ``hist`` the summed confusion matrix. A microbatch consisting
    entirely of pad rows is a true no-op (state unchanged, step not
    advanced — zero grads would otherwise still push ``wd * params``
    through Adam via the coupled weight decay) and reports ``NaN`` in
    its ``losses`` slot; callers skip non-finite entries.
    """
    loss_fn = _sparse_loss_fn(model, n_classes=n_classes, mean=mean, std=std,
                              normalize=normalize, gather_impl=gather_impl)

    def train_step(state: TrainState, batch, rng):
        b = next(iter(batch.values())).shape[0]
        assert b % micro_bs == 0, (b, micro_bs)
        n_micro = b // micro_bs
        micro = jax.tree.map(
            lambda v: v.reshape(n_micro, micro_bs, *v.shape[1:]), batch)

        def body(s, mb):
            drop_rng = jax.random.fold_in(rng, s.step)
            (loss, (new_stats, hist)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(s.params, s.batch_stats, mb, drop_rng)
            updates, opt_state = tx.update(grads, s.opt_state, s.params)
            params = optax.apply_updates(s.params, updates)
            upd = TrainState(params=params, batch_stats=new_stats,
                             opt_state=opt_state, step=s.step + 1)
            # a microbatch that is ENTIRELY pad rows (lcm(devices, micro)
            # padding of a remainder batch can exceed the last real row)
            # must be a true no-op: zero grads still feed wd*params into
            # Adam via the coupled weight decay, and a phantom update
            # would advance the LR schedule past iters_per_epoch. Keep the
            # prior state (params, opt state, BN EMA, step) wholesale and
            # emit a NaN loss sentinel the driver's epoch-mean skips.
            any_real = mb["valid"].any()
            nxt = jax.tree.map(lambda a, prev: jnp.where(any_real, a, prev),
                               upd, s)
            loss = jnp.where(any_real, loss, jnp.nan)
            return nxt, (loss, hist)

        state, (losses, hists) = jax.lax.scan(body, state, micro)
        return state, losses, hists.sum(0)

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def _jit_step(loss_fn, tx, donate: bool) -> Callable:
    """The shared step: grad of ``loss_fn(params, batch_stats, batch,
    drop_rng) -> (loss, (new_batch_stats, hist))``, optimizer update,
    TrainState rebuild — jitted with the prior state donated."""

    def train_step(state: TrainState, batch, rng):
        drop_rng = jax.random.fold_in(rng, state.step)
        (loss, (new_stats, hist)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, drop_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, batch_stats=new_stats,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, loss, hist

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_dense_train_step(model, tx, *, n_classes: int, ignore_index: int,
                          mean, std, donate: bool = True) -> Callable:
    """Dense (fully-supervised) train step: batch keys x (uint8), y (int32
    B,H,W). Reproduces reference ``model.py:108-126`` with the loss at full
    resolution."""

    def loss_fn(params, batch_stats, batch, drop_rng):
        x = normalize_images(batch["x"], mean, std)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, upsample=True,
            rngs={"dropout": drop_rng}, mutable=["batch_stats"],
        )
        logits = out["pred"].astype(jnp.float32)
        y = batch["y"].astype(jnp.int32)
        valid = (y != ignore_index) & (y >= 0) & (y < n_classes)
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe_y = jnp.clip(y, 0, n_classes - 1)
        ll = jnp.take_along_axis(logp, safe_y[..., None], axis=-1)[..., 0]
        loss = -(ll * valid).sum() / jnp.maximum(valid.sum(), 1)
        hist = confusion_matrix(jnp.where(valid, y, -1), logits.argmax(-1),
                                n_classes)
        return loss, (mutated["batch_stats"], hist)

    return _jit_step(loss_fn, tx, donate)


def make_eval_step(model, *, n_classes: int, mean, std,
                   pad_to_stride: Optional[int] = None) -> Callable:
    """Validation step: full-res argmax + device confusion matrix.

    ``pad_to_stride``: VOC-style reflect-pad to a stride multiple before the
    forward pass, predictions cropped back (reference ``model.py:185-191``)
    — handled by the caller via static padded shapes; here ``valid_hw``
    crops the confusion-matrix contribution.

    Returns ``(hist, pred, vis)`` where ``vis`` holds ONE image's 6-panel
    visualisation maps (pred/confidence/margin/entropy) computed from the
    logits this step already produced — so per-epoch PNGs cost no separate
    forward pass or XLA program (reference re-forwards per visualisation,
    ``model.py:150-158``). ``vis_index`` picks the image (traced scalar —
    no recompile across values), letting the batched eval CLI hit the
    reference's per-image PNG cadence (``eval.py:74-84``) exactly even
    when the cadence image is not a batch's first.
    """

    @functools.partial(jax.jit, static_argnames=("valid_hw",))
    def eval_step(params, batch_stats, batch, valid_hw=None, vis_index=0):
        x = normalize_images(batch["x"], mean, std)
        # upsample=False + explicit pred resize: skips the full-resolution
        # 256-channel emb resize the model's upsample=True path would also
        # materialise (scoring/eval only consume pred)
        out = model.apply({"params": params, "batch_stats": batch_stats}, x,
                          train=False, upsample=False)
        logits = out["pred"].astype(jnp.float32)
        if logits.shape[1:3] != x.shape[1:3]:
            logits = resize_align_corners(logits, x.shape[1:3])
        if valid_hw is not None:
            logits = logits[:, :valid_hw[0], :valid_hw[1]]
        pred = logits.argmax(-1)
        hist = confusion_matrix(batch["y"], pred, n_classes)
        logits_vis = jax.lax.dynamic_slice_in_dim(logits, vis_index, 1, 0)
        return hist, pred, vis_maps(logits_vis)

    return eval_step


def make_forward_fn(model, *, mean, std) -> Callable:
    """Plain jitted inference: normalised forward returning full-res logits.

    Not used on any hot path (the driver/eval CLI visualise from the eval
    step's own outputs); kept as the public inference escape hatch and the
    single-chip compile-check entry (``__graft_entry__.py:entry``)."""

    @jax.jit
    def forward(params, batch_stats, x_uint8):
        x = normalize_images(x_uint8, mean, std)
        return model.apply({"params": params, "batch_stats": batch_stats}, x,
                           train=False, upsample=True)

    return forward
