"""The acquisition engine — fused pool scoring on device.

Reference behaviour (``query.py:144-247``): for every unlabelled-pool image
(batch-size 1, sequential), softmax the logits, score each pixel with the
chosen uncertainty strategy, overwrite already-labelled and void pixels with
the strategy's "worst" value, then top-k over the flattened map (k =
``top_n_percent * H*W`` with a random sub-sample of ``n_pixels_by_us``, or
directly ``n_pixels_by_us``), optionally through the ``reverse_order``
variant (random candidate subset first). MC-dropout averages the per-step
uncertainty maps over ``mc_n_steps`` stochastic forwards (``query.py:177-187``
— fixing the reference's ``up_map`` NameError typo).

TPU-native redesign: one jitted function scores a whole *batch* of pool
images — forward, softmax, strategy score, exclusion fill, ``lax.top_k``,
random sub-sample and stats gathering all fuse into a single XLA program;
only (B, n_pixels) coordinate indices and tiny stats tensors return to host.
Under a sharded batch the same program sweeps the pool across the device
mesh (images are independent — embarrassingly parallel, SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from pixelpick_tpu.engine.trainer import normalize_images
from pixelpick_tpu.ops.resize import resize_align_corners
from pixelpick_tpu.ops.uncertainty import (  # noqa: F401  (re-exports)
    MAXIMIZING, fill_value, uncertainty_map, xlogx as _xlogx,
)


def _full_res_pred(model, params, batch_stats, x, **apply_kw):
    """Forward returning full-resolution logits WITHOUT materialising the
    full-resolution 256-channel emb (models upsample both under
    ``upsample=True`` — deeplab.py:55-59 — but scoring/eval only consume
    pred; skipping the emb resize saves ~170 MB of HBM traffic per image)."""
    out = model.apply({"params": params, "batch_stats": batch_stats}, x,
                      train=False, upsample=False, **apply_kw)
    pred = out["pred"].astype(jnp.float32)
    if pred.shape[1:3] != x.shape[1:3]:
        pred = resize_align_corners(pred, x.shape[1:3])
    return pred


def _select_topk(uc_flat, rng, *, strategy, n_pixels, top_n_percent,
                 reverse_order, hw, pad_mask=None, true_n=None):
    """Per-image selection over a flattened uncertainty map (query.py:33-69).

    ``hw`` is the (possibly bucket-padded) map shape. For bucketed pools
    ``pad_mask`` flags the padding pixels (never pickable) and ``true_n`` is
    the image's true pixel count — the reference computes its candidate-pool
    size from the TRUE image area (``k = int(h*w*top_n_percent)``,
    query.py:36), so k must not inflate with the bucket padding.

    Returns (n_pixels,) int32 flat indices into the padded map.
    """
    n = hw[0] * hw[1]
    largest = strategy in MAXIMIZING
    signed = uc_flat if largest else -uc_flat
    if pad_mask is not None:
        signed = jnp.where(pad_mask, -jnp.inf, signed)

    if top_n_percent <= 0.0:
        return jax.lax.top_k(signed, n_pixels)[1].astype(jnp.int32)

    # static upper bound on the candidate-pool size; the per-image true
    # k = int(true_n * top_n_percent) masks ranks beyond it. Clamped to
    # >= n_pixels (the reference would crash sub-sampling k < n_pixels).
    k_bucket = max(n_pixels, int(n * top_n_percent))
    if true_n is None:
        k_true = jnp.asarray(k_bucket, jnp.int32)
    else:
        k_true = jnp.maximum(
            (true_n.astype(jnp.float32) * top_n_percent).astype(jnp.int32),
            n_pixels)
    rank_ok = jnp.arange(k_bucket) < k_true
    rng_a, rng_b = jax.random.split(rng)

    if reverse_order:
        # uniform candidate subset of size k among the true-image pixels
        # (query.py:39-42: np.random.choice over range(h*w)); non-candidates
        # get the strategy fill, then top-n_pixels (query.py:44-54)
        r = jax.random.uniform(rng_a, (n,))
        if pad_mask is not None:
            r = jnp.where(pad_mask, -jnp.inf, r)
        cand = jax.lax.top_k(r, k_bucket)[1]  # random k_bucket true pixels
        cand_scores = jnp.where(rank_ok, signed[cand], -jnp.inf)
        picked = jax.lax.top_k(cand_scores, n_pixels)[1]
        return cand[picked].astype(jnp.int32)

    # top-k by score, then uniform n_pixels sub-sample from the first
    # k_true ranks. The sub-sample randomness is keyed to PIXEL IDENTITY
    # (one uniform per pixel; highest n_pixels among the candidates win —
    # equivalent to choice-without-replacement): a rank reorder inside the
    # candidate pool (different XLA program layouts round differently)
    # cannot change the picked set, so sharded and unsharded sweeps pick
    # identical pixels.
    idx = jax.lax.top_k(signed, k_bucket)[1]
    r_pix = jax.random.uniform(rng_b, (n,))
    r = jnp.where(rank_ok, r_pix[idx], -jnp.inf)
    sel = jax.lax.top_k(r, n_pixels)[1]
    return idx[sel].astype(jnp.int32)


def make_score_fn(model, *, strategy: str, n_classes: int, mean, std,
                  n_pixels: int, top_n_percent: float, reverse_order: bool,
                  ignore_index: int, mc_n_steps: int = 0,
                  vote_type: str = "soft") -> Callable:
    """Build the jitted batched pool-scoring function.

    batch keys:
      x:        (B, H, W, 3) uint8
      excluded: (B, H, W) bool — already-labelled pixels (and padding)
      y:        (B, H, W) int32 ground truth (oracle mode; may be all
                ``ignore_index`` in human-label mode) — used for the void
                exclusion and acquisition stats.

    Returns (indices (B, n_pixels) int32 flat, stats dict of small tensors).
    """

    def forward_probs(params, batch_stats, x, rng):
        if mc_n_steps > 0:
            # MC-dropout committee over mc_n_steps stochastic forwards.
            # soft vote: average the per-step uncertainty maps
            # (query.py:181-187). hard vote: count per-step argmax votes and
            # score the vote distribution with the same strategy formula —
            # the reference declares --vote_type hard (args.py:34) but never
            # implements it; this is the QBC vote-entropy family.
            def step(carry, key):
                prob_sum, uc_sum, votes = carry
                pred = _full_res_pred(model, params, batch_stats, x,
                                      mc_dropout_on=True,
                                      rngs={"dropout": key})
                p = jax.nn.softmax(pred, -1)
                u = uncertainty_map(p, strategy, key)
                v = jax.nn.one_hot(p.argmax(-1), n_classes, dtype=jnp.float32)
                return (prob_sum + p, uc_sum + u, votes + v), None

            keys = jax.random.split(rng, mc_n_steps)
            zero_p = jnp.zeros(x.shape[:3] + (n_classes,), jnp.float32)
            zero_u = jnp.zeros(x.shape[:3], jnp.float32)
            (prob, uc, votes), _ = jax.lax.scan(
                step, (zero_p, zero_u, zero_p), keys)
            prob = prob / mc_n_steps
            if vote_type == "hard":
                return prob, uncertainty_map(votes / mc_n_steps, strategy, rng)
            return prob, uc / mc_n_steps
        pred = _full_res_pred(model, params, batch_stats, x)
        prob = jax.nn.softmax(pred, -1)
        return prob, uncertainty_map(prob, strategy, rng)

    @jax.jit
    def score_batch(params, batch_stats, batch, rng):
        x = normalize_images(batch["x"], mean, std)
        bsz, big_h, big_w = batch["x"].shape[:3]
        rng_fwd, rng_sel = jax.random.split(rng)
        prob, uc = forward_probs(params, batch_stats, x, rng_fwd)

        excluded = batch["excluded"] | (batch["y"] == ignore_index)
        uc = jnp.where(excluded, fill_value(strategy), uc)

        if "hw" in batch:
            # bucketed pools: per-image true sizes; candidate-pool k comes
            # from the true area and padding is never pickable
            hw_true = batch["hw"].astype(jnp.int32)  # (B, 2)
            true_n = hw_true[:, 0] * hw_true[:, 1]
            pad = (jnp.arange(big_h)[None, :, None] >= hw_true[:, 0, None, None]) \
                | (jnp.arange(big_w)[None, None, :] >= hw_true[:, 1, None, None])
        else:
            true_n = jnp.full((bsz,), big_h * big_w, jnp.int32)
            pad = jnp.zeros((bsz, big_h, big_w), bool)

        sel = functools.partial(
            _select_topk, strategy=strategy, n_pixels=n_pixels,
            top_n_percent=top_n_percent, reverse_order=reverse_order,
            hw=(big_h, big_w))
        keys = jax.random.split(rng_sel, bsz)
        idx = jax.vmap(lambda u, k, p, t: sel(u, k, pad_mask=p, true_n=t))(
            uc.reshape(bsz, -1), keys, pad.reshape(bsz, -1), true_n)

        # acquisition stats at picked pixels (QueryStats, query.py:250-308).
        # picked_valid masks picks that spilled into excluded/void/pad
        # pixels (possible when an image has < n_pixels candidates) so the
        # per-round analytics don't count them.
        valid_map = (~(excluded | pad)).reshape(bsz, -1)
        picked_valid = jnp.take_along_axis(valid_map, idx, axis=1)
        ent = -_xlogx(prob).sum(-1).reshape(bsz, -1)
        picked_ent = jnp.take_along_axis(ent, idx, axis=1)
        picked_y = jnp.take_along_axis(
            batch["y"].reshape(bsz, -1).astype(jnp.int32), idx, axis=1)
        ys = idx // big_w
        xs = idx % big_w
        # mean pairwise distance per image over valid picks (spatial coverage)
        dy = ys[:, :, None] - ys[:, None, :]
        dx = xs[:, :, None] - xs[:, None, :]
        d = jnp.sqrt((dy * dy + dx * dx).astype(jnp.float32))
        pair_ok = (picked_valid[:, :, None] & picked_valid[:, None, :]
                   & ~jnp.eye(n_pixels, dtype=bool))
        # an image with < 2 valid picks has no pair distances: NaN, exactly
        # as the reference's _spatial_coverage (query.py:269-279, the
        # except-ValueError/empty-mean paths); 0.0 would bias the average
        n_pairs = pair_ok.sum((1, 2))
        coverage = jnp.where(
            n_pairs > 0,
            (d * pair_ok).sum((1, 2)) / jnp.maximum(n_pairs, 1),
            jnp.nan)

        stats = {"entropy": picked_ent, "labels": picked_y,
                 "coverage": coverage, "picked_valid": picked_valid}
        return idx, stats

    return score_batch
