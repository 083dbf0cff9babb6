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

MAXIMIZING = ("entropy", "least_confidence")  # query.py:45,53: largest=True


def _xlogx(p):
    """p*log(p) with the p=0 limit (0), avoiding NaN where softmax
    underflows to exact zero (possible in bf16 tails; the reference's
    f32 torch path would NaN there too — a defect, not behaviour)."""
    return jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0)


def uncertainty_map(prob: jnp.ndarray, strategy: str,
                    rng: jax.Array | None = None) -> jnp.ndarray:
    """Per-pixel uncertainty from softmax probs (B,H,W,C) -> (B,H,W).

    Reference ``UncertaintySampler`` (query.py:224-247)."""
    if strategy == "entropy":
        return -_xlogx(prob).sum(-1)
    if strategy == "least_confidence":
        return 1.0 - prob.max(-1)
    if strategy == "margin_sampling":
        top2 = jax.lax.top_k(prob, 2)[0]
        return jnp.abs(top2[..., 0] - top2[..., 1])
    if strategy == "random":
        return jax.random.uniform(rng, prob.shape[:-1])
    raise ValueError(strategy)


def fill_value(strategy: str) -> float:
    """The 'never pick this' value (query.py:196-201)."""
    return 0.0 if strategy in MAXIMIZING else 1.0


def _select_topk(uc_flat, rng, *, strategy, n_pixels, top_n_percent,
                 reverse_order, hw):
    """Per-image selection over a flattened uncertainty map (query.py:33-69).

    Returns (n_pixels,) int32 flat indices.
    """
    n = hw[0] * hw[1]
    largest = strategy in MAXIMIZING
    signed = uc_flat if largest else -uc_flat

    if reverse_order:
        assert top_n_percent > 0.0
        k = int(n * top_n_percent)
        cand = jax.random.permutation(rng, n)[:k]
        mask = jnp.zeros((n,), bool).at[cand].set(True)
        signed = jnp.where(mask, signed, -jnp.inf)
        return jax.lax.top_k(signed, n_pixels)[1].astype(jnp.int32)

    k = int(n * top_n_percent) if top_n_percent > 0.0 else n_pixels
    idx = jax.lax.top_k(signed, k)[1]
    if top_n_percent > 0.0:
        # uniform sub-sample without replacement from the top-k pool
        perm = jax.random.permutation(rng, k)[:n_pixels]
        idx = idx[perm]
    return idx.astype(jnp.int32)


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
                out = model.apply(
                    {"params": params, "batch_stats": batch_stats}, x,
                    train=False, mc_dropout_on=True, upsample=True,
                    rngs={"dropout": key})
                p = jax.nn.softmax(out["pred"].astype(jnp.float32), -1)
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
        out = model.apply({"params": params, "batch_stats": batch_stats}, x,
                          train=False, upsample=True)
        prob = jax.nn.softmax(out["pred"].astype(jnp.float32), -1)
        return prob, uncertainty_map(prob, strategy, rng)

    @jax.jit
    def score_batch(params, batch_stats, batch, rng):
        x = normalize_images(batch["x"], mean, std)
        bsz, big_h, big_w = batch["x"].shape[:3]
        rng_fwd, rng_sel = jax.random.split(rng)
        prob, uc = forward_probs(params, batch_stats, x, rng_fwd)

        excluded = batch["excluded"] | (batch["y"] == ignore_index)
        uc = jnp.where(excluded, fill_value(strategy), uc)

        sel = functools.partial(
            _select_topk, strategy=strategy, n_pixels=n_pixels,
            top_n_percent=top_n_percent, reverse_order=reverse_order,
            hw=(big_h, big_w))
        keys = jax.random.split(rng_sel, bsz)
        idx = jax.vmap(sel)(uc.reshape(bsz, -1), keys)  # (B, n_pixels)

        # acquisition stats at picked pixels (QueryStats, query.py:250-308)
        ent = -_xlogx(prob).sum(-1).reshape(bsz, -1)
        picked_ent = jnp.take_along_axis(ent, idx, axis=1)
        picked_y = jnp.take_along_axis(
            batch["y"].reshape(bsz, -1).astype(jnp.int32), idx, axis=1)
        ys = idx // big_w
        xs = idx % big_w
        # mean pairwise distance per image (spatial coverage)
        dy = ys[:, :, None] - ys[:, None, :]
        dx = xs[:, :, None] - xs[:, None, :]
        d = jnp.sqrt((dy * dy + dx * dx).astype(jnp.float32))
        off_diag = ~jnp.eye(n_pixels, dtype=bool)
        coverage = (d * off_diag).sum((1, 2)) / jnp.maximum(off_diag.sum(), 1)

        stats = {"entropy": picked_ent, "labels": picked_y,
                 "coverage": coverage}
        return idx, stats

    return score_batch
