"""Per-pixel uncertainty scores from softmax probabilities.

Reference ``UncertaintySampler`` (``query.py:224-247``). Lives in ``ops``
(not ``active``) because both the acquisition kernel and the eval step's
visualisation panels consume it — the eval step computes the 6-panel
confidence/margin/entropy maps from logits it already has, so no dedicated
visualisation forward pass (or its XLA program) exists anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAXIMIZING = ("entropy", "least_confidence")  # query.py:45,53: largest=True


def xlogx(p):
    """p*log(p) with the p=0 limit (0), avoiding NaN where softmax
    underflows to exact zero (possible in bf16 tails; the reference's
    f32 torch path would NaN there too — a defect, not behaviour)."""
    return jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0)


def uncertainty_map(prob: jnp.ndarray, strategy: str,
                    rng: jax.Array | None = None) -> jnp.ndarray:
    """Per-pixel uncertainty from softmax probs (B,H,W,C) -> (B,H,W).

    Reference ``UncertaintySampler`` (query.py:224-247)."""
    if strategy == "entropy":
        return -xlogx(prob).sum(-1)
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


def vis_maps(logits0: jnp.ndarray) -> dict:
    """The 6-panel visualisation maps for ONE image's full-res logits
    (1,H,W,C) — pred + the three uncertainty panels the reference's
    Visualiser draws (``utils/utils.py:434-453``), computed from logits an
    eval/query program already produced."""
    prob = jax.nn.softmax(logits0.astype(jnp.float32), -1)
    return {
        "pred": prob.argmax(-1)[0],
        "entropy": uncertainty_map(prob, "entropy")[0],
        "least_confidence": uncertainty_map(prob, "least_confidence")[0],
        "margin_sampling": uncertainty_map(prob, "margin_sampling")[0],
    }
