"""Checkpointing.

The reference saves ``{"model": state_dict}`` torch files on val-mIoU
improvement (``model.py:207-216``) and never checkpoints optimizer state
(each AL round restarts training from scratch anyway, ``model.py:163``);
the *query pickles* are the real resume state (SURVEY.md §5). We keep that
split: params+batch_stats go to a msgpack file via flax.serialization,
queries stay in the byte-compatible pkl codec.
"""

from __future__ import annotations

import os
from typing import Tuple

import flax.serialization
import jax


def save_checkpoint(path: str, params, batch_stats) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def load_checkpoint(path: str, params_template, batch_stats_template) -> Tuple:
    with open(path, "rb") as f:
        data = f.read()
    payload = flax.serialization.from_bytes(
        {"params": params_template, "batch_stats": batch_stats_template}, data)
    return payload["params"], payload["batch_stats"]
