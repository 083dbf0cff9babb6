"""Checkpointing.

The reference saves ``{"model": state_dict}`` torch files on val-mIoU
improvement (``model.py:207-216``) and never checkpoints optimizer state
(each AL round restarts training from scratch anyway, ``model.py:163``);
the *query pickles* are the real resume state (SURVEY.md §5). We keep that
split: params+batch_stats go to a msgpack file via flax.serialization,
queries stay in the byte-compatible pkl codec.

An optional **orbax** backend (``--ckpt_backend orbax``) saves the same
payload through ``orbax.checkpoint.AsyncCheckpointer``: the device->host
copy happens inline but serialisation/IO runs on a background thread, so
long runs don't stall the train loop on checkpoint writes. Orbax stores a
*directory* at ``<path>.orbax``; ``load_checkpoint`` auto-detects which
backend wrote a given path.
"""

from __future__ import annotations

import atexit
import os
from typing import Optional, Tuple

import flax.serialization
import jax

_orbax_ckptr = None


def _orbax():
    global _orbax_ckptr
    if _orbax_ckptr is None:
        import orbax.checkpoint as ocp

        _orbax_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_orbax_ckptr.wait_until_finished)
    return _orbax_ckptr


def wait_for_checkpoints() -> None:
    """Block until any in-flight async (orbax) saves are durable."""
    if _orbax_ckptr is not None:
        _orbax_ckptr.wait_until_finished()


def save_checkpoint(path: str, params, batch_stats,
                    backend: str = "msgpack") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    if backend == "orbax":
        ckptr = _orbax()
        ckptr.wait_until_finished()  # one save in flight at a time
        ckptr.save(os.path.abspath(path) + ".orbax", payload, force=True)
        return
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def load_checkpoint(path: str, params_template, batch_stats_template) -> Tuple:
    template = {"params": params_template, "batch_stats": batch_stats_template}
    orbax_dir = os.path.abspath(path) + ".orbax"
    if os.path.isdir(orbax_dir):
        import orbax.checkpoint as ocp

        wait_for_checkpoints()
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            payload = ckptr.restore(orbax_dir, args=ocp.args.StandardRestore(
                jax.device_get(template)))
        return payload["params"], payload["batch_stats"]
    with open(path, "rb") as f:
        data = f.read()
    payload = flax.serialization.from_bytes(template, data)
    return payload["params"], payload["batch_stats"]
