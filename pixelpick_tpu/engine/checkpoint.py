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
long runs don't stall the train loop on checkpoint writes. Each save goes
to a FRESH step directory under ``<path>.orbax/`` (orbax commits a step
atomically: tmp dir + rename), so a crash mid-save can never lose the
previous best checkpoint; older steps are pruned once the newer save is
durable. ``load_checkpoint`` auto-detects which backend wrote a path and
restores the latest committed step.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
from typing import List, Optional, Tuple

import flax.serialization
import jax

_orbax_ckptr = None
_STEP_RE = re.compile(r"^step_(\d+)$")
# next step number per orbax root — deterministic across processes (every
# process performs the same sequence of saves), unlike re-listing a shared
# directory that another process may be mid-commit on
_next_step: dict = {}


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


def _orbax_steps(root: str) -> List[int]:
    """Committed step numbers under an orbax root, ascending."""
    if not os.path.isdir(root):
        return []
    steps = []
    for d in os.listdir(root):
        m = _STEP_RE.match(d)
        if m and os.path.isdir(os.path.join(root, d)):
            steps.append(int(m.group(1)))
    return sorted(steps)


def save_checkpoint(path: str, params, batch_stats,
                    backend: str = "msgpack") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
    }
    if backend == "orbax":
        import orbax.checkpoint as ocp

        from pixelpick_tpu.parallel.distributed import is_primary

        root = os.path.abspath(path) + ".orbax"
        ckptr = _orbax()
        ckptr.wait_until_finished()  # one save in flight at a time
        if root not in _next_step:
            # first touch: resume numbering from committed steps on disk
            # (stable — no save can be in flight across run boundaries)
            steps = _orbax_steps(root)
            _next_step[root] = (steps[-1] + 1) if steps else 0
        # previous save is durable now — prune everything but the newest.
        # Multi-host: one pruner; orbax itself barriers all processes in
        # save(), so every process must call it (its internals route the
        # actual writes/commit through the primary)
        if is_primary():
            for s in _orbax_steps(root)[:-1]:
                shutil.rmtree(os.path.join(root, f"step_{s:08d}"),
                              ignore_errors=True)
        nxt = _next_step[root]
        _next_step[root] = nxt + 1
        ckptr.save(os.path.join(root, f"step_{nxt:08d}"),
                   args=ocp.args.StandardSave(payload))
        return
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(payload))


def save_stage_state(path: str, state, epoch: int, best_miou: float) -> None:
    """Full MID-STAGE training state: params, BatchNorm running stats,
    optimizer state (Adam moments / SGD momentum / schedule step counter),
    the completed epoch and the best val mIoU so far.

    The reference never checkpoints optimizer state (``model.py:207-216``;
    each AL round restarts from scratch anyway) — a crash 40 epochs into a
    50-epoch stage loses the whole stage. ``--stage_ckpt_interval N`` makes
    stages resumable: the driver saves this file every N epochs and resumes
    from it on restart (active/driver.py:_run_stage). Saved atomically
    (tmp + rename) so a crash mid-save keeps the previous snapshot;
    removed when the stage completes."""
    import flax.serialization as ser

    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "state": jax.device_get(ser.to_state_dict(state)),
        "epoch": epoch,
        "best_miou": float(best_miou),
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(ser.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_stage_state(path: str, state_template):
    """Restore a ``save_stage_state`` snapshot onto a freshly-built
    TrainState template (same model/optimizer). Returns
    ``(state, epoch, best_miou)``."""
    import flax.serialization as ser

    with open(path, "rb") as f:
        payload = ser.msgpack_restore(f.read())
    state = ser.from_state_dict(state_template, payload["state"])
    return state, int(payload["epoch"]), float(payload["best_miou"])


def load_checkpoint(path: str, params_template, batch_stats_template) -> Tuple:
    template = {"params": params_template, "batch_stats": batch_stats_template}
    orbax_dir = os.path.abspath(path) + ".orbax"
    if os.path.isdir(orbax_dir):
        import orbax.checkpoint as ocp

        wait_for_checkpoints()
        steps = _orbax_steps(orbax_dir)
        # latest committed step; bare root = legacy (round-2) layout
        target = os.path.join(orbax_dir, f"step_{steps[-1]:08d}") \
            if steps else orbax_dir
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
            payload = ckptr.restore(target, args=ocp.args.StandardRestore(
                jax.device_get(template)))
        return payload["params"], payload["batch_stats"]
    with open(path, "rb") as f:
        data = f.read()
    payload = flax.serialization.from_bytes(template, data)
    return payload["params"], payload["batch_stats"]
