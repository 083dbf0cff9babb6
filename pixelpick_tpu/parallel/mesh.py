"""Device mesh and sharding helpers.

The reference is strictly single-device (SURVEY.md §2.2: no
``torch.distributed``, no NCCL/Gloo; ``cuda:0`` hardcoded at
``model.py:21``). The TPU-native design scales over a 1-D ``('data',)``
``jax.sharding.Mesh``:

- parameters and optimizer state are replicated (they fit trivially —
  models are <= ResNet50 scale);
- batches are sharded on the leading axis; under ``jit``, XLA inserts the
  gradient ``psum`` and computes global-batch BN statistics automatically —
  the collectives ride ICI;
- the unlabelled-pool sweep shards images the same way (embarrassingly
  parallel); only (image, y, x) coordinate triples are gathered to host.

``dryrun_multichip`` in ``__graft_entry__.py`` exercises this on an 8-device
virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(args=None, n_devices: Optional[int] = None) -> Optional[Mesh]:
    devices = jax.devices()
    n = n_devices or (getattr(args, "data_parallel", 0) or len(devices))
    n = min(n, len(devices))
    if jax.process_count() > 1 and n != len(devices):
        # a sub-mesh would leave some processes with zero addressable mesh
        # devices; make_array_from_process_local_data then rejects the
        # process-local rows (verified) — require the full global mesh
        raise ValueError(
            f"--data_parallel={n} under multi-process must use all "
            f"{len(devices)} global devices (one mesh spanning every "
            "process); drop the flag or set it to 0")
    if n <= 1:
        return None
    return Mesh(np.array(devices[:n]), ("data",))


def _put_global(x: np.ndarray, mesh: Mesh, spec: P):
    """Device-put host data under ``spec`` — multi-process aware.

    Single process: a plain ``device_put``. Multi-process (one JAX process
    per TPU host, wired by ``jax.distributed.initialize`` — see
    ``parallel/distributed.py``): every process holds the identical GLOBAL
    host array (same dataset + seeds everywhere), and hands jax only its
    process-local slice via ``make_array_from_process_local_data``; the
    result is one global jax.Array spanning all hosts. Works for a spec
    sharding any single dimension (batch ``P('data')`` or spatial
    ``P(None, 'data')``) — the 1-D mesh orders process 0's devices first,
    so each process's local slice is its contiguous block along that dim."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    dim = next((i for i, s in enumerate(spec) if s is not None), None)
    if dim is None:  # replicated
        return jax.make_array_from_process_local_data(sharding, x, x.shape)
    per = x.shape[dim] // jax.process_count()
    lo = jax.process_index() * per
    local = x[(slice(None),) * dim + (slice(lo, lo + per),)]
    return jax.make_array_from_process_local_data(sharding, local, x.shape)


def pad_batch_to_devices(batch: dict, mesh: Optional[Mesh],
                         pad_label: Optional[int] = None,
                         target_rows: Optional[int] = None):
    """Pad a remainder batch with MASKED duplicate rows so it keeps the
    ``P('data')`` sharded spec instead of falling back to replication
    (``shard_batch``'s remainder rule) — e.g. CamVid 367 @ bs48 leaves a
    31-image remainder that would otherwise run unsharded once per epoch
    on a pod. Returns ``(padded_batch, n_real)``.

    Pad rows duplicate the last real row, then every masking key is
    overridden so they are inert end-to-end:

    - ``valid``  -> False: the sparse train loss normalises by the global
      valid count (engine/trainer.py:sparse_ce_and_hist) and the train
      confusion matrix masks on it — pad rows contribute exactly nothing;
    - ``y``      -> ``pad_label`` (ignore index): dense loss + eval
      confusion matrix drop every pad pixel;
    - ``excluded`` -> True: acquisition never picks a pad pixel;
    - ``index``  -> -1: consumers that track per-image identity (selector,
      batched eval) skip the row, same convention as the bucketed loader.

    The one non-inert effect: BatchNorm batch statistics see the duplicate
    image rows (one remainder batch per epoch). With ghost BN
    (``--bn_group_size G``) this is an *improvement* — a 31-row batch
    currently falls back to full-31 moments (models/layers.py ghost_bn_train
    divisibility rule), while the padded 32-row batch computes 7 exact
    reference-G groups and confines the duplicate to the last group.

    ``target_rows``: pad to this exact size instead of the next device
    multiple — val/query callers pad remainder batches to the full batch
    size so the whole sweep reuses ONE compiled program (a second XLA
    compile costs 1-5 min on the tunnelled TPU stack). Works with
    ``mesh=None`` too (compile dedupe is worth it single-chip).
    """
    b = next(iter(batch.values())).shape[0]
    if target_rows is not None:
        target = target_rows
    elif mesh is not None:
        n = mesh.devices.size
        target = -(-b // n) * n
    else:
        return batch, b
    if target <= b:
        return batch, b

    pad = target - b
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        out[k] = np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
    if "valid" in out:
        out["valid"][b:] = False
    if "y" in out and pad_label is not None:
        out["y"][b:] = pad_label
    if "excluded" in out:
        out["excluded"][b:] = True
    if "index" in out:
        out["index"][b:] = -1
    return out, b


def shard_batch(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Shard every array on its leading (batch) axis; replicate if the batch
    doesn't divide the mesh (remainder batches)."""
    if mesh is None:
        return batch
    n = mesh.devices.size
    n_proc = jax.process_count()

    def put(x):
        spec = P("data") if x.shape[0] % n == 0 \
            and x.shape[0] % n_proc == 0 else P()
        return _put_global(np.asarray(x), mesh, spec)

    return {k: put(v) for k, v in batch.items()}


def shard_batch_spatial(batch: dict, mesh: Optional[Mesh]) -> dict:
    """Shard image-shaped arrays on their HEIGHT axis (axis 1) instead of
    the batch axis — model parallelism over the spatial extent.

    For pool sweeps whose images are large but few (the regime SURVEY §2.2
    marks as the optional spatial-sharding extra), batch sharding runs out
    of parallelism; sharding H lets every device hold a horizontal stripe
    of every image. Under ``jit``, GSPMD inserts the halo exchanges the
    convolutions need and the all-gathers/psums for the global ops (ASPP
    GAP, align-corners resize matmuls, top-k) automatically — no model
    changes. Arrays whose H doesn't divide the mesh (or non-image arrays)
    are replicated.
    """
    if mesh is None:
        return batch
    n = mesh.devices.size
    sharded_any = False

    def put(x):
        nonlocal sharded_any
        x = np.asarray(x)
        if x.ndim >= 3 and x.shape[1] % n == 0:
            spec = P(None, "data")
            sharded_any = True
        else:
            spec = P()
        return _put_global(x, mesh, spec)

    out = {k: put(v) for k, v in batch.items()}
    if not sharded_any:
        import warnings
        warnings.warn(
            f"shard_batch_spatial: no array height divides the {n}-device "
            f"mesh ({ {k: np.asarray(v).shape for k, v in batch.items()} }) "
            "— everything replicated, the sweep runs without spatial "
            "parallelism", stacklevel=2)
    return out


def shard_pytree(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    if mesh is None:
        return tree
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: _put_global(np.asarray(x), mesh, P()), tree)
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
