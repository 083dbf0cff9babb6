"""Multi-host (multi-process) runtime wiring.

The reference is strictly single-device (SURVEY.md §2.2: no
``torch.distributed``, no NCCL/Gloo/MPI anywhere). The TPU-native scale-out
story is JAX's multi-controller model: one process per TPU host, all wired
into ONE global runtime by ``jax.distributed.initialize`` — after which
``jax.devices()`` spans every host, the same ``('data',)`` mesh code
(``parallel/mesh.py``) shards batches globally, and XLA's collectives ride
ICI within a slice / DCN across slices. No framework-level transport exists
or is needed.

Contract for the AL loop under multi-process (documented, test-proven in
``tests/test_multihost.py``):

- every process must construct the SAME dataset with the SAME seeds — the
  host-side loaders then produce identical global batches, and
  ``shard_batch`` hands each process only its local rows
  (``mesh.py:_put_global``);
- jitted step results (loss, metric histograms, updated state) are global
  arrays, identical on every process — so round decisions (best-mIoU,
  query picks) agree everywhere without extra synchronisation;
- artifact writes (logs, checkpoints, queries.pkl) should be gated on
  ``is_primary()`` when the checkpoint dir is on a shared filesystem.

On real TPU pods ``jax.distributed.initialize()`` auto-detects everything
from the TPU metadata and takes no arguments; the explicit flags exist for
CPU/GPU clusters and for the two-process CPU test harness.
"""

from __future__ import annotations


def initialize_from_args(args) -> bool:
    """Wire this process into a multi-host JAX runtime if requested.

    Flags (config.py): ``--dist_coordinator host:port``,
    ``--dist_num_processes N``, ``--dist_process_id I``. With
    ``--dist_coordinator auto``, defer every parameter to JAX's cluster
    auto-detection (TPU pod / GKE / Slurm). Returns True if distributed
    mode was initialised. Must run before the first jax computation.
    """
    coord = getattr(args, "dist_coordinator", "") or ""
    if not coord:
        return False
    import jax

    if coord == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id,
        )
    return True


def is_primary() -> bool:
    """True on the process that should write shared-filesystem artifacts."""
    import jax

    return jax.process_index() == 0
