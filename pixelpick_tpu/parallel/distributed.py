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
    # Bootstrap the cross-process collectives context NOW, while every
    # process is still in lockstep from the initialize() rendezvous. The
    # communicator bootstrap (e.g. gloo's KV exchange) has a fixed ~30s
    # timeout, but the first collective of a real program can otherwise be
    # preceded by minutes of (cache-skewed) compilation on slow hosts —
    # the processes would reach it too far apart and the bootstrap die.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("pixelpick_tpu:dist_init")
    return True


def is_primary() -> bool:
    """True on the process that should write shared-filesystem artifacts."""
    import jax

    return jax.process_index() == 0


def barrier(name: str, timeout_s: float = 1800.0) -> None:
    """Coordination-service barrier across all processes (no-op
    single-process). Pure gRPC — safe under arbitrary skew, unlike device
    collectives whose bootstrap rendezvous has a short fixed timeout."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(name, int(timeout_s * 1000))


class LockstepJit:
    """Multi-process-safe wrapper around a jitted collective program.

    Each XLA executable bootstraps its own cross-process communicator (e.g.
    a gloo context) at FIRST execution, with a short fixed key-value
    rendezvous timeout (~30 s). But the first dispatch of a program is
    preceded by its compilation — minutes here, and arbitrarily skewed
    between processes (cache hits, host contention) — so processes can
    reach the rendezvous too far apart and the bootstrap dies with
    "Gloo context initialization failed: DEADLINE_EXCEEDED".

    Fix: on the first call with a new argument signature, compile locally
    first (``fn.lower(*args).compile()`` warms the jit dispatch cache),
    then realign every process with a coordination-service :func:`barrier`
    (long timeout, pure RPC), and only then dispatch — all processes now
    enqueue the collective within milliseconds of each other.

    Single-process: a zero-overhead passthrough.
    """

    def __init__(self, fn, name: str):
        self._fn = fn
        self._name = name
        self._seen: set = set()

    @staticmethod
    def _sig(tree):
        """Hashable compile signature of a pytree: array-likes by
        (shape, dtype, sharding spec) — their VALUES are traced and must
        not enter the key (a jax.Array in the key would be unhashable and
        its repr would fetch the buffer) — everything else (static kwargs
        like ``valid_hw``, dict keys) by value, since distinct static
        values compile distinct programs."""
        import jax

        out = []
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "shape") and hasattr(leaf, "dtype"):
                sh = getattr(leaf, "sharding", None)
                spec = str(getattr(sh, "spec", None)) if sh is not None \
                    else None
                out.append((tuple(leaf.shape), str(leaf.dtype), spec))
            else:
                out.append(leaf)
        return tuple(out)

    def __call__(self, *args, **kwargs):
        import jax

        if jax.process_count() > 1:
            key = (self._sig(args),
                   self._sig(tuple(sorted(kwargs.items()))))
            if key not in self._seen:
                import zlib

                self._fn.lower(*args, **kwargs).compile()
                # deterministic digest: str hashes are per-process salted
                digest = zlib.crc32(repr(key).encode())
                barrier(f"{self._name}:{digest}")
                self._seen.add(key)
        return self._fn(*args, **kwargs)

    def __getattr__(self, item):  # delegate .lower etc.
        return getattr(self._fn, item)
