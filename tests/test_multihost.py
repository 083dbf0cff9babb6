"""Multi-HOST (multi-process) data parallelism over jax.distributed.

The reference has no distributed code at all (SURVEY §2.2); the TPU-native
scale-out is one JAX process per host wired by ``jax.distributed.initialize``
(``parallel/distributed.py``). Proven here with two real OS processes of 4
virtual CPU devices each, joined into ONE global 8-device ``('data',)``
mesh with gloo collectives: the real train step over process-locally-fed
global batches produces the SAME loss and confusion matrix as a
single-process 8-device run of identical seeds.
"""

import os
import socket
import subprocess
import sys
import re

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same 3 steps on this process's own 8-device mesh."""
    import flax.linen as nn
    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.engine.optim import make_optimizer
    from pixelpick_tpu.engine.trainer import create_train_state, make_train_step
    from pixelpick_tpu.parallel.mesh import get_mesh, shard_batch, shard_pytree

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False, mc_dropout_on=False, upsample=True):
            h = nn.Conv(8, (3, 3), padding=1, name="c1")(x)
            pred = nn.Conv(4, (1, 1), name="cls")(nn.relu(h))
            return {"pred": pred, "emb": h}

    args = default_args(write_files=False, dataset_name="cv")
    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((8, 16, 16, 3)))
    tx = make_optimizer(args, variables["params"], iters_per_epoch=5)
    step = make_train_step(model, tx, n_classes=4, mean=[0.5] * 3,
                           std=[0.25] * 3, donate=False)
    mesh = get_mesh(n_devices=8)
    state = shard_pytree(create_train_state(variables["params"], {}, tx), mesh)
    loss = hist = None
    for i in range(3):
        rng = np.random.default_rng(100 + i)
        batch = {
            "x": rng.integers(0, 255, (8, 16, 16, 3), dtype=np.uint8),
            "coords": rng.integers(0, 16, (8, 6, 2)).astype(np.int32),
            "labels": rng.integers(0, 4, (8, 6)).astype(np.int32),
            "valid": np.ones((8, 6), bool),
        }
        state, loss, hist = step(state, shard_batch(batch, mesh),
                                 jax.random.PRNGKey(1))
    return float(loss), int(np.asarray(hist).sum())


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device flag
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        m = re.search(r"RESULT (\d) loss=([\d.eE+-]+) hist=(\d+)", out)
        assert m, out[-3000:]
        results[int(m.group(1))] = (float(m.group(2)), int(m.group(3)))
    assert set(results) == {0, 1}
    # both processes observe the identical global result
    assert results[0] == results[1], results

    loss_ref, hist_ref = _single_process_reference()
    loss_mh, hist_mh = results[0]
    assert np.isclose(loss_mh, loss_ref, rtol=1e-5), (loss_mh, loss_ref)
    assert hist_mh == hist_ref
