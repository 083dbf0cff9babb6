"""Orbax async checkpoint backend (--ckpt_backend orbax): round-trip
equality with the msgpack default, async-save durability via
wait_for_checkpoints, and load_checkpoint's backend auto-detection."""

import numpy as np
import jax
import jax.numpy as jnp

from pixelpick_tpu.engine.checkpoint import (
    load_checkpoint, save_checkpoint, wait_for_checkpoints)


def _tree(seed):
    k = jax.random.PRNGKey(seed)
    params = {"layer": {"kernel": jax.random.normal(k, (4, 3)),
                        "bias": jnp.zeros((3,))}}
    stats = {"bn": {"mean": jnp.ones((3,)), "var": jnp.full((3,), 2.0)}}
    return params, stats


def test_orbax_roundtrip_and_autodetect(tmp_path):
    params, stats = _tree(0)
    p_tmpl, s_tmpl = _tree(1)  # different values, same structure

    path_o = str(tmp_path / "best_miou_model.ckpt")
    save_checkpoint(path_o, params, stats, backend="orbax")
    wait_for_checkpoints()

    path_m = str(tmp_path / "msgpack.ckpt")
    save_checkpoint(path_m, params, stats, backend="msgpack")

    for path in (path_o, path_m):
        p2, s2 = load_checkpoint(path, p_tmpl, s_tmpl)
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s2), jax.tree.leaves(stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_orbax_overwrite_on_improvement(tmp_path):
    """The driver saves into the same path each time val mIoU improves."""
    path = str(tmp_path / "best.ckpt")
    p1, s1 = _tree(0)
    p2, s2 = _tree(2)
    save_checkpoint(path, p1, s1, backend="orbax")
    save_checkpoint(path, p2, s2, backend="orbax")
    wait_for_checkpoints()
    got_p, _ = load_checkpoint(path, *_tree(1))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(got_p)[0]),
        np.asarray(jax.tree.leaves(p2)[0]))


def test_orbax_crash_safety_keeps_previous_step(tmp_path):
    """A save never deletes the previous checkpoint until the new one is
    durable: each save goes to a fresh committed step dir, and pruning only
    happens on the NEXT save after wait_until_finished."""
    import os

    from pixelpick_tpu.engine.checkpoint import _orbax_steps

    path = str(tmp_path / "best.ckpt")
    p1, s1 = _tree(0)
    p2, s2 = _tree(2)
    p3, s3 = _tree(3)
    save_checkpoint(path, p1, s1, backend="orbax")
    save_checkpoint(path, p2, s2, backend="orbax")
    wait_for_checkpoints()
    root = os.path.abspath(path) + ".orbax"
    # both steps may coexist right after the second save; a third save
    # prunes everything but the newest durable step
    assert _orbax_steps(root)[-1] == 1
    save_checkpoint(path, p3, s3, backend="orbax")
    wait_for_checkpoints()
    steps = _orbax_steps(root)
    assert steps[-1] == 2 and 0 not in steps
    got_p, _ = load_checkpoint(path, *_tree(1))
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(got_p)[0]),
        np.asarray(jax.tree.leaves(p3)[0]))
