"""Pretrained-checkpoint conversion pipeline: torch file -> msgpack ->
partial overlay onto fresh variables."""

import subprocess
import sys

import numpy as np
import pytest
import jax

torch = pytest.importorskip("torch")


def test_convert_cli_and_overlay(tmp_path):
    # build a reference-shaped torch MobileNetV2 and save it
    sys.path.append("/root/reference")
    import torch.utils.model_zoo as mz
    mz.load_url = lambda *a, **k: {}
    import torch.nn as tnn
    from networks.mobilenet_v2 import MobileNetV2 as TorchMNv2

    torch.manual_seed(0)
    m = TorchMNv2(output_stride=16, BatchNorm=tnn.BatchNorm2d, pretrained=False)
    src = tmp_path / "mnv2.pth"
    torch.save(m.state_dict(), src)

    dst = tmp_path / "mnv2.ckpt"
    out = subprocess.run(
        [sys.executable, "-m", "pixelpick_tpu.models.convert", str(src),
         str(dst), "--kind", "mobilenet_v2"],
        capture_output=True, text=True, cwd="/root/repo")
    assert out.returncode == 0, out.stderr
    assert dst.exists()

    from pixelpick_tpu.config import default_args
    from pixelpick_tpu.models import get_model, init_model
    from pixelpick_tpu.models.convert import load_pretrained_ckpt

    args = default_args("cv")
    model = get_model(args)
    params, stats = init_model(model, jax.random.PRNGKey(0), (48, 64))
    p0 = np.asarray(params["backbone"]["stem"]["kernel"]).copy()
    head0 = np.asarray(params["seg_head"]["conv1"]["kernel"]).copy()

    params2, stats2 = load_pretrained_ckpt(params, stats, str(dst))
    # backbone overlaid with the torch weights...
    torch_stem = m.state_dict()["features.0.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(params2["backbone"]["stem"]["kernel"]),
                               torch_stem)
    assert not np.allclose(np.asarray(params2["backbone"]["stem"]["kernel"]), p0)
    # ...while heads keep their fresh init (partial load)
    np.testing.assert_array_equal(
        np.asarray(params2["seg_head"]["conv1"]["kernel"]), head0)


def test_fetch_uses_cache_and_converts(tmp_path, monkeypatch):
    """--fetch NAME: with the upstream file already in the cache dir
    (the offline workflow the fetch error message describes), the one-liner
    converts it without touching the network."""
    sys.path.append("/root/reference")
    import torch.utils.model_zoo as mz
    mz.load_url = lambda *a, **k: {}
    import torch.nn as tnn
    from networks.mobilenet_v2 import MobileNetV2 as TorchMNv2

    cache = tmp_path / "cache"
    cache.mkdir()
    m = TorchMNv2(output_stride=16, BatchNorm=tnn.BatchNorm2d, pretrained=False)
    torch.save(m.state_dict(), cache / "mobilenet_v2-6a65762b.pth")

    import os
    env = dict(os.environ, HOME=str(tmp_path))
    os.makedirs(tmp_path / ".cache" / "pixelpick_tpu", exist_ok=True)
    torch.save(m.state_dict(),
               tmp_path / ".cache" / "pixelpick_tpu" / "mobilenet_v2-6a65762b.pth")
    dst = tmp_path / "mnv2.ckpt"
    out = subprocess.run(
        [sys.executable, "-m", "pixelpick_tpu.models.convert",
         "--fetch", "mobilenet_v2", str(dst)],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr
    assert "using cached" in out.stdout
    assert dst.exists()


def test_fetch_fails_gracefully_offline(tmp_path):
    import os
    env = dict(os.environ, HOME=str(tmp_path))
    out = subprocess.run(
        [sys.executable, "-m", "pixelpick_tpu.models.convert",
         "--fetch", "mobilenet_v2", str(tmp_path / "x.ckpt")],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode != 0
    assert "no egress" in (out.stdout + out.stderr)


def test_overlay_tree_shape_mismatch_keeps_init():
    from pixelpick_tpu.models.convert import overlay_tree

    base = {"a": {"w": np.zeros((2, 2))}, "b": np.ones(3)}
    new = {"a": {"w": np.full((2, 2), 5.0)}, "b": np.zeros(99)}
    out = overlay_tree(base, new)
    np.testing.assert_array_equal(out["a"]["w"], np.full((2, 2), 5.0))
    np.testing.assert_array_equal(out["b"], np.ones(3))  # mismatched shape
