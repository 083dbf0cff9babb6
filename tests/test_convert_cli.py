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


def test_overlay_tree_shape_mismatch_keeps_init():
    from pixelpick_tpu.models.convert import overlay_tree

    base = {"a": {"w": np.zeros((2, 2))}, "b": np.ones(3)}
    new = {"a": {"w": np.full((2, 2), 5.0)}, "b": np.zeros(99)}
    out = overlay_tree(base, new)
    np.testing.assert_array_equal(out["a"]["w"], np.full((2, 2), 5.0))
    np.testing.assert_array_equal(out["b"], np.ones(3))  # mismatched shape
