"""VIA bridge + annotation GUI plumbing (reference via/, annotation_tool/)."""

import json
import pickle as pkl

import numpy as np

from pixelpick_tpu.active import codec
from pixelpick_tpu.human.via import (
    build_via_project, convert_via_json, coords_to_grid, write_project_js,
)
from pixelpick_tpu.human.annotation import annotate_dataset, default_key_mapping
from pixelpick_tpu.utils.palettes import CV_LABEL_CATEGORY


def _queries_dict():
    q = np.zeros((6, 8), bool)
    q[1, 2] = q[4, 7] = True
    enc = codec.encode_query("imgs/a.png", (6, 8), q)
    q2 = np.zeros((6, 8), bool)
    q2[0, 0] = True
    enc.update(codec.encode_query("imgs/b.png", (6, 8), q2))
    return enc


def test_via_project_structure(tmp_path):
    enc = _queries_dict()
    mapping = {"A": "sky", "B": "road"}
    proj = build_via_project(enc, mapping)
    assert proj["project"]["data_format_version"] == "3.1.1"
    assert len(proj["file"]) == 2 and len(proj["view"]) == 2
    assert len(proj["metadata"]) == 3  # total queried pixels
    for md in proj["metadata"].values():
        assert md["xy"][0] == 1 and len(md["xy"]) == 3
    assert proj["attribute"]["1"]["options"] == {"A": "sky", "B": "road"}

    p = write_project_js(proj, str(tmp_path / "proj.js"))
    text = open(p).read()
    assert text.startswith("_via_dp = ")
    json.loads(text[len("_via_dp = "):])  # valid JSON payload


def test_via_roundtrip_to_labelled_pkl():
    enc = _queries_dict()
    proj = build_via_project(enc, {"A": "sky", "B": "road"})
    # simulate the human: label every point with key 'a'
    for md in proj["metadata"].values():
        md["av"] = {"1": "a"}
    out = convert_via_json(
        proj, k_to_category={"a": "sky", "b": "road"},
        k_to_category_id={"a": 0, "b": 3},
        image_sizes={"imgs/a.png": (6, 8), "imgs/b.png": (6, 8)},
        verbose=False)
    assert set(out) == {"imgs/a.png", "imgs/b.png"}
    rec = out["imgs/a.png"]
    assert rec["category_id"] == [0, 0] and rec["category"] == ["sky", "sky"]
    # decodes into an int64 label map through the standard codec
    m = codec.decode_query(rec, ignore_index=255)
    assert m.dtype == np.int64 and (m != 255).sum() == 2

    # unlabelled point is skipped with a warning (convert_json_to_pkl.py:49-53)
    proj2 = build_via_project(enc, {"A": "sky"})
    out2 = convert_via_json(proj2, {"a": "sky"}, {"a": 0},
                            image_sizes={"imgs/a.png": (6, 8),
                                         "imgs/b.png": (6, 8)}, verbose=False)
    assert out2 == {}


def test_serve_delivers_vendored_annotator_and_project_js(tmp_path):
    """End-to-end browser flow plumbing: serve() must stage the vendored VIA
    annotator html (BSD asset, human/assets/) into the served directory and
    deliver it byte-for-byte alongside the generated project JS — the
    reference's launch_via.py:53-95 behaviour."""
    import urllib.request
    from pixelpick_tpu.human.via import annotator_asset_path, serve

    enc = _queries_dict()
    write_project_js(build_via_project(enc, {"A": "sky"}),
                     str(tmp_path / "via_debug_project.js"))
    httpd = serve(str(tmp_path), port=0, open_browser=False, block=False)
    try:
        base = f"http://localhost:{httpd.server_port}"
        page = urllib.request.urlopen(
            f"{base}/via_pixelpick_annotator.html", timeout=10).read()
        with open(annotator_asset_path(), "rb") as f:
            assert page == f.read()
        assert b"draw_pixelpick" in page  # the PixelPick overlay hooks
        js = urllib.request.urlopen(
            f"{base}/via_debug_project.js", timeout=10).read()
        assert js.startswith(b"_via_dp = ")
    finally:
        httpd.shutdown()


def test_coords_to_grid():
    g = coords_to_grid((4, 5), x_coords=[1, 3], y_coords=[0, 2])
    assert g[0, 1] and g[2, 3] and g.sum() == 2


def test_annotation_gui_headless_gt_mode(tmp_path):
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (6, 8, 3), dtype=np.uint8)]
    gts = [rng.integers(0, 11, (6, 8)).astype(np.int32)]
    q = np.zeros((6, 8), bool)
    q[1, 2] = q[3, 4] = True
    out = annotate_dataset(imgs, [q], ["x.png"], CV_LABEL_CATEGORY,
                           gt_labels=gts, dir_log=str(tmp_path / "logs"),
                           labels_from_gt=True)
    rec = out["x.png"]
    assert len(rec["category_id"]) == 2
    assert rec["category_id"][0] == int(gts[0][rec["y_coords"][0], rec["x_coords"][0]])
    log = (tmp_path / "logs" / "x.txt").read_text().splitlines()
    assert log[0] == "loc,label,elapsed_time,total_time"
    assert len(log) == 3


def test_default_key_mapping():
    m = default_key_mapping(CV_LABEL_CATEGORY)
    assert m["a"] == 0 and m["l"] == 11 and len(m) == 12
