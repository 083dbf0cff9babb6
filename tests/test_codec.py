import pickle as pkl

import numpy as np
import pytest

from pixelpick_tpu.active.codec import (
    encode_query, decode_queries, decode_query,
    gather_previous_query_files, merge_previous_query_files,
)


def test_encode_decode_roundtrip_bool_mask():
    rng = np.random.default_rng(0)
    q = rng.random((36, 48)) < 0.01
    enc = encode_query("img_a.png", (36, 48), q)
    info = enc["img_a.png"]
    assert info["height"] == 36 and info["width"] == 48
    # np.where order: row-major
    ys, xs = np.where(q)
    np.testing.assert_array_equal(info["y_coords"], ys)
    np.testing.assert_array_equal(info["x_coords"], xs)

    dec = decode_queries(enc)
    assert len(dec) == 1 and dec[0].dtype == bool
    np.testing.assert_array_equal(dec[0], q)


def test_decode_with_category_ids_gives_label_map():
    enc = {"i.png": {"height": 4, "width": 5, "y_coords": np.array([0, 2]),
                     "x_coords": np.array([1, 3]), "category_id": [7, 3]}}
    m = decode_query(enc["i.png"], ignore_index=255)
    assert m.dtype == np.int64
    assert m[0, 1] == 7 and m[2, 3] == 3
    assert (m == 255).sum() == 4 * 5 - 2


def test_decode_sorted_by_path_and_dict_mode():
    q = np.zeros((2, 2), dtype=bool); q[0, 0] = True
    enc = {}
    enc.update(encode_query("b.png", (2, 2), q))
    enc.update(encode_query("a.png", (2, 2), ~q))
    as_list = decode_queries(enc)
    # sorted: a.png first
    np.testing.assert_array_equal(as_list[0], ~q)
    as_dict = decode_queries(enc, return_as_dict=True)
    assert list(as_dict) == ["a.png", "b.png"]
    with pytest.raises(ValueError):
        decode_queries({})


def test_merge_previous_query_files(tmp_path):
    ignore = 255
    d0 = tmp_path / "0_query"; d0.mkdir()
    d1 = tmp_path / "1_query"; d1.mkdir()
    e0 = {"x.png": {"height": 3, "width": 3, "y_coords": np.array([0]),
                    "x_coords": np.array([0]), "category_id": [4]}}
    e1 = {"x.png": {"height": 3, "width": 3, "y_coords": np.array([1]),
                    "x_coords": np.array([2]), "category_id": [9]}}
    pkl.dump(e0, open(d0 / "queries.pkl", "wb"))
    pkl.dump(e1, open(d1 / "queries.pkl", "wb"))

    files = gather_previous_query_files(str(tmp_path))
    assert len(files) == 2
    merged = merge_previous_query_files(sorted(files), ignore_index=ignore, verbose=False)
    m = merged["x.png"]
    assert m[0, 0] == 4 and m[1, 2] == 9
    assert (m == ignore).sum() == 7


def test_query_npy_roundtrip(tmp_path):
    from pixelpick_tpu.active.codec import save_query_npy, load_query_npy

    rng = np.random.default_rng(3)
    qs = [rng.random((6, 8)) < 0.1 for _ in range(4)]
    p = str(tmp_path / "query.npy")
    save_query_npy(qs, p)
    back = load_query_npy(p)
    assert len(back) == 4
    for a, b in zip(qs, back):
        np.testing.assert_array_equal(a, b)
