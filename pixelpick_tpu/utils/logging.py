"""CSV logging, byte-compatible with the reference's ``write_log``
(``/root/reference/utils/utils.py:66-72``): passing ``header`` truncates and
writes the header line; passing ``list_entities`` appends one CSV row."""

from __future__ import annotations


def write_log(fp: str, list_entities=None, header=None) -> None:
    mode = "w" if header is not None else "a"
    with open(fp, mode) as f:
        if header is not None:
            f.write(",".join(str(h) for h in header) + "\n")
        if list_entities is not None:
            f.write(",".join(str(e) for e in list_entities) + "\n")


def zip_dir(d: str, fp: str = None, fmt: str = "zip",
            remove_dir: bool = False) -> str:
    """Archive a directory (reference ``utils/utils.py:54-63``)."""
    import os
    from shutil import make_archive, rmtree

    assert os.path.isdir(d), f"{d} does not exist."
    if fp is None:
        fp = d
    make_archive(fp, fmt, d)
    if remove_dir:
        rmtree(d)
    return f"{fp}.{fmt}"


def get_dict_label_cnt(arr_masks, arr_labels) -> dict:
    """Label histogram of picked pixels (reference ``utils/utils.py:338-350``)."""
    import numpy as np

    cnt: dict = {}
    for mask, label in zip(arr_masks, arr_labels):
        sel = np.asarray(label).reshape(-1)[np.asarray(mask).reshape(-1)]
        vals, counts = np.unique(sel, return_counts=True)
        for v, c in zip(vals.tolist(), counts.tolist()):
            cnt[v] = cnt.get(v, 0) + c
    return cnt
