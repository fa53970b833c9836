"""JSON/JSONL IO and small dict helpers.

Covers the utility surface of the reference's utils/util.py:120-147
(read/write json and jsonl), :139 (merge_dicts), :16
(replace_nested_dict_item) and utils/util.py flat_list_of_lists.
"""
from __future__ import annotations

import json
from collections import OrderedDict
from pathlib import Path
from typing import Any, Iterable


def read_json(fname) -> dict:
    fname = Path(fname)
    with fname.open("rt") as handle:
        return json.load(handle, object_hook=OrderedDict)


def write_json(content, fname) -> None:
    fname = Path(fname)
    with fname.open("wt") as handle:
        json.dump(content, handle, indent=4, sort_keys=False)


def load_json(filename) -> Any:
    with open(filename, "r") as f:
        return json.load(f)


def save_json(data, filename, save_pretty=False, sort_keys=False) -> None:
    with open(filename, "w") as f:
        if save_pretty:
            f.write(json.dumps(data, indent=4, sort_keys=sort_keys))
        else:
            json.dump(data, f)


def load_jsonl(filename) -> list:
    with open(filename, "r") as f:
        return [json.loads(line.strip("\n")) for line in f.readlines()]


def save_jsonl(data: Iterable, filename) -> None:
    with open(filename, "w") as f:
        f.write("\n".join(json.dumps(e) for e in data))


def merge_dicts(list_dicts: list) -> dict:
    merged_dict = list_dicts[0].copy()
    for i in range(1, len(list_dicts)):
        merged_dict.update(list_dicts[i])
    return merged_dict


def flat_list_of_lists(l: list) -> list:
    """flatten a list of lists [[1,2], [3,4]] to [1,2,3,4]"""
    return [item for sublist in l for item in sublist]


def inf_loop(data_loader):
    """Endlessly cycle a loader (reference utils/util.py:149) — powers
    iteration-based (len_epoch) training."""
    from itertools import repeat

    for loader in repeat(data_loader):
        yield from loader


def compute_iou(box_a, box_b) -> float:
    """IoU of two xyxy boxes (reference utils/util.py:84)."""
    xa = max(box_a[0], box_b[0])
    ya = max(box_a[1], box_b[1])
    xb = min(box_a[2], box_b[2])
    yb = min(box_a[3], box_b[3])
    inter = max(0.0, xb - xa) * max(0.0, yb - ya)
    area_a = (box_a[2] - box_a[0]) * (box_a[3] - box_a[1])
    area_b = (box_b[2] - box_b[0]) * (box_b[3] - box_b[1])
    denom = area_a + area_b - inter
    return float(inter / denom) if denom > 0 else 0.0


_MEMCACHE = {}


def memcache(path):
    """Small memoized numpy loader (reference utils/util.py:162-191)."""
    import numpy as np

    key = str(path)
    if key not in _MEMCACHE:
        _MEMCACHE[key] = np.load(key, allow_pickle=True)
    return _MEMCACHE[key]


def replace_nested_dict_item(obj: dict, key, replace_value) -> dict:
    """Recursively replace every value stored under `key` in a nested dict."""
    for k, v in obj.items():
        if isinstance(v, dict):
            obj[k] = replace_nested_dict_item(v, key, replace_value)
    if key in obj:
        obj[key] = replace_value
    return obj
