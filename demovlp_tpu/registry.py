"""Name -> constructor registry.

Replaces the reference's reflection factory
(parse_config_dist_multi.py:73-100, `getattr(module, config[name]['type'])`)
with an explicit registry: same JSON configs resolve to the new classes, but
lookup is declared, greppable, and extensible via `register`.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Dict[str, Callable]] = {
    "arch": {},
    "loss": {},
    "data_loader": {},
    "metric": {},
    "visualizer": {},
    "optimizer": {},
}


def register(kind: str, name: str | None = None):
    def deco(fn):
        _REGISTRY[kind][name or fn.__name__] = fn
        return fn

    return deco


def lookup(kind: str, name: str) -> Callable:
    try:
        return _REGISTRY[kind][name]
    except KeyError:
        known = sorted(_REGISTRY.get(kind, {}))
        raise KeyError(f"unknown {kind} type {name!r}; known: {known}") from None


def _populate() -> None:
    """Wire the built-in components. Deferred so importing the registry does
    not pull in heavyweight deps at module import time."""
    if _REGISTRY["arch"]:
        return
    from demovlp_tpu import losses as L
    from demovlp_tpu import metrics as M
    from demovlp_tpu.data.loader import MultiDistTextObjectVideoDataLoader
    from demovlp_tpu.models import (
        ObjectRelation,
        ObjectQARelation,
        ObjectMCRelation,
    )
    from demovlp_tpu.utils.visualizer import RetrievalVis

    for cls in (ObjectRelation, ObjectQARelation, ObjectMCRelation):
        _REGISTRY["arch"][cls.__name__] = cls
    for cls in (
        L.GlobalLocalLoss,
        L.NormSoftmaxLoss,
        L.RWALoss,
        L.CrossEntropy,
        L.MaxMarginRankingLoss,
    ):
        _REGISTRY["loss"][cls.__name__] = cls
    _REGISTRY["data_loader"][
        "MultiDistTextObjectVideoDataLoader"
    ] = MultiDistTextObjectVideoDataLoader
    _REGISTRY["metric"]["t2v_metrics"] = M.t2v_metrics
    _REGISTRY["metric"]["v2t_metrics"] = M.v2t_metrics
    _REGISTRY["metric"]["evaluate_qa"] = M.evaluate_qa
    _REGISTRY["metric"]["evaluate_mc"] = M.evaluate_mc
    _REGISTRY["visualizer"]["RetrievalVis"] = RetrievalVis


def build(kind: str, name: str, *args, **kwargs) -> Any:
    _populate()
    return lookup(kind, name)(*args, **kwargs)
