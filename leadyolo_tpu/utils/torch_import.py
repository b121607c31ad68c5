"""Load reference PyTorch checkpoints WITHOUT their class definitions.

The reference pickles whole nn.Module trees into its .pt files (reference
train.py:386-396), so ordinary torch.load needs models/*.py importable —
SURVEY.md §7 hard part 5. Instead we unpickle with stub classes: any missing
class resolves to a generic recorder object, torch's persistent_load still
rehydrates the raw tensors, and we walk the recovered ``_modules``/
``_parameters``/``_buffers`` tree to produce a flat name->tensor state dict
plus the model metadata (yaml cfg, nc, names, anchors).
"""
from __future__ import annotations

import io
import pickle
import zipfile
from pathlib import Path

import numpy as np
import torch


class _Stub:
    """Stands in for any unimportable class; records pickled state."""

    _stub_name = "?"

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __repr__(self):
        return f"<stub {type(self).__name__}>"


_SAFE_PREFIXES = ("torch", "collections", "numpy", "builtins", "__builtin__", "argparse", "pathlib")


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] in _SAFE_PREFIXES:
            try:
                return super().find_class(module, name)
            except Exception:
                pass
        return type(name, (_Stub,), {"_stub_name": f"{module}.{name}", "__module__": module})


def load_torch_checkpoint(path):
    """torch.load equivalent returning the raw object graph with stubbed
    classes (tensors fully rehydrated on CPU)."""
    return torch.load(
        Path(path), map_location="cpu", pickle_module=_StubModule, weights_only=False
    )


class _StubModule:
    """pickle-module shim for torch.load."""

    Unpickler = _StubUnpickler
    load = staticmethod(lambda f, **k: _StubUnpickler(f, **k).load())


def walk_module(obj, prefix="", out=None):
    """Recursively collect name->tensor from a stubbed nn.Module tree."""
    if out is None:
        out = {}
    d = getattr(obj, "__dict__", {})
    for coll in ("_parameters", "_buffers"):
        for name, t in (d.get(coll) or {}).items():
            if t is not None and isinstance(t, torch.Tensor):
                out[prefix + name] = t
    for name, child in (d.get("_modules") or {}).items():
        if child is not None:
            walk_module(child, prefix + name + ".", out)
    return out


def extract_state(path):
    """Load a reference checkpoint -> (state_dict {name: np.ndarray fp32},
    meta {nc, names, yaml, anchors, epoch, best_fitness}).

    Prefers the EMA copy like the reference's attempt_load
    (models/experimental.py:85: ckpt['ema'] or ckpt['model']).
    """
    ckpt = load_torch_checkpoint(path)
    meta = {}
    model = None
    if isinstance(ckpt, dict):
        model = ckpt.get("ema") or ckpt.get("model")
        for k in ("epoch", "best_fitness"):
            if k in ckpt:
                try:
                    meta[k] = float(ckpt[k]) if ckpt[k] is not None else None
                except (TypeError, ValueError):
                    pass
    else:
        model = ckpt
    assert model is not None, f"no model in checkpoint {path}"

    d = getattr(model, "__dict__", {})
    meta["yaml"] = d.get("yaml")
    meta["nc"] = d.get("nc") or (d.get("yaml") or {}).get("nc")
    meta["names"] = d.get("names")
    meta["hyp"] = d.get("hyp")
    meta["stride"] = _to_np(d.get("stride"))

    raw = walk_module(model)
    state = {k: _to_np(v) for k, v in raw.items()}
    # detect head anchors buffer
    for k in list(state):
        if k.endswith(".anchors"):
            meta["anchors"] = state[k]
    return state, meta


def _to_np(t):
    if isinstance(t, torch.Tensor):
        return t.detach().float().cpu().numpy()
    return t
