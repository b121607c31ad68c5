"""Checkpoint save/load/resume.

Capability parity with the reference's checkpoint dict {epoch, best_fitness,
model, ema, updates, optimizer, opt, date} (reference train.py:386-404),
strip_optimizer finalization (utils/general.py:997-1011) and smart_resume
(utils/torch_utils.py:361-378) — as a msgpack-serialized pytree + JSON meta,
the functional equivalent of orbax for a single-pytree state.
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    # to_state_dict turns NamedTuples (TrainState/SGDState/EMAState) into
    # plain dicts that msgpack can serialize
    tree = serialization.to_state_dict(tree)
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, state, meta: dict):
    """state: any pytree (TrainState or bare variables); meta: JSON-able."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.msgpack_serialize(_to_numpy(state))
    path.write_bytes(blob)
    meta = dict(meta)
    meta["date"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(meta, indent=1))


def load_checkpoint(path, target=None):
    """Returns (state, meta). ``target`` restores pytree types (NamedTuples)."""
    path = Path(path)
    raw = serialization.msgpack_restore(path.read_bytes())
    if target is not None:
        raw = serialization.from_state_dict(target, raw)
    meta_path = path.with_suffix(path.suffix + ".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return raw, meta


def strip_optimizer(path, out_path=None):
    """Reduce a training checkpoint to eval-only EMA variables
    (reference utils/general.py:997-1011)."""
    state, meta = load_checkpoint(path)
    ema_vars = state.get("ema", {}).get("variables") if isinstance(state, dict) else None
    if ema_vars is None:
        return path
    out = Path(out_path or path)
    save_checkpoint(out, ema_vars, {**meta, "stripped": True})
    return out
