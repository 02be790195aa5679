"""Checkpoint manager: registry JSON + msgpack pytree snapshots.

Capability of the reference's torchplus checkpoint manager
(``second/torchplus/train/checkpoint.py``: a ``checkpoints.json`` registry
per model_dir mapping name → all ckpts + latest pointer, ``save`` with
max_to_keep, ``latest_checkpoint``, ``restore_latest_checkpoints``,
interrupt-safe writes) plus the regex-filtered shape-checked partial restore
(``train.py:117,191-206`` ``filter_param_dict`` and UNet ``load_pretrain``,
models/model.py:50-60).

Serialization is flax msgpack over the full train-state pytree (params +
optimizer state + step), written to a temp file and atomically renamed — the
equivalent of the reference's ``DelayedKeyboardInterrupt`` mid-write guard.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

__all__ = [
    "save",
    "latest_checkpoint",
    "restore_latest",
    "restore",
    "partial_restore",
    "list_checkpoints",
    "repeat_eval_checkpoints",
]

_REGISTRY = "checkpoints.json"


def _read_registry(model_dir: Path) -> Dict[str, Any]:
    fp = model_dir / _REGISTRY
    if fp.exists():
        with open(fp) as f:
            return json.load(f)
    return {"checkpoints": {}, "latest": {}}


def _write_registry(model_dir: Path, reg: Dict[str, Any]) -> None:
    tmp = model_dir / (_REGISTRY + ".tmp")
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=2)
    os.replace(tmp, model_dir / _REGISTRY)


def save(model_dir, state, name: str = "model", global_step: int = 0,
         max_to_keep: int = 8) -> Path:
    """Snapshot a pytree as ``{name}-{global_step}.ckpt``; prune old ones."""
    model_dir = Path(model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    fname = f"{name}-{global_step}.ckpt"
    tmp = model_dir / (fname + ".tmp")
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    os.replace(tmp, model_dir / fname)

    reg = _read_registry(model_dir)
    ckpts: List[str] = reg["checkpoints"].setdefault(name, [])
    ckpts.append(fname)
    reg["latest"][name] = fname
    while len(ckpts) > max_to_keep:
        old = ckpts.pop(0)
        try:
            (model_dir / old).unlink()
        except FileNotFoundError:
            pass
    _write_registry(model_dir, reg)
    return model_dir / fname


def latest_checkpoint(model_dir, name: str = "model") -> Optional[Path]:
    model_dir = Path(model_dir)
    reg = _read_registry(model_dir)
    fname = reg["latest"].get(name)
    if fname and (model_dir / fname).exists():
        return model_dir / fname
    return None


def restore(path, target):
    """Load a snapshot into the structure of ``target`` (shape-checked by
    flax deserialization)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def restore_latest(model_dir, target, name: str = "model"):
    """Returns (state, step) or (target, None) if nothing to restore —
    the try_restore_latest_checkpoints auto-resume semantics."""
    path = latest_checkpoint(model_dir, name)
    if path is None:
        return target, None
    step = int(re.match(rf"{re.escape(name)}-(\d+)\.ckpt", path.name).group(1))
    return restore(path, target), step


def partial_restore(params, donor_params, include: Optional[str] = None,
                    exclude: Optional[str] = None, verbose: bool = False):
    """Copy shape-matching leaves from ``donor_params`` whose path matches
    ``include`` and not ``exclude`` (filter_param_dict / load_pretrain)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    donor_flat = dict(jax.tree_util.tree_flatten_with_path(donor_params)[0])
    inc = re.compile(include) if include else None
    exc = re.compile(exclude) if exclude else None

    out = {}
    copied = []
    for path, leaf in flat[0]:
        key = jax.tree_util.keystr(path)
        donor = donor_flat.get(path)
        take = (
            donor is not None
            and np.shape(donor) == np.shape(leaf)
            and (inc is None or inc.search(key))
            and (exc is None or not exc.search(key))
        )
        out[path] = donor if take else leaf
        if take:
            copied.append(key)
    if verbose:
        print(f"partial_restore: copied {len(copied)}/{len(flat[0])} leaves")
    leaves = [out[path] for path, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def list_checkpoints(model_dir, name: str = "model") -> List[Path]:
    """All registered checkpoints for ``name``, oldest first."""
    model_dir = Path(model_dir)
    reg = _read_registry(model_dir)
    return [
        model_dir / f
        for f in reg["checkpoints"].get(name, [])
        if (model_dir / f).exists()
    ]


def repeat_eval_checkpoints(
    model_dir,
    eval_fn,
    name: str = "model",
    poll_interval: float = 1.0,
    max_idle_polls: int = 5,
    record_file: str = "eval_done.json",
) -> Dict[int, Any]:
    """Checkpoint-watching repeat eval (``repeat_eval_ckpt``,
    PointRCNN/tools/eval_rcnn.py:793): poll the registry, evaluate every
    not-yet-evaluated checkpoint in step order via ``eval_fn(path, step)``,
    and persist the evaluated-step record to ``record_file`` in the model
    dir (the reference's ``eval_list_*.txt``) so restarts skip finished
    work. Stops after ``max_idle_polls`` consecutive polls that surface no
    new checkpoint (the reference's wait-minutes cap).

    Returns {step: eval_fn result} for the checkpoints evaluated THIS call.
    """
    import time as _time

    model_dir = Path(model_dir)
    rec_path = model_dir / record_file
    done = set()
    if rec_path.exists():
        with open(rec_path) as f:
            done = set(json.load(f).get(name, []))
    results: Dict[int, Any] = {}
    idle = 0
    pat = re.compile(rf"{re.escape(name)}-(\d+)\.ckpt")
    while idle < max_idle_polls:
        fresh = []
        for path in list_checkpoints(model_dir, name):
            m = pat.match(path.name)
            if not m:
                continue
            step = int(m.group(1))
            if step not in done:
                fresh.append((step, path))
        if not fresh:
            idle += 1
            _time.sleep(poll_interval)
            continue
        idle = 0
        for step, path in sorted(fresh):
            results[step] = eval_fn(path, step)
            done.add(step)
            rec = {}
            if rec_path.exists():
                with open(rec_path) as f:
                    rec = json.load(f)
            rec[name] = sorted(done)
            tmp = model_dir / (record_file + ".tmp")
            with open(tmp, "w") as f:
                json.dump(rec, f)
            os.replace(tmp, rec_path)
    return results
