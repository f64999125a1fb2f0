"""Checkpoint save/restore — params + optimizer state + epoch + RNG key.

The reference's checkpointing is vestigial: ``--save_model_dir`` exists but is
never written (zero ``torch.save`` calls in the repo), and loading is
whole-module pickling in test mode only (``code/run_train_erc.py:532``).  We
fix the gap while keeping the flag surface: real save/restore of the full
training state, atomic writes, and preemption recovery for sweep runs (a
completed config is detected by its final checkpoint).

Format: a directory per step holding ``state.msgpack`` (flax/msgpack of the
param + opt-state pytree) and ``meta.json`` (epoch, rng key, config echo,
metric history).  No framework lock-in, no orbax daemon threads.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(directory: str, state: Any, meta: Optional[Dict] = None,
                    name: str = "best") -> str:
    """Atomically write ``state`` (arbitrary pytree) under ``directory/name``."""
    os.makedirs(directory, exist_ok=True)
    final = os.path.join(directory, name)
    tmp = tempfile.mkdtemp(dir=directory, prefix=f".{name}.tmp")
    try:
        with open(os.path.join(tmp, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(_to_host(state)))
        with open(os.path.join(tmp, "meta.json"), "w") as f:
            json.dump(meta or {}, f, indent=2, default=str)
        # Keep the previous checkpoint recoverable at every instant: rename
        # it aside, swap the new one in, then drop the old copy — a crash
        # between steps leaves either the old or the new state on disk.
        old = final + ".old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        had_prev = os.path.isdir(final)
        if had_prev:
            os.replace(final, old)
        try:
            os.replace(tmp, final)
        except BaseException:
            if had_prev:
                os.replace(old, final)
            raise
        if had_prev:
            shutil.rmtree(old, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return final


def restore_checkpoint(directory: str, target: Any,
                       name: str = "best") -> Tuple[Any, Dict]:
    """Restore into the structure of ``target`` (an example pytree)."""
    path = os.path.join(directory, name)
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.from_bytes(target, f.read())
    return state, read_meta(directory, name)


def has_checkpoint(directory: str, name: str = "best") -> bool:
    return os.path.exists(os.path.join(directory, name, "state.msgpack"))


def read_meta(directory: str, name: str = "best") -> Dict:
    """Read a checkpoint's metadata without restoring the state (needed to
    reconstruct the model config before a template state can be built)."""
    path = os.path.join(directory, name, "meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)
