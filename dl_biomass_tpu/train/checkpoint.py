"""Orbax checkpointing with save-on-best + real resume.

The reference checkpoints by pickling the whole torch module whenever val MSE hits
a new minimum (``main.py:242-245``) and loads "the newest .model by ctime"
(``testing_model.py:30-37``); optimizer state is never saved, so training can
never resume. Here a checkpoint is params + batch_stats + opt_state + metadata,
and ``latest_checkpoint`` gives the newest-by-step semantics explicitly.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _ckpt_dir(base: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(base), f"epoch_{epoch:05d}")


def save_checkpoint(base_dir: str, state, *, epoch: int, val_mse: float) -> str:
    """Save a full training state; returns the checkpoint path."""
    os.makedirs(base_dir, exist_ok=True)
    path = _ckpt_dir(base_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(base_dir, f"epoch_{epoch:05d}.meta.json"), "w") as f:
        json.dump({"epoch": epoch, "val_mse": float(val_mse)}, f)
    return path


def latest_checkpoint(base_dir: str) -> Optional[str]:
    """Newest checkpoint path by epoch (explicit analog of the reference's
    newest-.model-by-ctime lookup)."""
    if not os.path.isdir(base_dir):
        return None
    subdirs = sorted(
        d for d in os.listdir(base_dir)
        if d.startswith("epoch_") and os.path.isdir(os.path.join(base_dir, d))
    )
    return os.path.join(os.path.abspath(base_dir), subdirs[-1]) if subdirs else None


def restore_checkpoint(path: str, target) -> Any:
    """Restore into the structure of ``target``.

    Only the shape/dtype structure of ``target`` is used — the arrays themselves
    are never read, so a stale state whose buffers were donated to a jitted
    train step (``Trainer._build_train_step`` uses donate_argnums) is a valid
    target.
    """
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), target
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=abstract)


def restore_latest(base_dir: str, target) -> Tuple[Optional[Any], Optional[dict]]:
    """Restore the newest checkpoint + its metadata, or (None, None)."""
    path = latest_checkpoint(base_dir)
    if path is None:
        return None, None
    meta_path = path + ".meta.json"
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return restore_checkpoint(path, target), meta
