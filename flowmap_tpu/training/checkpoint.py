"""Checkpoint save/restore via Orbax.

Parity targets: Lightning ModelCheckpoint every n steps
(`flowmap/misc/common_training_setup.py:23-29`), weights-only resume for
overfit (`overfit.py:89-92` — `strict=False`, optimizer restarts) and full
trainer-state resume for pretrain (`pretrain.py:74`). Orbax gives atomic,
async-capable, sharding-aware checkpoints — the TPU-native equivalent.
"""

from __future__ import annotations

import atexit
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

# Async writer for the periodic in-training checkpoints: the device→host
# fetch happens at save() time but serialization/IO runs on a background
# thread, so the train loop resumes immediately instead of stalling for
# the write (a full pretrain state is ~250 MB). Orbax guarantees atomicity
# (the step dir is renamed into place only when complete).
_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _close_async_checkpointer() -> None:
    global _async_ckptr
    if _async_ckptr is not None:
        _async_ckptr.close()  # waits for pending commits, then releases
        _async_ckptr = None


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_close_async_checkpointer)
    return _async_ckptr


def wait_for_checkpoints() -> None:
    """Block until every pending async checkpoint write has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(path: Path, state: Any, step: int, block: bool = False) -> None:
    """Write a full train-state checkpoint at `path`/<step> (async by
    default — call `wait_for_checkpoints()` or pass block=True to ensure
    durability; training loops call it at the end of the run)."""
    path = Path(path).resolve()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = _get_async_checkpointer()
    # No force=True: an existing step dir (e.g. re-running into the same
    # output_dir) raises instead of silently destroying prior checkpoints —
    # the same protective behavior as the previous synchronous writer.
    ckptr.save(path / f"{step}", args=ocp.args.StandardSave(state))
    if block:
        ckptr.wait_until_finished()


def restore_checkpoint(path: Path, target: Any) -> Any:
    """Restore a full train state saved by `save_checkpoint` (exact step dir
    or a checkpoint root, in which case the latest step is used)."""
    wait_for_checkpoints()  # a just-written step must be visible
    path = Path(path).resolve()
    if path.is_dir() and not (path / "_CHECKPOINT_METADATA").exists():
        steps = sorted(
            (int(p.name) for p in path.iterdir() if p.name.isdigit()),
        )
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = path / str(steps[-1])
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)


def save_params(path: Path, params: dict) -> None:
    """Weights-only checkpoint (the overfit init contract)."""
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)


def load_params(path: Path, target: Optional[dict] = None) -> dict:
    """Load weights-only; with `target`, shapes/dtypes are validated and the
    result is merged non-strictly (missing keys keep target values — the
    reference's `strict=False` semantics)."""
    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        restored = ckptr.restore(path)

    def merge(t, r):
        if isinstance(t, dict) and isinstance(r, dict):
            return {k: merge(t[k], r[k]) if k in r else t[k] for k in t}
        return r if r is not None else t

    merged = merge(target, restored)
    return jax.tree_util.tree_map(lambda t, m: m, target, merged)
