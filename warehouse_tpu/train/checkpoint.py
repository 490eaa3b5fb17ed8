"""Checkpoint/resume via orbax (SURVEY.md §5.4).

Capability parity with ``tune``/``Algorithm.save()``: the full training
pytree {params, opt_state, env_state, rng key, step} is saved
sharding-aware and restored bit-identically (tested in
tests/test_checkpoint.py). Recovery model (SURVEY.md §5.3): frequent
checkpoints + restart-from-latest; elastic resize is out of scope.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save(directory: str, step: int, tree: Any) -> str:
    """Save pytree under directory/step_{step}; returns the path."""
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    ckptr = _checkpointer()
    ckptr.save(path, tree)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    # A crash mid-save leaves `step_XXXX.orbax-checkpoint-tmp` dirs; only
    # finalized checkpoints (exact `step_XXXXXXXX` names) count.
    import re

    steps = [
        int(m.group(1))
        for name in os.listdir(directory)
        if (m := re.fullmatch(r"step_(\d+)", name))
    ]
    return max(steps) if steps else None


def restore(directory: str, step: int, target: Any) -> Any:
    """Restore into the structure/shardings of ``target`` (abstract ok)."""
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    ckptr = _checkpointer()
    return ckptr.restore(path, target)


def restore_latest(directory: str, target: Any) -> tuple[int, Any] | None:
    step = latest_step(directory)
    if step is None:
        return None
    return step, restore(directory, step, target)


def restore_params(directory: str, step: int | None = None) -> Any:
    """Restore only the ``params`` subtree of a training checkpoint.

    Device-portable (the abstract restore target is built from checkpoint
    METADATA with the current local device's sharding, so a TPU-saved
    checkpoint restores on CPU and vice versa) and structure-free: no
    model object is needed — serving (``warehouse_tpu.serve``) and
    evaluation load params knowing only the directory.
    """
    if step is None:
        step = latest_step(directory)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    ckptr = _checkpointer()
    meta = ckptr.metadata(path).item_metadata
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def to_abstract(m):
        return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding)

    abstract = jax.tree.map(to_abstract, meta.tree)
    restored = ckptr.restore(path, abstract)
    return restored["params"]
