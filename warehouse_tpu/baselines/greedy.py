"""Jitted batched greedy nearest-request policy (docs/SEMANTICS.md §12).

The reference's greedy baseline solver re-expressed as vectorized array
ops so baseline rollouts run fully on-device (BASELINE.json:5 "reimplement
the greedy nearest-request baseline solver as a jitted batched policy").
Bit-exact twin of ``warehouse_tpu/oracle/greedy.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import EnvConfig
from ..env.state import EnvState

STAY, UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3, 4


def greedy_actions(cfg: EnvConfig, state: EnvState) -> jnp.ndarray:
    """int32[A] actions from privileged state; vmap over batch for free."""
    # One-hot read of each agent's request cells (gathers are slow on
    # TPU — see engine.py note).
    safe = jnp.clip(state.agent_req, 0, cfg.queue_capacity - 1)
    has = state.agent_req >= 0
    slot_ids = jnp.arange(cfg.queue_capacity, dtype=jnp.int32)
    oh = (safe[:, None] == slot_ids[None, :]) & has[:, None]
    my_pickup = (oh[:, :, None] * state.req_pickup[None]).sum(1)
    my_drop = (oh[:, :, None] * state.req_drop[None]).sum(1)
    target = jnp.where(state.carrying[:, None], my_drop, my_pickup)
    d = target - state.agent_pos
    vert = jnp.where(d[:, 0] < 0, UP, DOWN)
    horiz = jnp.where(d[:, 1] < 0, LEFT, RIGHT)
    act = jnp.where(
        d[:, 0] != 0, vert, jnp.where(d[:, 1] != 0, horiz, STAY)
    )
    return jnp.where(has, act, STAY).astype(jnp.int32)
