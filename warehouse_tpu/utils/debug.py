"""Debug mode & SPMD sanity checks (SURVEY.md §5.2).

The reference stack's race-equivalents here are (a) cross-host divergence
of replicated state and (b) donated-buffer/NaN bugs. Debug mode turns on
NaN trapping; ``check_state_invariants`` is a jittable validator of the
docs/SEMANTICS.md §2 invariants for use in stress tests and fuzzing;
``assert_replicated_in_sync`` catches shard divergence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig
from ..env.state import EMPTY, IN_TRANSIT, PENDING, EnvState


def enable_debug_mode() -> None:
    """NaN trapping + disabled donation-reuse hazards for debugging runs."""
    jax.config.update("jax_debug_nans", True)


def check_state_invariants(cfg: EnvConfig, state: EnvState) -> jax.Array:
    """Returns bool scalar: True iff every §2 invariant holds.

    Pure/jittable; vmap over a batch to validate thousands of states.
    """
    A, R = cfg.num_agents, cfg.queue_capacity
    pos_ok = (
        (state.agent_pos >= 0).all()
        & (state.agent_pos[:, 0] < cfg.height).all()
        & (state.agent_pos[:, 1] < cfg.width).all()
    )
    cells = state.agent_pos[:, 0] * cfg.width + state.agent_pos[:, 1]
    distinct = (cells[:, None] != cells[None, :]) | jnp.eye(A, dtype=bool)
    no_overlap = distinct.all()

    has = state.agent_req >= 0
    safe = jnp.clip(state.agent_req, 0, R - 1)
    pair_ok = jnp.where(
        has, state.req_agent[safe] == jnp.arange(A), ~state.carrying
    ).all()
    carry_ok = jnp.where(
        has,
        state.carrying == (state.req_status[safe] == IN_TRANSIT),
        ~state.carrying,
    ).all()

    r_has = state.req_agent >= 0
    r_safe = jnp.clip(state.req_agent, 0, A - 1)
    rpair_ok = jnp.where(
        r_has, state.agent_req[r_safe] == jnp.arange(R), True
    ).all()
    empty_ok = jnp.where(state.req_status == EMPTY, ~r_has, True).all()
    transit_ok = jnp.where(
        state.req_status == IN_TRANSIT, r_has, True
    ).all()

    return (
        pos_ok & no_overlap & pair_ok & carry_ok
        & rpair_ok & empty_ok & transit_ok
    )


def assert_replicated_in_sync(tree) -> None:
    """Host-side check that every leaf's shards are bit-identical —
    the cross-host divergence detector (SURVEY.md §5.2a)."""
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            if not np.array_equal(shards[0], s):
                raise AssertionError(
                    "replicated leaf diverged across shards"
                )


def visualize_sharding(x) -> None:
    jax.debug.visualize_array_sharding(x)
