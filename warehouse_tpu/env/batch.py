"""Batched env API: vmap+jit over the pure single-env functions.

The TPU-native replacement for the reference stack's N rollout-worker
processes each stepping its own env copies (SURVEY.md §2.3 DP row): one
jitted program steps the whole batch in lockstep on-device.
"""

from __future__ import annotations

from functools import partial

import jax

from ..config import EnvConfig
from . import engine
from .state import EnvState, TimeStep


@partial(jax.jit, static_argnums=0)
def reset_batch(cfg: EnvConfig, keys: jax.Array) -> tuple[EnvState, jax.Array]:
    """Reset a batch of envs from int32/uint32 keys[B, 2]."""
    return jax.vmap(lambda k: engine.reset(cfg, k))(keys)


@partial(jax.jit, static_argnums=0)
def step_batch(
    cfg: EnvConfig, state: EnvState, actions: jax.Array
) -> tuple[EnvState, TimeStep]:
    """Step a batch: state pytree with leading B axis, actions int32[B, A]."""
    return jax.vmap(lambda s, a: engine.step(cfg, s, a))(state, actions)
