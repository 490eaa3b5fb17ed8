"""Uniform random policy (BASELINE.json config 3 stress driver)."""

from __future__ import annotations

import jax

from ..config import EnvConfig


def random_actions(cfg: EnvConfig, key: jax.Array, batch_shape=()) -> jax.Array:
    return jax.random.randint(
        key, (*batch_shape, cfg.num_agents), 0, cfg.num_actions
    )
