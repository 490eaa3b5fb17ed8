"""Generalized Advantage Estimation as a reverse ``lax.scan``.

On-device, fused into the train step (SURVEY.md §3.4) — no host round
trips between rollout and learning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gae(
    rewards: jax.Array,     # float32[T, ...]
    values: jax.Array,      # float32[T, ...]
    dones: jax.Array,       # bool[T, ...] — episode boundary AFTER step t
    last_value: jax.Array,  # float32[...]
    gamma: float,
    lam: float,
):
    """Returns (advantages[T, ...], targets[T, ...]).

    ``dones[t]`` marks that the transition at t ended an episode; the
    value bootstrap across it is masked (time-limit truncations are
    treated as terminals — the standard batched-RL simplification; the
    episode horizon is part of the task).
    """
    not_done = 1.0 - dones.astype(jnp.float32)

    def body(carry, xs):
        next_adv, next_value = carry
        reward, value, nd = xs
        delta = reward + gamma * next_value * nd - value
        adv = delta + gamma * lam * nd * next_adv
        return (adv, value), adv

    (_, _), advs = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, not_done),
        reverse=True,
    )
    return advs, advs + values
