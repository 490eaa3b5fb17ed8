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
    bootstrap_values: jax.Array | None = None,  # float32[T, ...]
):
    """Returns (advantages[T, ...], targets[T, ...]).

    ``dones[t]`` marks that the transition at t ended an episode. With
    ``bootstrap_values=None`` the value bootstrap across a boundary is
    masked (truncations treated as terminals — the simple batched-RL
    convention). With ``bootstrap_values`` given, boundary deltas use
    ``bootstrap_values[t]`` — V(s_{t+1}) of the TRUE (pre-auto-reset)
    successor state — as the next-state value instead of 0, i.e.
    RLlib-style time-limit bootstrapping (TrainConfig.bootstrap_truncated;
    the engine surfaces the pre-reset obs as ``TimeStep.final_obs``).
    The λ-trace is still cut at the boundary either way: the next row of
    the batch belongs to a fresh, unrelated episode.
    """
    not_done = 1.0 - dones.astype(jnp.float32)
    if bootstrap_values is None:
        bootstrap_values = jnp.zeros_like(values)

    def body(carry, xs):
        next_adv, next_value = carry
        reward, value, nd, bv = xs
        # Next-state value: the scan carry within an episode, the true
        # successor's (bootstrap) value across a boundary.
        nv = nd * next_value + (1.0 - nd) * bv
        delta = reward + gamma * nv - value
        adv = delta + gamma * lam * nd * next_adv
        return (adv, value), adv

    (_, _), advs = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, not_done, bootstrap_values),
        reverse=True,
    )
    return advs, advs + values
