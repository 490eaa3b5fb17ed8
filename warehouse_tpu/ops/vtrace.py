"""V-trace off-policy return/advantage estimator (Espeholt et al. 2018,
"IMPALA: Scalable Distributed Deep-RL"), as a reverse ``lax.scan``.

Capability-parity note: RLlib — the stack under the reference
(SURVEY.md §1 L1) — ships IMPALA alongside PPO; this op backs our
second algorithm family (train/impala.py). On-device, fused into the
train step like ops/gae.py: no host round trips between rollout and
learning.

All inputs are time-major ``[T, ...]``; trailing axes (env batch, agent)
broadcast through. ``dones[t]`` marks that the transition at t ended an
episode (auto-reset: the next row already belongs to a fresh episode),
so every bootstrap across it is cut — the same convention as
ops/gae.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def vtrace(
    behavior_log_prob: jax.Array,  # float32[T, ...] — μ(a_t|s_t) at acting
    target_log_prob: jax.Array,    # float32[T, ...] — π(a_t|s_t) now
    rewards: jax.Array,            # float32[T, ...]
    values: jax.Array,             # float32[T, ...] — V(s_t) under π's critic
    dones: jax.Array,              # bool[T, ...]
    last_value: jax.Array,         # float32[...] — V(s_{T}) bootstrap
    gamma: float,
    rho_clip: float = 1.0,         # ρ̄: IS clip for the TD targets & pg
    c_clip: float = 1.0,           # c̄: IS clip for the trace cutting
    bootstrap_values: jax.Array | None = None,  # float32[T, ...]
):
    """Returns ``(vs, pg_advantages)``, both ``float32[T, ...]``.

    vs_t = V(s_t) + Σ_{k≥t} γ^{k-t} (Π_{i<k} c_i) δ_k  with
    δ_k = ρ_k (r_k + γ V(s_{k+1}) − V(s_k)),  ρ_k = min(ρ̄, π/μ),
    c_k = min(c̄, π/μ); pg_advantage_t = ρ_t (r_t + γ vs_{t+1} − V(s_t)).

    When behavior == target (on-policy) and ρ̄ = c̄ = 1 this reduces to
    the λ=1 GAE target (Monte-Carlo with bootstrap), which the unit test
    checks against ops/gae.py.

    ``bootstrap_values`` (same contract as ops/gae.py): per-step V of the
    TRUE successor state, used as the next-state value at ``done``
    boundaries instead of 0 — RLlib-style time-limit bootstrapping. The
    trace product (c_i) is still cut at boundaries.
    """
    not_done = 1.0 - dones.astype(jnp.float32)
    if bootstrap_values is None:
        bootstrap_values = jnp.zeros_like(values)
    rho = jnp.exp(target_log_prob - behavior_log_prob)
    clipped_rho = jnp.minimum(rho, rho_clip)
    cs = jnp.minimum(rho, c_clip)

    values_next = jnp.concatenate(
        [values[1:], last_value[None]], axis=0
    )
    values_next = not_done * values_next + (1.0 - not_done) * bootstrap_values
    deltas = clipped_rho * (
        rewards + gamma * values_next - values
    )

    def body(acc, xs):
        delta, c, nd = xs
        acc = delta + gamma * nd * c * acc
        return acc, acc

    _, vs_minus_v = jax.lax.scan(
        body,
        jnp.zeros_like(last_value),
        (deltas, cs, not_done),
        reverse=True,
    )
    vs = values + vs_minus_v

    vs_next = jnp.concatenate([vs[1:], last_value[None]], axis=0)
    # At a boundary vs_{t+1} of the next row is a fresh episode; the true
    # successor has no future corrections, so its vs IS its value.
    vs_next = not_done * vs_next + (1.0 - not_done) * bootstrap_values
    pg_advantages = clipped_rho * (
        rewards + gamma * vs_next - values
    )
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(pg_advantages)
