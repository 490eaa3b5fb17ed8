"""High-contention stress tests (SURVEY.md §7 PR3, BASELINE config 3):
batched invariant fuzzing of collision/assignment under random policy."""

import numpy as np
import pytest

from warehouse_tpu import EnvConfig, large_config


def run_stress(cfg, B, T, seed=0):
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.baselines.random import random_actions
    from warehouse_tpu.env import engine
    from warehouse_tpu.utils.debug import check_state_invariants

    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
    )(jnp.arange(B))
    state, _ = jax.jit(jax.vmap(lambda k: engine.reset(cfg, k)))(keys)

    def body(carry, _):
        state, key = carry
        key, ak = jax.random.split(key)
        a = random_actions(cfg, ak, (B,)).astype(jnp.int32)
        state, ts = jax.vmap(
            lambda s, aa: engine.step(cfg, s, aa)
        )(state, a)
        ok = jax.vmap(lambda s: check_state_invariants(cfg, s))(state)
        return (state, key), ok.all()

    @jax.jit
    def run(state):
        (state, _), oks = jax.lax.scan(
            body, (state, jax.random.PRNGKey(seed + 1)), None, length=T
        )
        return state, oks.all()

    state, all_ok = run(state)
    return bool(all_ok)


def test_invariants_high_contention_small_grid():
    """Many agents on a tiny grid = maximal collision pressure."""
    cfg = EnvConfig(height=3, width=3, num_agents=8, queue_capacity=8,
                    init_requests=4, max_steps=32, spawn_prob=0.9,
                    auto_reset=True)
    assert run_stress(cfg, B=64, T=64)


def test_invariants_batched_medium():
    cfg = EnvConfig(height=9, width=9, num_agents=4, queue_capacity=8,
                    init_requests=4, max_steps=32, spawn_prob=0.5,
                    auto_reset=True)
    assert run_stress(cfg, B=128, T=64)


@pytest.mark.slow
def test_invariants_large_stress():
    """BASELINE config 3 shape (15x15, 8 agents) at reduced batch for CI."""
    cfg = large_config(max_steps=64, auto_reset=True)
    assert run_stress(cfg, B=256, T=128)
