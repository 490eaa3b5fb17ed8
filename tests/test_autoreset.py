"""step_autoreset_batch ≡ per-env in-step auto-reset, bit-exact.

The cond-gated batched auto-reset (env/batch.py) must reproduce the
engine's per-env auto-reset (env/engine.py §4.9) draw-for-draw: same
reset keys (StepDraws.reset_key is a pure function of the pre-step
state.key), same merge, same post-reset obs — including on ticks where
only SOME envs truncate (staggered t), which forces the cond's reset
branch to merge a partially-done batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from warehouse_tpu.config import small_config
from warehouse_tpu.env import engine
from warehouse_tpu.env.batch import reset_batch, step_autoreset_batch

CFG = small_config(max_steps=6, auto_reset=True)


def _keys(b, seed=0):
    return jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
    )(jnp.arange(b))


def _tree_eq(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_matches_in_step_auto_reset_across_boundary():
    b = 8
    state_a, _ = reset_batch(CFG, _keys(b))
    state_b = state_a
    akey = jax.random.PRNGKey(42)
    for t in range(2 * CFG.max_steps + 3):  # crosses two reset boundaries
        akey, k = jax.random.split(akey)
        actions = jax.random.randint(k, (b, CFG.num_agents), 0, 5)
        state_a, ts_a = jax.vmap(
            lambda s, a: engine.step(CFG, s, a)
        )(state_a, actions)
        state_b, ts_b = step_autoreset_batch(CFG, state_b, actions)
        _tree_eq(state_a, state_b)
        _tree_eq(ts_a, ts_b)


def test_staggered_truncation_partial_batch_reset():
    """Envs with different t truncate on different ticks: the reset
    branch must merge only the done rows, bit-exactly."""
    b = 4
    state_a, _ = reset_batch(CFG, _keys(b, seed=7))
    # Stagger clocks: env i starts at t = i (advances i ticks of age).
    state_a = state_a.replace(
        t=jnp.arange(b, dtype=jnp.int32) % CFG.max_steps
    )
    state_b = state_a
    akey = jax.random.PRNGKey(3)
    saw_partial = False
    for t in range(CFG.max_steps + 2):
        akey, k = jax.random.split(akey)
        actions = jax.random.randint(k, (b, CFG.num_agents), 0, 5)
        state_a, ts_a = jax.vmap(
            lambda s, a: engine.step(CFG, s, a)
        )(state_a, actions)
        state_b, ts_b = step_autoreset_batch(CFG, state_b, actions)
        done = np.asarray(ts_a.truncated)
        if done.any() and not done.all():
            saw_partial = True
        _tree_eq(state_a, state_b)
        _tree_eq(ts_a, ts_b)
    assert saw_partial, "test never exercised a partial-batch reset"


def test_no_reset_tick_is_identity_with_plain_step():
    """On ticks where nothing truncates, the wrapper equals the plain
    (auto_reset=False) batched step — the cond's cheap branch."""
    cfg = CFG.replace(auto_reset=False)
    b = 8
    state, _ = reset_batch(cfg, _keys(b, seed=1))
    actions = jnp.ones((b, cfg.num_agents), jnp.int32)
    s_plain, ts_plain = jax.vmap(
        lambda s, a: engine.step(cfg, s, a)
    )(state, actions)
    s_wrap, ts_wrap = step_autoreset_batch(CFG, state, actions)
    _tree_eq(s_plain, s_wrap)
    _tree_eq(ts_plain, ts_wrap)
