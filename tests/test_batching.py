"""Batched-invariance tests (SURVEY.md §4.3): vmapped env at B slice-for-
slice equals B independent single-env runs; jit ≡ eager."""

import numpy as np
import pytest

from warehouse_tpu import small_config


def test_batch_matches_single():
    import jax

    from warehouse_tpu.env import reset, step
    from warehouse_tpu.env.batch import reset_batch, step_batch
    from warehouse_tpu.baselines.greedy import greedy_actions

    cfg = small_config(max_steps=30, auto_reset=True)
    B, T = 16, 40
    import jax.numpy as jnp

    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(B)])
    bstate, bobs = reset_batch(cfg, keys)

    # Independent single-env replicas.
    singles = [reset(cfg, jax.random.PRNGKey(i)) for i in range(B)]

    for t in range(T):
        acts = jax.vmap(lambda s: greedy_actions(cfg, s))(bstate)
        bstate, bts = step_batch(cfg, bstate, acts)
        for i in range(B):
            sstate, _ = singles[i]
            sa = greedy_actions(cfg, sstate)
            np.testing.assert_array_equal(
                np.asarray(acts)[i], np.asarray(sa), err_msg=f"b={i} t={t}"
            )
            sstate, sts = step(cfg, sstate, sa)
            singles[i] = (sstate, sts)
            np.testing.assert_array_equal(
                np.asarray(bts.obs)[i], np.asarray(sts.obs),
                err_msg=f"obs b={i} t={t}",
            )
            np.testing.assert_array_equal(
                np.asarray(bstate.agent_pos)[i], np.asarray(sstate.agent_pos),
                err_msg=f"pos b={i} t={t}",
            )
            np.testing.assert_array_equal(
                np.asarray(bts.reward)[i], np.asarray(sts.reward),
                err_msg=f"rew b={i} t={t}",
            )


def test_jit_vs_eager():
    import jax

    from warehouse_tpu.env import engine

    cfg = small_config(max_steps=20)
    key = jax.random.PRNGKey(0)
    s_j, o_j = engine.reset(cfg, key)
    with jax.disable_jit():
        s_e, o_e = engine.reset(cfg, key)
    np.testing.assert_array_equal(np.asarray(o_j), np.asarray(o_e))

    acts = np.array([1, 4], dtype=np.int32)
    s_j2, ts_j = engine.step(cfg, s_j, acts)
    with jax.disable_jit():
        s_e2, ts_e = engine.step(cfg, s_e, acts)
    np.testing.assert_array_equal(np.asarray(ts_j.obs), np.asarray(ts_e.obs))
    np.testing.assert_array_equal(
        np.asarray(s_j2.agent_pos), np.asarray(s_e2.agent_pos)
    )


def test_scan_rollout_matches_stepwise():
    """lax.scan over T (the on-device hot loop) ≡ Python step loop."""
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.env import engine
    from warehouse_tpu.baselines.greedy import greedy_actions

    cfg = small_config(max_steps=16, auto_reset=True)
    key = jax.random.PRNGKey(9)
    state0, _ = engine.reset(cfg, key)

    def body(state, _):
        a = greedy_actions(cfg, state)
        state, ts = engine.step(cfg, state, a)
        return state, (ts.reward, ts.obs)

    T = 40
    final, (rews, obss) = jax.lax.scan(body, state0, None, length=T)

    state = state0
    for t in range(T):
        a = greedy_actions(cfg, state)
        state, ts = engine.step(cfg, state, a)
        np.testing.assert_array_equal(
            np.asarray(rews)[t], np.asarray(ts.reward), err_msg=f"t={t}"
        )
    np.testing.assert_array_equal(
        np.asarray(final.agent_pos), np.asarray(state.agent_pos)
    )
