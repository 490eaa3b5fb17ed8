"""Pallas fused-rollout kernel: bit-exact parity vs the XLA engine.

Runs in interpreter mode on the CPU backend (CI); the same kernel is
compiled by Mosaic on real TPU (driven by bench.py and verified on-chip
during development — 326M env-steps/s at B=131072).
"""

import numpy as np
import pytest

from warehouse_tpu import EnvConfig, medium_config, small_config


def run_parity(cfg, B, T, block, seed=0):
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.baselines.greedy import greedy_actions
    from warehouse_tpu.env import engine
    from warehouse_tpu.pallas.rollout import greedy_rollout_pallas

    keys = jax.vmap(
        lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
    )(jnp.arange(B))
    state, _ = jax.jit(jax.vmap(lambda k: engine.reset(cfg, k)))(keys)

    def body(s, _):
        a = jax.vmap(lambda ss: greedy_actions(cfg, ss))(s)
        s, ts = jax.vmap(lambda ss, aa: engine.step(cfg, ss, aa))(s, a)
        return s, (ts.delivered.sum(-1).astype(jnp.int32),
                   ts.reward.sum(-1))

    ref_state, (dels, rews) = jax.lax.scan(body, state, None, length=T)
    ref_dels = np.asarray(dels.sum(0))
    ref_rews = np.asarray(rews.sum(0))

    new_state, deliv, rew = greedy_rollout_pallas(
        cfg, state, T, block, True  # interpret mode on CPU
    )
    for n in ["agent_pos", "agent_req", "carrying", "req_pickup",
              "req_drop", "req_status", "req_agent"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(ref_state, n)),
            np.asarray(getattr(new_state, n)), err_msg=n,
        )
    np.testing.assert_array_equal(
        np.asarray(ref_state.key), np.asarray(new_state.key)
    )
    np.testing.assert_array_equal(ref_dels, np.asarray(deliv))
    np.testing.assert_allclose(ref_rews, np.asarray(rew), atol=1e-4)
    return int(deliv.sum())


def test_parity_medium():
    d = run_parity(medium_config(max_steps=10**9), B=64, T=24, block=64)
    assert d > 0


def test_parity_small_high_contention():
    cfg = EnvConfig(height=4, width=4, num_agents=4, queue_capacity=4,
                    init_requests=4, spawn_prob=0.9, max_steps=10**9)
    run_parity(cfg, B=32, T=32, block=32)


@pytest.mark.slow  # the A=8/R=16 unrolled kernel takes minutes to trace
def test_parity_eight_agents():
    from warehouse_tpu import large_config

    run_parity(large_config(max_steps=10**9), B=16, T=16, block=16)


def test_rejects_auto_reset():
    import jax

    from warehouse_tpu.env import engine
    from warehouse_tpu.pallas.rollout import greedy_rollout_pallas

    cfg = small_config(auto_reset=True)
    state, _ = engine.reset(cfg, jax.random.PRNGKey(0))
    state_b = jax.tree.map(lambda x: x[None], state)
    with pytest.raises(ValueError, match="auto_reset"):
        greedy_rollout_pallas(cfg, state_b, 4, 1, True)


def test_rejects_bad_block():
    import jax

    from warehouse_tpu.env import engine
    from warehouse_tpu.pallas.rollout import greedy_rollout_pallas

    cfg = small_config()
    keys = jax.numpy.stack([jax.random.PRNGKey(i) for i in range(6)])
    state, _ = jax.vmap(lambda k: engine.reset(cfg, k))(keys)
    with pytest.raises(ValueError, match="divide"):
        greedy_rollout_pallas(cfg, state, 4, 4, True)
