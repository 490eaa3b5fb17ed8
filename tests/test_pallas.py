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


def test_env_tick_variants_identical():
    """The plane tick (act kernels) and the row tick (greedy kernel)
    are two implementations of the SAME §4-§7 semantics — round 5
    ships both because each measured faster on its own path
    (docs/RESULTS.md r5). This pins them together directly: random
    batched states + actions through both, outputs bit-equal."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from warehouse_tpu.config import medium_config
    from warehouse_tpu.pallas.rollout import env_tick, env_tick_rows

    cfg = medium_config()
    A, R = cfg.num_agents, cfg.queue_capacity
    B = 64
    rng = np.random.default_rng(0)

    def plane(lo, hi, n):
        return jnp.asarray(
            rng.integers(lo, hi, size=(n, B)).astype(np.int32))

    for trial in range(3):
        p_r = plane(0, cfg.height, A)
        p_c = plane(0, cfg.width, A)
        aq = plane(-1, R, A)
        cy = plane(0, 2, A)
        q_pr = plane(0, cfg.height, R)
        q_pc = plane(0, cfg.width, R)
        q_dr = plane(0, cfg.height, R)
        q_dc = plane(0, cfg.width, R)
        q_st = plane(0, 3, R)
        q_ag = plane(-1, A, R)
        act = [plane(0, 5, 1) for _ in range(A)]
        u = jnp.asarray(rng.random((1, B)).astype(np.float32))
        spick = plane(0, cfg.num_cells, 1)
        sdrop = plane(0, cfg.num_cells, 1)

        out_p = env_tick(cfg, p_r, p_c, aq, cy, q_pr, q_pc, q_dr,
                         q_dc, q_st, q_ag, act, u, spick, sdrop)
        rows = lambda pl_: tuple(pl_[i:i + 1, :]  # noqa: E731
                                 for i in range(pl_.shape[0]))
        out_r = env_tick_rows(
            cfg, rows(p_r), rows(p_c), rows(aq), rows(cy),
            rows(q_pr), rows(q_pc), rows(q_dr), rows(q_dc),
            rows(q_st), rows(q_ag), act, u, spick, sdrop)

        # Planes vs row tuples: concatenate rows back for comparison;
        # picked/delivered/collided are int32 planes vs bool rows.
        for k in range(10):
            a = np.asarray(out_p[k])
            b = np.concatenate([np.asarray(r) for r in out_r[k]], 0)
            np.testing.assert_array_equal(a, b, err_msg=f"field {k}")
        for k in (10, 11, 12):
            a = np.asarray(out_p[k])
            b = np.concatenate(
                [np.asarray(r).astype(np.int32) for r in out_r[k]], 0)
            np.testing.assert_array_equal(a, b, err_msg=f"event {k}")
