"""Hypothesis property tests: oracle↔engine parity and invariants over
RANDOMIZED configs, seeds, and action sequences — coverage beyond the
fixed-config suites."""

import numpy as np
from hypothesis import given, settings, strategies as st

from warehouse_tpu import EnvConfig
from warehouse_tpu.oracle import JaxDrawSource, NumpyDrawSource, OracleEnv

from tests.test_oracle import check_invariants


@st.composite
def env_configs(draw):
    h = draw(st.integers(2, 7))
    w = draw(st.integers(2, 7))
    a = draw(st.integers(1, min(4, h * w - 1)))
    q = draw(st.integers(1, 6))
    return EnvConfig(
        height=h, width=w, num_agents=a, queue_capacity=q,
        init_requests=draw(st.integers(0, q)),
        spawn_prob=draw(st.floats(0.0, 1.0)),
        max_steps=1 << 30,
        obs_radius=draw(st.integers(0, 2)),
    )


@settings(max_examples=25, deadline=None)
@given(cfg=env_configs(), seed=st.integers(0, 2**31 - 1),
       data=st.data())
def test_oracle_invariants_random_configs(cfg, seed, data):
    env = OracleEnv(cfg, NumpyDrawSource(seed))
    env.reset()
    check_invariants(cfg, env.state)
    rng = np.random.default_rng(seed)
    for _ in range(15):
        actions = rng.integers(0, 5, cfg.num_agents)
        env.step(actions)
        check_invariants(cfg, env.state)


@settings(max_examples=10, deadline=None)
@given(cfg=env_configs(), seed=st.integers(0, 2**31 - 1))
def test_engine_matches_oracle_random_configs(cfg, seed):
    import jax

    from warehouse_tpu.env import engine

    key = jax.random.PRNGKey(seed)
    oenv = OracleEnv(cfg, JaxDrawSource(key))
    oobs = oenv.reset()
    jstate, jobs = engine.reset(cfg, key)
    np.testing.assert_array_equal(oobs, np.asarray(jobs))
    rng = np.random.default_rng(seed)
    for t in range(10):
        actions = rng.integers(0, 5, cfg.num_agents)
        oobs, orew, _, _, _ = oenv.step(actions)
        jstate, ts = engine.step(cfg, jstate, actions.astype(np.int32))
        np.testing.assert_array_equal(
            oenv.state.agent_pos, np.asarray(jstate.agent_pos),
            err_msg=f"pos t={t} cfg={cfg}",
        )
        np.testing.assert_array_equal(
            oobs, np.asarray(ts.obs), err_msg=f"obs t={t} cfg={cfg}"
        )
        np.testing.assert_array_equal(
            orew, np.asarray(ts.reward), err_msg=f"rew t={t} cfg={cfg}"
        )
