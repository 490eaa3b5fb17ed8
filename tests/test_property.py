"""Hypothesis property tests: oracle↔engine parity and invariants over
RANDOMIZED configs, seeds, and action sequences — coverage beyond the
fixed-config suites.

The ``test_invariant_*`` family checks each docs/SEMANTICS.md §2
invariant INDIVIDUALLY (one test id per invariant) on the JAX engine at
high contention — the 15x15/8-agent stress shape (BASELINE config 3)
plus the walled shelves layout — under hypothesis-driven action streams.
"""

import pytest
import functools

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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Per-invariant property tests (docs/SEMANTICS.md §2) at high contention.
# ---------------------------------------------------------------------------

EMPTY, PENDING, IN_TRANSIT = 0, 1, 2
_T = 25  # steps per example


@functools.lru_cache(maxsize=256)
def _stress_states(seed: int, action_seed: int, shelves: bool):
    """Engine rollout at BASELINE config-3 contention; returns a list of
    per-step state snapshots as numpy trees (cached: all invariant tests
    share rollouts)."""
    import jax

    from warehouse_tpu import large_config
    from warehouse_tpu.config import shelves_config
    from warehouse_tpu.env import engine

    cfg = (shelves_config(max_steps=1 << 30, spawn_prob=0.6) if shelves
           else large_config(max_steps=1 << 30, spawn_prob=0.6))
    rng = np.random.default_rng(action_seed)
    state, _ = engine.reset(cfg, jax.random.PRNGKey(seed))
    snaps = [jax.tree.map(np.asarray, state)]
    for _ in range(_T):
        actions = rng.integers(0, 5, cfg.num_agents).astype(np.int32)
        state, _ = engine.step(cfg, state, actions)
        snaps.append(jax.tree.map(np.asarray, state))
    return cfg, snaps


_stress_given = given(
    seed=st.integers(0, 2**31 - 1),
    action_seed=st.integers(0, 2**31 - 1),
    shelves=st.booleans(),
)


@settings(max_examples=12, deadline=None)
@_stress_given
def test_invariant_no_two_agents_share_a_cell(seed, action_seed, shelves):
    cfg, snaps = _stress_states(seed, action_seed, shelves)
    for t, s in enumerate(snaps):
        cells = s.agent_pos[:, 0] * cfg.width + s.agent_pos[:, 1]
        assert len(set(cells.tolist())) == cfg.num_agents, f"overlap t={t}"


@settings(max_examples=12, deadline=None)
@_stress_given
def test_invariant_agents_in_bounds_and_off_walls(seed, action_seed,
                                                  shelves):
    cfg, snaps = _stress_states(seed, action_seed, shelves)
    walls = set(cfg.walls)
    for t, s in enumerate(snaps):
        assert (s.agent_pos >= 0).all(), f"t={t}"
        assert (s.agent_pos[:, 0] < cfg.height).all(), f"t={t}"
        assert (s.agent_pos[:, 1] < cfg.width).all(), f"t={t}"
        cells = s.agent_pos[:, 0] * cfg.width + s.agent_pos[:, 1]
        assert not (set(cells.tolist()) & walls), f"agent on wall t={t}"


@settings(max_examples=12, deadline=None)
@_stress_given
def test_invariant_carrying_iff_assigned_in_transit(seed, action_seed,
                                                    shelves):
    cfg, snaps = _stress_states(seed, action_seed, shelves)
    for t, s in enumerate(snaps):
        for i in range(cfg.num_agents):
            r = s.agent_req[i]
            if bool(s.carrying[i]):
                assert r >= 0, f"carrying unassigned t={t} i={i}"
                assert s.req_status[r] == IN_TRANSIT, f"t={t} i={i}"
            elif r >= 0:
                assert s.req_status[r] == PENDING, f"t={t} i={i}"


@settings(max_examples=12, deadline=None)
@_stress_given
def test_invariant_agent_request_pairing_bijective(seed, action_seed,
                                                   shelves):
    cfg, snaps = _stress_states(seed, action_seed, shelves)
    for t, s in enumerate(snaps):
        for i in range(cfg.num_agents):
            r = s.agent_req[i]
            if r >= 0:
                assert s.req_agent[r] == i, f"t={t} i={i} r={r}"
        for r in range(cfg.queue_capacity):
            a = s.req_agent[r]
            if a >= 0:
                assert s.agent_req[a] == r, f"t={t} r={r} a={a}"


@settings(max_examples=12, deadline=None)
@_stress_given
def test_invariant_in_transit_implies_assigned(seed, action_seed, shelves):
    cfg, snaps = _stress_states(seed, action_seed, shelves)
    for t, s in enumerate(snaps):
        for r in range(cfg.queue_capacity):
            if s.req_status[r] == IN_TRANSIT:
                assert s.req_agent[r] >= 0, f"t={t} r={r}"


@settings(max_examples=12, deadline=None)
@_stress_given
def test_invariant_empty_slots_unassigned(seed, action_seed, shelves):
    cfg, snaps = _stress_states(seed, action_seed, shelves)
    for t, s in enumerate(snaps):
        for r in range(cfg.queue_capacity):
            if s.req_status[r] == EMPTY:
                assert s.req_agent[r] == -1, f"t={t} r={r}"
                assert r not in s.agent_req.tolist(), f"t={t} r={r}"
