"""Oracle property tests (SURVEY.md §4.1): invariants of docs/SEMANTICS.md §2."""

import numpy as np
import pytest

from warehouse_tpu import small_config, medium_config, large_config
from warehouse_tpu.oracle import NumpyDrawSource, OracleEnv, greedy_actions
from warehouse_tpu.oracle.env import EMPTY, IN_TRANSIT, PENDING


def check_invariants(cfg, s):
    # No two agents share a cell.
    cells = s.agent_pos[:, 0] * cfg.width + s.agent_pos[:, 1]
    assert len(set(cells.tolist())) == cfg.num_agents, "agent overlap"
    # Bounds.
    assert (s.agent_pos >= 0).all()
    assert (s.agent_pos[:, 0] < cfg.height).all()
    assert (s.agent_pos[:, 1] < cfg.width).all()
    # Bijective agent↔request pairing.
    for i in range(cfg.num_agents):
        r = s.agent_req[i]
        if r >= 0:
            assert s.req_agent[r] == i
            assert s.req_status[r] in (PENDING, IN_TRANSIT)
            # carrying ⟺ IN_TRANSIT
            assert bool(s.carrying[i]) == (s.req_status[r] == IN_TRANSIT)
        else:
            assert not s.carrying[i]
    for r in range(cfg.queue_capacity):
        a = s.req_agent[r]
        if a >= 0:
            assert s.agent_req[a] == r
        if s.req_status[r] == EMPTY:
            assert a == -1
        if s.req_status[r] == IN_TRANSIT:
            assert a >= 0


@pytest.mark.parametrize("cfgf", [small_config, medium_config, large_config])
@pytest.mark.parametrize("policy", ["greedy", "random"])
def test_invariants_rollout(cfgf, policy):
    cfg = cfgf(max_steps=60)
    rng = np.random.default_rng(7)
    env = OracleEnv(cfg, NumpyDrawSource(3))
    env.reset()
    check_invariants(cfg, env.state)
    deliveries = 0
    for _ in range(60):
        if policy == "greedy":
            a = greedy_actions(cfg, env.state)
        else:
            a = rng.integers(0, 5, cfg.num_agents)
        _, rew, term, trunc, info = env.step(a)
        check_invariants(cfg, env.state)
        deliveries += int(info["delivered"].sum())
        assert rew.dtype == np.float32
    assert trunc  # max_steps=60 reached
    if policy == "greedy":
        assert deliveries > 0, "greedy should deliver something in 60 steps"


def test_request_conservation():
    """Spawned = open + in-transit + done, tracked across a rollout."""
    cfg = medium_config(max_steps=200, spawn_prob=0.9)
    env = OracleEnv(cfg, NumpyDrawSource(11))
    env.reset()
    spawned = cfg.init_requests
    done = 0
    prev_nonempty = int((env.state.req_status != EMPTY).sum())
    assert prev_nonempty == cfg.init_requests
    for _ in range(100):
        a = greedy_actions(cfg, env.state)
        _, _, _, _, info = env.step(a)
        d = int(info["delivered"].sum())
        done += d
        nonempty = int((env.state.req_status != EMPTY).sum())
        spawned_now = nonempty - (prev_nonempty - d)
        assert spawned_now in (0, 1), "at most one spawn per tick"
        spawned += spawned_now
        prev_nonempty = nonempty
    assert spawned == done + prev_nonempty


def test_truncation_at_max_steps():
    cfg = small_config(max_steps=5)
    env = OracleEnv(cfg, NumpyDrawSource(0))
    env.reset()
    for t in range(5):
        _, _, term, trunc, _ = env.step(np.zeros(2, dtype=np.int64))
        assert not term
        assert trunc == (t == 4)


def test_autoreset():
    cfg = small_config(max_steps=3, auto_reset=True)
    env = OracleEnv(cfg, NumpyDrawSource(5))
    env.reset()
    for _ in range(3):
        obs, _, _, trunc, _ = env.step(np.zeros(2, dtype=np.int64))
    assert trunc
    assert env.state.t == 0  # fresh episode
    check_invariants(cfg, env.state)
