"""Assignment tie-break tests vs docs/SEMANTICS.md §7 (both impls)."""

import numpy as np

from warehouse_tpu import EnvConfig
from warehouse_tpu.oracle.env import OracleEnv, OracleState, PENDING
from warehouse_tpu.oracle.draws import NumpyDrawSource
from warehouse_tpu.ops.assign import assign_requests


def both_assign(cfg, agent_pos, agent_req, carrying, req_pickup, req_status,
                req_agent):
    import jax.numpy as jnp

    A, R = cfg.num_agents, cfg.queue_capacity
    s = OracleState(
        agent_pos=np.array(agent_pos, dtype=np.int64),
        agent_req=np.array(agent_req, dtype=np.int64),
        carrying=np.array(carrying, dtype=bool),
        req_pickup=np.array(req_pickup, dtype=np.int64),
        req_drop=np.zeros((R, 2), dtype=np.int64),
        req_status=np.array(req_status, dtype=np.int64),
        req_agent=np.array(req_agent, dtype=np.int64),
        t=0,
    )
    OracleEnv(cfg, NumpyDrawSource(0))._assign(s)
    ja, jr = assign_requests(
        cfg,
        jnp.array(agent_pos, jnp.int32),
        jnp.array(agent_req, jnp.int32),
        jnp.array(req_pickup, jnp.int32),
        jnp.array(req_status, jnp.int32),
        jnp.array(req_agent, jnp.int32),
    )
    assert np.array_equal(s.agent_req, np.asarray(ja))
    assert np.array_equal(s.req_agent, np.asarray(jr))
    return s.agent_req, s.req_agent


CFG = EnvConfig(height=8, width=8, num_agents=2, queue_capacity=4,
                init_requests=0)


def test_nearest_wins():
    ar, ra = both_assign(
        CFG,
        agent_pos=[[0, 0], [7, 7]],
        agent_req=[-1, -1],
        carrying=[False, False],
        req_pickup=[[1, 1], [6, 6], [0, 0], [0, 0]],
        req_status=[PENDING, PENDING, 0, 0],
        req_agent=[-1, -1, -1, -1],
    )
    assert ar.tolist() == [0, 1]
    assert ra.tolist() == [0, 1, -1, -1]


def test_tie_breaks_lowest_request_index():
    # Two pending requests equidistant from agent 0 → slot 0 wins.
    ar, _ = both_assign(
        CFG,
        agent_pos=[[3, 3], [7, 7]],
        agent_req=[-1, -1],
        carrying=[False, False],
        req_pickup=[[3, 5], [5, 3], [0, 0], [0, 0]],
        req_status=[PENDING, PENDING, 0, 0],
        req_agent=[-1, -1, -1, -1],
    )
    assert ar[0] == 0


def test_agent_order_priority():
    # One request; both agents free; agent 0 claims it even if agent 1 is
    # closer (sequential in agent index — SEMANTICS §7).
    ar, ra = both_assign(
        CFG,
        agent_pos=[[7, 0], [1, 1]],
        agent_req=[-1, -1],
        carrying=[False, False],
        req_pickup=[[1, 2], [0, 0], [0, 0], [0, 0]],
        req_status=[PENDING, 0, 0, 0],
        req_agent=[-1, -1, -1, -1],
    )
    assert ar.tolist() == [0, -1]
    assert ra[0] == 0


def test_sticky_assignment_not_stolen():
    # Request 0 already assigned to agent 1; agent 0 must take request 1.
    ar, _ = both_assign(
        CFG,
        agent_pos=[[0, 0], [5, 5]],
        agent_req=[-1, 0],
        carrying=[False, False],
        req_pickup=[[0, 1], [4, 4], [0, 0], [0, 0]],
        req_status=[PENDING, PENDING, 0, 0],
        req_agent=[1, -1, -1, -1],
    )
    assert ar.tolist() == [1, 0]


def test_no_pending_no_assignment():
    ar, ra = both_assign(
        CFG,
        agent_pos=[[0, 0], [5, 5]],
        agent_req=[-1, -1],
        carrying=[False, False],
        req_pickup=[[0, 1], [4, 4], [0, 0], [0, 0]],
        req_status=[0, 2, 0, 0],
        req_agent=[-1, 0, -1, -1],
    )
    assert ar.tolist() == [-1, -1]
