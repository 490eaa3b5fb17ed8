"""Hand-crafted collision scenarios vs docs/SEMANTICS.md §4.1 — checked
against BOTH implementations (oracle loop and engine array ops)."""

import numpy as np
import pytest

from warehouse_tpu import EnvConfig
from warehouse_tpu.oracle.env import OracleEnv, OracleState
from warehouse_tpu.oracle.draws import NumpyDrawSource
from warehouse_tpu.ops.move import resolve_moves

STAY, UP, DOWN, LEFT, RIGHT = 0, 1, 2, 3, 4


def both_resolve(cfg, pos, actions):
    """Run oracle _move and engine resolve_moves; assert they agree."""
    import jax.numpy as jnp

    # Oracle path.
    env = OracleEnv(cfg, NumpyDrawSource(0))
    A, R = cfg.num_agents, cfg.queue_capacity
    s = OracleState(
        agent_pos=np.array(pos, dtype=np.int64),
        agent_req=np.full(A, -1, dtype=np.int64),
        carrying=np.zeros(A, dtype=bool),
        req_pickup=np.zeros((R, 2), dtype=np.int64),
        req_drop=np.zeros((R, 2), dtype=np.int64),
        req_status=np.zeros(R, dtype=np.int64),
        req_agent=np.full(R, -1, dtype=np.int64),
        t=0,
    )
    oc = env._move(s, np.array(actions, dtype=np.int64))
    # Engine path.
    jp, jc = resolve_moves(
        cfg,
        jnp.array(pos, dtype=jnp.int32),
        jnp.array(actions, dtype=jnp.int32),
    )
    assert np.array_equal(s.agent_pos, np.asarray(jp)), "pos oracle!=engine"
    assert np.array_equal(oc, np.asarray(jc)), "collided oracle!=engine"
    return s.agent_pos, oc


def cfg_a(n, h=6, w=6):
    return EnvConfig(height=h, width=w, num_agents=n,
                     queue_capacity=2 * n, init_requests=0)


def test_out_of_bounds():
    pos, col = both_resolve(cfg_a(1), [[0, 0]], [UP])
    assert (pos == [[0, 0]]).all() and col[0]


def test_same_target_lowest_index_wins():
    # Both move toward (1, 1): agent 0 from (0,1) down, agent 1 from (1,0) right.
    pos, col = both_resolve(cfg_a(2), [[0, 1], [1, 0]], [DOWN, RIGHT])
    assert (pos[0] == [1, 1]).all()
    assert (pos[1] == [1, 0]).all()
    assert not col[0] and col[1]


def test_swap_both_revert():
    pos, col = both_resolve(cfg_a(2), [[0, 0], [0, 1]], [RIGHT, LEFT])
    assert (pos == [[0, 0], [0, 1]]).all()
    assert col.all()


def test_chain_behind_stationary():
    # A0 stays; A1 behind moves into it; A2 behind A1 — all blocked.
    pos, col = both_resolve(
        cfg_a(3), [[0, 2], [0, 1], [0, 0]], [STAY, RIGHT, RIGHT]
    )
    assert (pos == [[0, 2], [0, 1], [0, 0]]).all()
    assert not col[0] and col[1] and col[2]


def test_train_advances_together():
    # A0 leads; A1 follows into vacated cell — both move.
    pos, col = both_resolve(cfg_a(2), [[0, 1], [0, 0]], [RIGHT, RIGHT])
    assert (pos == [[0, 2], [0, 1]]).all()
    assert not col.any()


def test_train_behind_oob_leader():
    # Leader hits the wall; follower blocked behind it.
    cfg = cfg_a(2, h=1, w=3)
    pos, col = both_resolve(cfg, [[0, 2], [0, 1]], [RIGHT, RIGHT])
    assert (pos == [[0, 2], [0, 1]]).all()
    assert col.all()


def test_rotation_cycle_allowed():
    # 3-cycle: (0,0)→(0,1)→(1,1)→... all moving, no blocker → rotates.
    pos, col = both_resolve(
        cfg_a(3), [[0, 0], [0, 1], [1, 1]], [RIGHT, DOWN, LEFT]
    )
    assert (pos == [[0, 1], [1, 1], [1, 0]]).all()
    assert not col.any()


def test_loser_blocks_winner_chain():
    # A1 loses same-target to A0 and stays put; A2 was moving into A1's
    # cell — blocked by the reverted loser (rule 4 fixed point).
    pos, col = both_resolve(
        cfg_a(3),
        [[0, 1], [1, 0], [2, 0]],
        [DOWN, RIGHT, UP],
    )
    assert (pos == [[1, 1], [1, 0], [2, 0]]).all()
    assert not col[0] and col[1] and col[2]


@pytest.mark.parametrize("n", [2, 4, 8])
def test_random_fuzz_no_overlap(n):
    """Fuzz: resolved positions never overlap; both impls always agree."""
    rng = np.random.default_rng(n)
    cfg = cfg_a(n, h=4, w=4)
    for _ in range(200):
        cells = rng.permutation(16)[:n]
        pos = np.stack([cells // 4, cells % 4], axis=1)
        actions = rng.integers(0, 5, n)
        newpos, _ = both_resolve(cfg, pos, actions)
        ids = newpos[:, 0] * 4 + newpos[:, 1]
        assert len(set(ids.tolist())) == n
