"""Oracle ↔ engine bit-exact parity (SURVEY.md §4.2).

The engine (jitted JAX) and the oracle (NumPy loops) implement
docs/SEMANTICS.md independently; fed the same draw stream
(warehouse_tpu.rng via JaxDrawSource) they must agree exactly — states,
observations, rewards, flags — at every step.

The oracle↔REFERENCE parity gate is a separate test, skipped loudly while
/root/reference is an empty mount (SURVEY.md §0, §8).
"""

import os

import numpy as np
import pytest

from warehouse_tpu import small_config, medium_config
from warehouse_tpu.oracle import JaxDrawSource, OracleEnv
from warehouse_tpu.oracle import greedy_actions as np_greedy


def rollout_parity(cfg, seed, steps, policy):
    import jax

    from warehouse_tpu.baselines.greedy import greedy_actions as jx_greedy
    from warehouse_tpu.env import reset, step

    key = jax.random.PRNGKey(seed)
    oenv = OracleEnv(cfg, JaxDrawSource(key))
    oobs = oenv.reset()
    jstate, jobs = reset(cfg, key)
    np.testing.assert_array_equal(oobs, np.asarray(jobs))
    arng = np.random.default_rng(seed)
    for t in range(steps):
        if policy == "greedy":
            oa = np_greedy(cfg, oenv.state)
            ja = jx_greedy(cfg, jstate)
            np.testing.assert_array_equal(oa, np.asarray(ja), err_msg=f"t={t}")
        else:
            oa = arng.integers(0, 5, cfg.num_agents)
            ja = oa
        oobs, orew, _, otrunc, oinfo = oenv.step(oa)
        jstate, ts = step(cfg, jstate, np.asarray(ja))
        pairs = {
            "agent_pos": (oenv.state.agent_pos, jstate.agent_pos),
            "agent_req": (oenv.state.agent_req, jstate.agent_req),
            "carrying": (oenv.state.carrying, jstate.carrying),
            "req_pickup": (oenv.state.req_pickup, jstate.req_pickup),
            "req_drop": (oenv.state.req_drop, jstate.req_drop),
            "req_status": (oenv.state.req_status, jstate.req_status),
            "req_agent": (oenv.state.req_agent, jstate.req_agent),
            "obs": (oobs, ts.obs),
            "reward": (orew, ts.reward),
            "picked": (oinfo["picked"], ts.picked),
            "delivered": (oinfo["delivered"], ts.delivered),
            "collided": (oinfo["collided"], ts.collided),
        }
        for name, (a, b) in pairs.items():
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"{name} at t={t}"
            )
        assert bool(otrunc) == bool(ts.truncated), f"truncated at t={t}"


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("policy", ["greedy", "random"])
def test_parity_small(seed, policy):
    rollout_parity(small_config(max_steps=50), seed, 50, policy)


@pytest.mark.parametrize("policy", ["greedy", "random"])
def test_parity_medium(policy):
    rollout_parity(medium_config(max_steps=40), 3, 40, policy)


def test_parity_autoreset():
    rollout_parity(small_config(max_steps=10, auto_reset=True), 4, 35, "greedy")


def test_parity_global_obs():
    rollout_parity(small_config(max_steps=25, global_obs=True), 5, 25, "greedy")


def test_parity_global_obs_walls():
    # Shelves layout + global view: exercises the ch4 traversability
    # channel (docs/SEMANTICS.md §10) against the oracle bit-for-bit.
    from warehouse_tpu.config import shelves_config

    rollout_parity(shelves_config(max_steps=20, global_obs=True),
                   11, 20, "random")


def test_parity_radius1():
    rollout_parity(small_config(max_steps=25, obs_radius=1), 6, 25, "random")


def test_parity_single_agent():
    from warehouse_tpu import EnvConfig

    cfg = EnvConfig(height=4, width=4, num_agents=1, queue_capacity=2,
                    init_requests=1, max_steps=30)
    rollout_parity(cfg, 7, 30, "greedy")


@pytest.mark.skipif(
    not os.path.exists("/root/reference")
    or not os.listdir("/root/reference"),
    reason=(
        "REFERENCE PARITY GATE SKIPPED: /root/reference is an empty mount "
        "(verified; see SURVEY.md §0). When the reference becomes readable, "
        "run the SURVEY.md §8 extraction checklist, update "
        "docs/SEMANTICS.md + both implementations, and implement this test "
        "against the real reference env."
    ),
)
def test_parity_vs_reference():
    raise NotImplementedError(
        "implement once /root/reference is mounted (SURVEY.md §8)"
    )
