"""PettingZoo ParallelEnv adapter contract tests."""

import numpy as np
import pytest

from warehouse_tpu import small_config
from warehouse_tpu.env.pettingzoo_adapter import WarehouseParallelEnv


def test_parallel_api():
    cfg = small_config(max_steps=5)
    env = WarehouseParallelEnv(cfg)
    obs, info = env.reset(seed=0)
    assert set(obs) == set(env.possible_agents)
    for t in range(5):
        acts = {a: env.action_space(a).sample() for a in env.agents}
        obs, rew, term, trunc, info = env.step(acts)
        assert "__all__" not in term and "__all__" not in trunc
        assert set(rew) == set(env.possible_agents)
    assert env.agents == []  # truncated at max_steps
    assert all(trunc.values())


def test_pettingzoo_api_compliance():
    """Run the official pettingzoo parallel_api_test if available."""
    pytest.importorskip("pettingzoo")
    try:
        from pettingzoo.test import parallel_api_test
    except Exception:
        pytest.skip("pettingzoo.test unavailable")
    env = WarehouseParallelEnv(small_config(max_steps=12))
    parallel_api_test(env, num_cycles=30)
