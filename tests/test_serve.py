"""Serving API tests: self-describing checkpoints, compute_actions,
dict-API inference (RLlib Policy.from_checkpoint / compute_single_action
parity — SURVEY.md L4/C13 [API] tier)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    from warehouse_tpu.train.__main__ import main as train_main

    ckpt = str(tmp_path_factory.mktemp("serve") / "ck")
    train_main([
        "--env", "small", "--num-envs", "16", "--unroll-length", "4",
        "--num-updates", "2", "--log-every", "2", "--checkpoint-every", "2",
        "--hidden-dim", "16", "--single-device", "--checkpoint-dir", ckpt,
        "--metrics-path", ckpt + ".jsonl",
    ])
    return ckpt


def test_meta_written(trained_ckpt):
    meta_path = os.path.join(trained_ckpt, "policy_meta.json")
    assert os.path.exists(meta_path)
    meta = json.load(open(meta_path))
    assert meta["arch"] == "mlp"
    assert meta["hidden_dim"] == 16
    assert meta["env_config"]["height"] == 5


def test_from_checkpoint_compute_actions(trained_ckpt):
    from warehouse_tpu.serve import Policy

    pol = Policy.from_checkpoint(trained_ckpt)
    A, D = pol.env_cfg.num_agents, pol.env_cfg.obs_dim

    obs = np.zeros((3, A, D), np.float32)
    acts, carry = pol.compute_actions(obs)
    assert acts.shape == (3, A)
    assert carry is None
    assert ((np.asarray(acts) >= 0) & (np.asarray(acts) < 5)).all()

    # Greedy serving is deterministic; explore sampling is seeded.
    acts2, _ = pol.compute_actions(obs)
    np.testing.assert_array_equal(np.asarray(acts), np.asarray(acts2))
    s1, _ = pol.compute_actions(obs, explore=True, seed=7)
    s2, _ = pol.compute_actions(obs, explore=True, seed=7)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    # Single-obs convenience: [A, D] in, [A] out.
    a1, _ = pol.compute_single_action(obs[0])
    assert a1.shape == (A,)
    np.testing.assert_array_equal(a1, np.asarray(acts[0]))


def test_dict_api_episode(trained_ckpt):
    """Serve a full episode through the RLlib-style dict wrapper."""
    from warehouse_tpu.env.wrapper import WarehouseMultiAgentEnv
    from warehouse_tpu.serve import Policy

    pol = Policy.from_checkpoint(trained_ckpt)
    env = WarehouseMultiAgentEnv(pol.env_cfg)
    obs, _ = env.reset(seed=0)
    carry = pol.initial_state()
    for _ in range(5):
        act_dict, carry = pol.compute_actions_dict(env, obs, carry)
        assert set(act_dict) == set(obs)
        obs, rew, term, trunc, _ = env.step(act_dict)
        assert set(rew) == set(act_dict)


def test_missing_meta_raises(tmp_path):
    from warehouse_tpu.serve import Policy

    with pytest.raises(FileNotFoundError, match="policy_meta"):
        Policy.from_checkpoint(str(tmp_path))


def test_recurrent_serving(tmp_path):
    """GRU checkpoint round-trips through serve with carry threading."""
    from warehouse_tpu.serve import Policy
    from warehouse_tpu.train.__main__ import main as train_main

    ckpt = str(tmp_path / "ck_gru")
    train_main([
        "--env", "small", "--num-envs", "8", "--unroll-length", "4",
        "--num-updates", "2", "--log-every", "2", "--checkpoint-every", "2",
        "--hidden-dim", "8", "--arch", "gru", "--single-device",
        "--checkpoint-dir", ckpt, "--metrics-path", str(tmp_path / "m.jsonl"),
    ])
    pol = Policy.from_checkpoint(ckpt)
    assert pol.recurrent
    A, D = pol.env_cfg.num_agents, pol.env_cfg.obs_dim
    carry = pol.initial_state(batch_size=2)
    obs = np.zeros((2, A, D), np.float32)
    acts, carry = pol.compute_actions(obs, state=carry)
    assert acts.shape == (2, A)
    assert carry is not None
    acts2, carry = pol.compute_actions(obs, state=carry)
    assert acts2.shape == (2, A)
