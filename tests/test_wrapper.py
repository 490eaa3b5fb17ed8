"""Dict-API wrapper contract tests (docs/SEMANTICS.md §11, SURVEY.md C8)."""

import numpy as np
import pytest

from warehouse_tpu import small_config
from warehouse_tpu.env.wrapper import WarehouseMultiAgentEnv


def test_api_contract():
    cfg = small_config(max_steps=6)
    env = WarehouseMultiAgentEnv(cfg, backend="jax")
    obs, info = env.reset(seed=0)
    assert set(obs) == {"agent_0", "agent_1"}
    assert obs["agent_0"].shape == (cfg.obs_dim,)
    assert obs["agent_0"].dtype == np.float32
    sp = env.observation_space("agent_0")
    assert sp.shape == (cfg.obs_dim,)
    assert env.action_space("agent_0").n == 5

    for t in range(6):
        acts = {a: 0 for a in env.possible_agents}
        obs, rew, term, trunc, info = env.step(acts)
        assert set(rew) == set(env.possible_agents)
        assert term["__all__"] is False
        assert trunc["__all__"] == (t == 5)
        assert set(info["agent_0"]) == {"picked", "delivered", "collided"}
    assert env.agents == []  # episode over


def test_action_validation():
    env = WarehouseMultiAgentEnv(small_config(), backend="jax")
    env.reset(seed=0)
    with pytest.raises(ValueError, match="invalid action"):
        env.step({"agent_0": 7, "agent_1": 0})


def test_backends_agree():
    cfg = small_config(max_steps=20)
    ej = WarehouseMultiAgentEnv(cfg, backend="jax")
    eo = WarehouseMultiAgentEnv(cfg, backend="oracle")
    oj, _ = ej.reset(seed=3)
    oo, _ = eo.reset(seed=3)
    for a in ej.possible_agents:
        np.testing.assert_array_equal(oj[a], oo[a])
    rng = np.random.default_rng(0)
    for _ in range(20):
        acts = {a: int(rng.integers(0, 5)) for a in ej.possible_agents}
        oj, rj, _, tj, ij = ej.step(acts)
        oo, ro, _, to, io = eo.step(acts)
        for a in ej.possible_agents:
            np.testing.assert_array_equal(oj[a], oo[a])
            assert rj[a] == ro[a]
            assert ij[a] == io[a]
        assert tj["__all__"] == to["__all__"]


def test_render():
    cfg = small_config()
    env = WarehouseMultiAgentEnv(cfg, backend="jax")
    env.reset(seed=0)
    s = env.render()
    lines = s.splitlines()
    assert lines[0] == "t=0"
    assert len(lines) == cfg.height + 3
    assert all(len(l) == cfg.width + 2 for l in lines[1:])
    # Both agents visible.
    body = "".join(lines)
    assert "0" in body and "1" in body


def test_unknown_backend():
    with pytest.raises(ValueError):
        WarehouseMultiAgentEnv(small_config(), backend="ray")


def test_evaluate_policy_helper():
    from warehouse_tpu.evaluate import evaluate_policy
    import jax

    from warehouse_tpu.baselines.greedy import greedy_actions

    cfg = small_config(max_steps=16)

    def policy_fn(state, obs, key):
        return jax.vmap(lambda s: greedy_actions(cfg, s))(state)

    m = evaluate_policy(cfg, policy_fn, num_episodes=8, seed=0)
    assert m["episodes"] == 8
    assert np.isfinite(m["mean_episode_return"])
    assert m["mean_deliveries_per_episode"] >= 0


def test_render_rgb_and_gif(tmp_path):
    """rgb_array mode (SURVEY.md C14): correct shape/dtype, walls dark,
    agents drawn; GIF round-trips through PIL."""
    import numpy as np

    from warehouse_tpu import EnvConfig
    from warehouse_tpu.env.render import save_gif
    from warehouse_tpu.env.wrapper import WarehouseMultiAgentEnv

    cfg = EnvConfig(height=5, width=5, num_agents=2, queue_capacity=4,
                    init_requests=2, max_steps=8, walls=(12,))
    env = WarehouseMultiAgentEnv(cfg)
    env.reset(seed=0)
    img = env.render(mode="rgb_array")
    assert img.shape == (5 * 16, 5 * 16, 3) and img.dtype == np.uint8
    # Wall cell (2,2) interior is dark.
    assert (img[2 * 16 + 8, 2 * 16 + 8] < 100).all()
    frames = [img]
    for _ in range(3):
        env.step({a: 4 for a in env.possible_agents})
        frames.append(env.render(mode="rgb_array"))
    out = tmp_path / "ep.gif"
    save_gif(frames, str(out))
    from PIL import Image

    im = Image.open(out)
    assert im.n_frames == 4
