"""Env registry tests (tune.register_env capability parity)."""

import pytest

from warehouse_tpu import registry


def test_registered_defaults():
    names = registry.registered()
    assert {"warehouse-small", "warehouse-medium", "warehouse-large"} <= set(
        names
    )


def test_make_config_with_overrides():
    cfg = registry.make_config("warehouse-small", max_steps=7)
    assert cfg.height == 5 and cfg.max_steps == 7


def test_make_env():
    env = registry.make_env("warehouse-small", backend="oracle")
    obs, _ = env.reset(seed=0)
    assert set(obs) == {"agent_0", "agent_1"}


def test_make_parallel_env():
    env = registry.make_parallel_env("warehouse-small", backend="oracle")
    obs, _ = env.reset(seed=0)
    assert len(obs) == 2


def test_register_custom_and_duplicate():
    from warehouse_tpu import EnvConfig

    registry.register("warehouse-test-tiny",
                      lambda **kw: EnvConfig(height=3, width=3,
                                             num_agents=1, queue_capacity=1,
                                             init_requests=1, **kw))
    assert "warehouse-test-tiny" in registry.registered()
    with pytest.raises(ValueError, match="already registered"):
        registry.register("warehouse-test-tiny", lambda **kw: None)
    with pytest.raises(KeyError, match="unknown env"):
        registry.make_config("warehouse-nope")
