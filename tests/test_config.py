import pytest

from warehouse_tpu import EnvConfig, small_config, medium_config, large_config


def test_defaults_match_spec():
    cfg = EnvConfig()
    assert (cfg.height, cfg.width, cfg.num_agents) == (9, 9, 4)
    assert cfg.queue_capacity == 8
    assert cfg.max_steps == 128


def test_obs_dim():
    cfg = EnvConfig(obs_radius=2)
    assert cfg.window_size == 5
    assert cfg.obs_dim == 4 * 25 + 6
    g = EnvConfig(global_obs=True)
    assert g.obs_dim == 5 * 81 + 6


def test_driver_configs():
    s, m, l = small_config(), medium_config(), large_config()
    assert (s.height, s.num_agents) == (5, 2)
    assert (m.height, m.num_agents) == (9, 4)
    assert (l.height, l.num_agents) == (15, 8)
    for c in (s, m, l):
        assert c.queue_capacity == 2 * c.num_agents
        assert c.init_requests == c.num_agents


def test_validation():
    with pytest.raises(ValueError):
        EnvConfig(num_agents=0)
    with pytest.raises(ValueError):
        EnvConfig(height=2, width=2, num_agents=5)
    with pytest.raises(ValueError):
        EnvConfig(init_requests=99)
    with pytest.raises(ValueError):
        EnvConfig(spawn_prob=1.5)


def test_roundtrip_json():
    cfg = medium_config(spawn_prob=0.5)
    import json

    assert EnvConfig.from_dict(json.loads(cfg.to_json())) == cfg


def test_auto_backend_fallback_warns_on_tpu(monkeypatch, caplog):
    """log_auto_resolution: a TPU-side fallback to XLA is a WARNING
    naming the reasons; off-TPU it stays INFO (VERDICT r3 item 6)."""
    import logging

    import jax

    from warehouse_tpu.train.backends import log_auto_resolution

    with caplog.at_level(logging.INFO, logger="warehouse_tpu"):
        log_auto_resolution("grad_backend", "xla", ["policy_groups"],
                            "ppo")
    assert caplog.records[-1].levelno == logging.INFO  # CPU backend

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with caplog.at_level(logging.INFO, logger="warehouse_tpu"):
        log_auto_resolution("grad_backend", "xla", ["policy_groups"],
                            "ppo")
    rec = caplog.records[-1]
    assert rec.levelno == logging.WARNING
    assert "policy_groups" in rec.getMessage()


def test_trainers_report_resolved_backends():
    """Every trainer tuple carries the RESOLVED backends dict."""
    import jax

    from warehouse_tpu import TrainConfig, small_config
    from warehouse_tpu.train.impala import make_train_impala
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.train.ppo_rnn import make_train_rnn

    cfg = small_config(max_steps=8)
    t = TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2)
    for tr in (make_train(cfg, t), make_train_impala(cfg, t),
               make_train_rnn(cfg, t)):
        assert set(tr.backends) == {"rollout", "grad"}
        # CPU backend: auto resolves to xla everywhere.
        assert tr.backends["rollout"] == "xla"
        assert tr.backends["grad"] == "xla"
