"""Policy model shape/dtype tests."""

import numpy as np

from warehouse_tpu import medium_config
from warehouse_tpu.models import make_model


def test_mlp_shapes():
    import jax
    import jax.numpy as jnp

    cfg = medium_config()
    model = make_model(cfg, arch="mlp", hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.obs_dim)))
    obs = jnp.zeros((7, cfg.num_agents, cfg.obs_dim))
    logits, value = model.apply(params, obs)
    assert logits.shape == (7, cfg.num_agents, 5)
    assert value.shape == (7, cfg.num_agents)
    assert logits.dtype == jnp.float32


def test_cnn_shapes():
    import jax
    import jax.numpy as jnp

    cfg = medium_config()
    model = make_model(cfg, arch="cnn", hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.obs_dim)))
    obs = jnp.zeros((3, cfg.obs_dim))
    logits, value = model.apply(params, obs)
    assert logits.shape == (3, 5)
    assert value.shape == (3,)


def test_cnn_global_obs():
    import jax
    import jax.numpy as jnp

    cfg = medium_config(global_obs=True)
    model = make_model(cfg, arch="cnn", hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.obs_dim)))
    logits, value = model.apply(params, jnp.zeros((2, cfg.obs_dim)))
    assert logits.shape == (2, 5)


def test_model_on_real_obs():
    import jax

    from warehouse_tpu.env import reset

    cfg = medium_config()
    state, obs = reset(cfg, jax.random.PRNGKey(0))
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(1), obs)
    logits, value = model.apply(params, obs)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(value)).all()


def test_attn_shapes():
    import jax
    import jax.numpy as jnp

    cfg = medium_config()
    model = make_model(cfg, arch="attn", hidden_dim=64, num_layers=2)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.obs_dim)))
    obs = jnp.zeros((7, cfg.num_agents, cfg.obs_dim))
    logits, value = model.apply(params, obs)
    assert logits.shape == (7, cfg.num_agents, 5)
    assert value.shape == (7, cfg.num_agents)
    assert logits.dtype == jnp.float32


def test_attn_global_obs_and_jit():
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.env import reset

    cfg = medium_config(global_obs=True)
    state, obs = reset(cfg, jax.random.PRNGKey(0))
    model = make_model(cfg, arch="attn", hidden_dim=64)
    params = model.init(jax.random.PRNGKey(1), obs)
    logits, value = jax.jit(model.apply)(params, obs)
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(value)).all()


def test_attn_ppo_train_step():
    import jax

    from warehouse_tpu import TrainConfig, small_config
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    t = TrainConfig(num_envs=8, unroll_length=4, num_updates=2,
                    num_minibatches=2, ppo_epochs=1, hidden_dim=32,
                    num_layers=1)
    trainer = make_train(cfg, t, arch="attn")
    rs = trainer.init(jax.random.PRNGKey(0))
    rs, metrics = trainer.train_step(rs)
    assert int(rs.update_idx) == 1
    assert np.isfinite(float(metrics["loss"]))
