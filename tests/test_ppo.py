"""PPO learner tests (SURVEY.md §4.4)."""

import numpy as np
import pytest

from warehouse_tpu import EnvConfig, TrainConfig, small_config


def make_tiny_trainer(mesh=None, **tkw):
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=16)
    t = dict(num_envs=16, unroll_length=4, num_minibatches=2, ppo_epochs=2,
             hidden_dim=32)
    t.update(tkw)
    return make_train(cfg, TrainConfig(**t), mesh=mesh)


def test_train_step_smoke():
    import jax

    trainer = make_tiny_trainer()
    rs = trainer.init(jax.random.PRNGKey(0))
    rs, m = trainer.train_step(rs)
    assert int(rs.update_idx) == 1
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(m["entropy"]) > 0


def test_reproducible():
    import jax

    trainer = make_tiny_trainer()
    rs1 = trainer.init(jax.random.PRNGKey(7))
    rs2 = trainer.init(jax.random.PRNGKey(7))
    for _ in range(2):
        rs1, m1 = trainer.train_step(rs1)
        rs2, m2 = trainer.train_step(rs2)
    leaves1 = jax.tree.leaves(rs1.params)
    leaves2 = jax.tree.leaves(rs2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m1["loss"]) == float(m2["loss"])


def test_params_change_and_finite():
    import jax

    trainer = make_tiny_trainer()
    rs = trainer.init(jax.random.PRNGKey(1))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), rs.params)
    rs, _ = trainer.train_step(rs)
    after = rs.params
    changed = False
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        b = np.asarray(b)
        assert np.isfinite(b).all()
        changed |= not np.array_equal(np.asarray(a), b)
    assert changed, "params did not change after an update"


def test_train_many_matches_stepwise():
    import jax

    trainer = make_tiny_trainer()
    rs_a = trainer.init(jax.random.PRNGKey(3))
    rs_b = trainer.init(jax.random.PRNGKey(3))
    for _ in range(3):
        rs_a, _ = trainer.train_step(rs_a)
    rs_b, _ = trainer.train_many(rs_b, 3)
    for a, b in zip(jax.tree.leaves(rs_a.params), jax.tree.leaves(rs_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_gae_matches_numpy_reference():
    """Hand-rolled NumPy GAE vs the scan implementation."""
    import jax.numpy as jnp

    from warehouse_tpu.ops.gae import gae

    rng = np.random.default_rng(0)
    T, B = 12, 5
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    dones = rng.random((T, B)) < 0.2
    last_v = rng.normal(size=(B,)).astype(np.float32)
    gamma, lam = 0.97, 0.9

    adv_ref = np.zeros((T, B), np.float32)
    next_adv = np.zeros(B, np.float32)
    next_val = last_v
    for t in reversed(range(T)):
        nd = 1.0 - dones[t].astype(np.float32)
        delta = rewards[t] + gamma * next_val * nd - values[t]
        next_adv = delta + gamma * lam * nd * next_adv
        adv_ref[t] = next_adv
        next_val = values[t]

    adv, tgt = gae(jnp.array(rewards), jnp.array(values), jnp.array(dones),
                   jnp.array(last_v), gamma, lam)
    np.testing.assert_allclose(np.asarray(adv), adv_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(tgt), adv_ref + values, rtol=1e-5, atol=1e-5
    )


def test_gae_truncation_bootstrap_matches_numpy():
    """bootstrap_values: boundary deltas use V(true successor) instead of
    0; the λ-trace is still cut. NumPy reference check."""
    import jax.numpy as jnp

    from warehouse_tpu.ops.gae import gae

    rng = np.random.default_rng(1)
    T, B = 10, 4
    rewards = rng.normal(size=(T, B)).astype(np.float32)
    values = rng.normal(size=(T, B)).astype(np.float32)
    dones = rng.random((T, B)) < 0.3
    boot = rng.normal(size=(T, B)).astype(np.float32)
    last_v = rng.normal(size=(B,)).astype(np.float32)
    gamma, lam = 0.99, 0.95

    adv_ref = np.zeros((T, B), np.float32)
    next_adv = np.zeros(B, np.float32)
    next_val = last_v
    for t in reversed(range(T)):
        nd = 1.0 - dones[t].astype(np.float32)
        nv = nd * next_val + (1.0 - nd) * boot[t]
        delta = rewards[t] + gamma * nv - values[t]
        next_adv = delta + gamma * lam * nd * next_adv
        adv_ref[t] = next_adv
        next_val = values[t]

    adv, tgt = gae(jnp.array(rewards), jnp.array(values), jnp.array(dones),
                   jnp.array(last_v), gamma, lam,
                   bootstrap_values=jnp.array(boot))
    np.testing.assert_allclose(np.asarray(adv), adv_ref, rtol=1e-5, atol=1e-5)

    # With no boundaries the bootstrap values must be inert.
    no_d = jnp.zeros((T, B), bool)
    a1, _ = gae(jnp.array(rewards), jnp.array(values), no_d,
                jnp.array(last_v), gamma, lam)
    a2, _ = gae(jnp.array(rewards), jnp.array(values), no_d,
                jnp.array(last_v), gamma, lam,
                bootstrap_values=jnp.array(boot))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_train_step_env_minibatch_mode():
    """minibatch_mode='env' trains: finite metrics, params move, and the
    rollout phase is identical to flat mode (only the epoch shuffle
    granularity differs)."""
    import jax

    t_env = make_tiny_trainer(minibatch_mode="env", num_minibatches=2)
    rs = t_env.init(jax.random.PRNGKey(0))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), rs.params)
    for _ in range(2):
        rs, m = t_env.train_step(rs)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(rs.params))
    )


def test_train_step_bootstrap_truncated_smoke():
    """End-to-end update with truncation bootstrapping on: runs, finite,
    and actually differs from the terminal-cut update (unroll spans a
    truncation at max_steps=16 with T=4 after 4 updates)."""
    import jax

    t_on = make_tiny_trainer(bootstrap_truncated=True)
    t_off = make_tiny_trainer()
    rs_on = t_on.init(jax.random.PRNGKey(0))
    rs_off = t_off.init(jax.random.PRNGKey(0))
    for _ in range(4):  # 4 updates × T=4 = 16 steps → crosses a boundary
        rs_on, m_on = t_on.train_step(rs_on)
        rs_off, m_off = t_off.train_step(rs_off)
    for k, v in m_on.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    diff = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(rs_on.params),
                        jax.tree.leaves(rs_off.params))
    )
    assert diff, "bootstrapping had no effect across a truncation boundary"


def test_engine_final_obs_is_pre_reset():
    """TimeStep.final_obs equals obs except on auto-reset ticks, where it
    is the terminal (pre-reset) observation of the OLD episode."""
    import jax

    from warehouse_tpu.config import small_config
    from warehouse_tpu.env import engine

    cfg = small_config(max_steps=5, auto_reset=True)
    cfg_plain = small_config(max_steps=5, auto_reset=False)
    state, obs = engine.reset(cfg, jax.random.PRNGKey(3))
    state_p, _ = engine.reset(cfg_plain, jax.random.PRNGKey(3))
    for t in range(5):
        actions = np.full(cfg.num_agents, (t % 4) + 1, np.int32)
        state, ts = engine.step(cfg, state, actions)
        state_p, ts_p = engine.step(cfg_plain, state_p, actions)
        if bool(ts.truncated):
            # final_obs matches the non-auto-reset twin's terminal obs...
            np.testing.assert_array_equal(
                np.asarray(ts.final_obs), np.asarray(ts_p.obs))
            # ...and obs is the fresh episode's (t reset to 0).
            assert int(state.t) == 0
        else:
            np.testing.assert_array_equal(
                np.asarray(ts.final_obs), np.asarray(ts.obs))


@pytest.mark.slow
def test_ppo_learns_tiny_env():
    """PPO improves delivery rate on a trivial 3x3/1-agent env
    (SURVEY.md §4.4 fast smoke)."""
    import jax

    from warehouse_tpu.train.ppo import make_train

    cfg = EnvConfig(height=3, width=3, num_agents=1, queue_capacity=2,
                    init_requests=1, max_steps=24, spawn_prob=0.6,
                    obs_radius=2)
    tcfg = TrainConfig(num_envs=128, unroll_length=24, num_updates=40,
                       num_minibatches=4, ppo_epochs=4, hidden_dim=64,
                       learning_rate=1e-3, entropy_coef=0.02,
                       anneal_lr=False)
    trainer = make_train(cfg, tcfg)
    rs = trainer.init(jax.random.PRNGKey(0))
    rs, m0 = trainer.train_many(rs, 5)
    early = float(np.mean(np.asarray(m0["deliveries_per_env_step"])))
    rs, m1 = trainer.train_many(rs, 35)
    late = float(np.mean(np.asarray(m1["deliveries_per_env_step"])[-5:]))
    assert late > early * 1.3 + 1e-4, f"no learning: early={early} late={late}"


def test_adaptive_kl_penalty():
    import jax

    trainer = make_tiny_trainer(kl_coeff=0.2, kl_target=0.01)
    rs = trainer.init(jax.random.PRNGKey(0))
    assert abs(float(rs.kl_coeff) - 0.2) < 1e-6
    rs, m = trainer.train_step(rs)
    assert np.isfinite(float(m["kl"]))
    # Coefficient stays positive and adapts by the x1.5 / x0.5 / x1 rule.
    c = float(m["kl_coeff"])
    assert any(abs(c - v) < 1e-6 for v in (0.2, 0.2 * 1.5, 0.2 * 0.5)), c

    # With the penalty disabled the coefficient stays exactly zero.
    t2 = make_tiny_trainer()
    rs2 = t2.init(jax.random.PRNGKey(0))
    rs2, m2 = t2.train_step(rs2)
    assert float(m2["kl_coeff"]) == 0.0


def test_multi_policy_groups():
    """RLlib policy_mapping_fn capability: K independent policies."""
    import jax

    from warehouse_tpu import TrainConfig, small_config
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=16)
    t = TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                    ppo_epochs=2, hidden_dim=32)
    tr = make_train(cfg, t, policy_groups=(0, 1))
    rs = tr.init(jax.random.PRNGKey(0))
    before = [np.asarray(x).copy() for x in jax.tree.leaves(rs.params)]
    for _ in range(3):
        rs, m = tr.train_step(rs)
    after = jax.tree.leaves(rs.params)
    assert all(
        not np.array_equal(a, np.asarray(b)) for a, b in zip(before, after)
    ), "some policy group's params did not train"
    assert np.isfinite(float(m["loss"]))
    # The two groups hold distinct parameters after training.
    p = rs.params["params"]
    keys = sorted(p.keys())
    assert len(keys) >= 2, keys
    g0 = jax.tree.leaves({k: v for k, v in p.items() if "_0" in k or k.endswith("0")})
    assert g0, keys


def test_multi_policy_validation():
    import pytest as _pytest

    from warehouse_tpu import TrainConfig, small_config
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config()
    t = TrainConfig(num_envs=8, unroll_length=4, num_minibatches=2,
                    ppo_epochs=1, hidden_dim=16)
    with _pytest.raises(ValueError, match="one entry per agent"):
        make_train(cfg, t, policy_groups=(0,))
    with _pytest.raises(ValueError, match="no gaps"):
        make_train(cfg, t, policy_groups=(0, 2))


def test_shaping_masking_annealing_smoke():
    """Shaping + action masking + entropy anneal run and stay finite on a
    walled layout; masked policy never proposes a wall move."""
    import jax

    from warehouse_tpu.train.ppo import make_train

    cfg = EnvConfig(height=5, width=5, num_agents=2, queue_capacity=4,
                    init_requests=2, max_steps=16, walls=(10, 11, 13, 14))
    tcfg = TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                       ppo_epochs=2, hidden_dim=32, num_updates=4,
                       shaping_coef=0.05, mask_actions=True,
                       entropy_coef=0.05, entropy_coef_final=0.001)
    trainer = make_train(cfg, tcfg)
    rs = trainer.init(jax.random.PRNGKey(0))
    for _ in range(3):
        rs, m = trainer.train_step(rs)
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"


def test_shaping_is_zero_on_open_floor_when_disabled():
    """shaping_coef=0 (default) leaves the trajectory identical: the
    shaped branch is compiled out, metrics bit-match the baseline run."""
    import jax

    t1 = make_tiny_trainer()
    t2 = make_tiny_trainer(shaping_coef=0.0)
    rs1 = t1.init(jax.random.PRNGKey(3))
    rs2 = t2.init(jax.random.PRNGKey(3))
    rs1, m1 = t1.train_step(rs1)
    rs2, m2 = t2.train_step(rs2)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k


def test_masked_actions_never_hit_walls():
    """With mask_actions, collisions can only be agent-agent or grid-edge
    — never wall cells: assert no agent ever occupies or is reverted
    FROM a wall-adjacent proposal... (direct check: rollout actions all
    satisfy the valid mask)."""
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.env import engine
    from warehouse_tpu.models import make_model
    from warehouse_tpu.ops.move import valid_action_mask
    from warehouse_tpu.train.ppo import make_train

    cfg = EnvConfig(height=5, width=5, num_agents=2, queue_capacity=4,
                    init_requests=2, max_steps=16, walls=(10, 11, 13, 14),
                    auto_reset=True)
    tcfg = TrainConfig(num_envs=8, unroll_length=8, num_minibatches=2,
                       ppo_epochs=1, hidden_dim=32, mask_actions=True)
    trainer = make_train(cfg, tcfg)
    rs = trainer.init(jax.random.PRNGKey(1))
    rs, _ = trainer.train_step(rs)

    # Re-roll manually with the trained params + masking: sampled actions
    # must always be valid.
    model, params = trainer.model, rs.params
    key = jax.random.PRNGKey(5)
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(8))
    state, obs = jax.vmap(lambda k: engine.reset(cfg, k))(keys)
    for t in range(16):
        logits, _ = model.apply(params, obs)
        mask = jax.vmap(lambda p: valid_action_mask(cfg, p))(state.agent_pos)
        logits = jnp.where(mask, logits, -1e9)
        key, ak = jax.random.split(key)
        acts = jax.random.categorical(ak, logits)
        ok = jnp.take_along_axis(mask, acts[..., None], axis=-1)
        assert bool(ok.all()), f"invalid action sampled at t={t}"
        state, ts = jax.vmap(
            lambda s, a: engine.step(cfg, s, a)
        )(state, acts.astype(jnp.int32))
        obs = ts.obs


def test_bf16_model_dtype():
    """bfloat16 compute: training runs, loss finite, params stay fp32."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    t = TrainConfig(num_envs=8, unroll_length=4, num_updates=2,
                    num_minibatches=2, ppo_epochs=1, hidden_dim=32,
                    model_dtype="bfloat16")
    trainer = make_train(cfg, t)
    rs = trainer.init(jax.random.PRNGKey(0))
    dtypes = {str(x.dtype) for x in jax.tree.leaves(rs.params)}
    assert dtypes == {"float32"}
    rs, metrics = trainer.train_step(rs)
    assert np.isfinite(float(metrics["loss"]))


def test_flat_optimizer_runs_and_updates_params():
    """flat_optimizer=True (optax.flatten over the chain): training runs,
    loss finite, params change — and the knob composes with PBT's
    inject_hyperparams set_lr path (exercised via make_train_pbt)."""
    import jax
    import numpy as np

    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    t = TrainConfig(num_envs=8, unroll_length=4, num_updates=2,
                    num_minibatches=2, ppo_epochs=1, hidden_dim=32,
                    flat_optimizer=True)
    trainer = make_train(cfg, t)
    rs = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.map(lambda x: np.asarray(x), rs.params)
    rs, metrics = trainer.train_step(rs)
    assert np.isfinite(float(metrics["loss"]))
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(a, np.asarray(b)), p0, rs.params
    )
    assert any(jax.tree.leaves(changed))

    import jax.numpy as jnp

    from warehouse_tpu.train.pbt import make_pbt_trainer

    init_members, train_chunk, get_lr, _ = make_pbt_trainer(cfg, t)
    ms = init_members(
        jax.random.PRNGKey(1), jnp.array([1e-3, 3e-4]),
        jnp.array([0.01, 0.02]),
    )
    ms, pm = train_chunk(ms, 1)
    assert np.isfinite(float(np.asarray(pm["loss"]).sum()))
    # set_lr path through the flattened chain state still reads back.
    np.testing.assert_allclose(np.asarray(get_lr(ms)), [1e-3, 3e-4])


def test_micro_batches_match_full_minibatch_grad():
    """micro_batches=K averages K micro grads into ONE optimizer step —
    the same SGD trajectory as micro_batches=1 up to f32 summation
    order (TrainConfig.micro_batches; adv normalization hoisted to
    per-minibatch via ppo_losses' normalize_adv=False path)."""
    import jax
    import jax.numpy as jnp

    t1 = make_tiny_trainer()
    t4 = make_tiny_trainer(micro_batches=4)
    r1 = t1.init(jax.random.PRNGKey(3))
    r4 = t4.init(jax.random.PRNGKey(3))
    for _ in range(2):
        r1, m1 = t1.train_step(r1)
        r4, m4 = t4.train_step(r4)
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for k in m1:
        assert abs(float(m1[k]) - float(m4[k])) < 1e-4, k


def test_micro_batches_divisibility_raises():
    with pytest.raises(ValueError, match="micro_batches"):
        make_tiny_trainer(micro_batches=7)


def test_epoch_shuffle_once_single_epoch_matches_each():
    """With ppo_epochs=1, epoch_shuffle='once' is draw-for-draw identical
    to 'each' (both split the carry key once and build one shuffle), so
    the whole training trajectory must match bit-exactly. Pinned to
    minibatch_mode='flat': env/once is implemented as the pre-rollout
    env-STATE permutation (train/ppo.py use_state_shuffle), a different
    (equivalent-composition) draw stream from env/each's gather."""
    import jax

    ta = make_tiny_trainer(ppo_epochs=1, minibatch_mode="flat")
    tb = make_tiny_trainer(ppo_epochs=1, minibatch_mode="flat",
                           epoch_shuffle="once")
    ra = ta.init(jax.random.PRNGKey(5))
    rb = tb.init(jax.random.PRNGKey(5))
    for _ in range(3):
        ra, ma = ta.train_step(ra)
        rb, mb = tb.train_step(rb)
    for a, b in zip(jax.tree.leaves(ra.params), jax.tree.leaves(rb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ma:
        assert float(ma[k]) == float(mb[k]), k


def test_epoch_shuffle_once_multi_epoch_learns_and_validates():
    """'once' with ppo_epochs>1 reuses one partition per update: the
    step runs, metrics stay finite, params move; a bad value raises."""
    import jax

    trainer = make_tiny_trainer(epoch_shuffle="once")
    rs = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.leaves(rs.params)[0].copy()
    rs, m = trainer.train_step(rs)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert not np.array_equal(np.asarray(p0),
                              np.asarray(jax.tree.leaves(rs.params)[0]))
    with pytest.raises(ValueError, match="epoch_shuffle"):
        make_tiny_trainer(epoch_shuffle="sometimes")
