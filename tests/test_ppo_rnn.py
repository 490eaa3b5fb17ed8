"""Recurrent PPO (GRU/LSTM) tests — RLlib use_lstm capability parity
(warehouse_tpu/train/ppo_rnn.py)."""

import numpy as np
import pytest

from warehouse_tpu import TrainConfig, small_config


def make_rnn_trainer(arch="gru", mesh=None, **tkw):
    from warehouse_tpu.train.ppo_rnn import make_train_rnn

    cfg = small_config(max_steps=16)
    t = dict(num_envs=16, unroll_length=4, num_minibatches=2, ppo_epochs=2,
             hidden_dim=32)
    t.update(tkw)
    return make_train_rnn(cfg, TrainConfig(**t), arch=arch)


@pytest.mark.parametrize("arch", ["gru", "lstm"])
def test_rnn_train_step_smoke(arch):
    import jax

    trainer = make_rnn_trainer(arch)
    rs = trainer.init(jax.random.PRNGKey(0))
    rs, m = trainer.train_step(rs)
    assert int(rs.update_idx) == 1
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(m["entropy"]) > 0


def test_rnn_reproducible():
    import jax

    t = make_rnn_trainer()
    rs1 = t.init(jax.random.PRNGKey(7))
    rs2 = t.init(jax.random.PRNGKey(7))
    for _ in range(2):
        rs1, m1 = t.train_step(rs1)
        rs2, m2 = t.train_step(rs2)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k
    leaves1 = jax.tree.leaves(rs1.params)
    leaves2 = jax.tree.leaves(rs2.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rnn_carry_resets_at_episode_boundary():
    """After a truncation tick the next rollout starts from a zero carry:
    run until an auto-reset happens and check the runner's carry rows for
    freshly reset envs are zero."""
    import jax

    # max_steps=4 == unroll_length so every rollout ends exactly one
    # episode per env: the final carry must be all zeros.
    trainer = make_rnn_trainer(unroll_length=4)
    cfg = trainer.env_cfg.replace(max_steps=4)
    from warehouse_tpu.train.ppo_rnn import make_train_rnn

    trainer = make_train_rnn(cfg, trainer.tcfg)
    rs = trainer.init(jax.random.PRNGKey(0))
    rs, _ = trainer.train_step(rs)
    for leaf in jax.tree.leaves(rs.carry):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_rnn_minibatch_seq_split_safe_when_B_equals_T():
    """b_local == unroll_length must not confuse the seq/h0 splitters."""
    import jax

    trainer = make_rnn_trainer(num_envs=4, unroll_length=4,
                               num_minibatches=2)
    rs = trainer.init(jax.random.PRNGKey(2))
    rs, m = trainer.train_step(rs)
    assert np.isfinite(float(m["loss"]))


def test_rnn_meshed_matches_structure():
    import jax

    from warehouse_tpu.parallel.mesh import make_mesh
    from warehouse_tpu.train.ppo_rnn import make_train_rnn

    cfg = small_config(max_steps=16)
    tcfg = TrainConfig(num_envs=32, unroll_length=4, num_minibatches=2,
                       ppo_epochs=2, hidden_dim=32)
    mesh = make_mesh(jax.devices())
    trainer = make_train_rnn(cfg, tcfg, mesh=mesh)
    rs = trainer.init_global(jax.random.PRNGKey(0))
    rs, m = trainer.train_step(rs)
    for k, v in m.items():
        assert np.isfinite(float(np.asarray(v).reshape(-1)[0])), k
    # Replicated params identical across shards after psum'd update.
    p = jax.tree.leaves(rs.params)[0]
    shards = [np.asarray(s.data) for s in p.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_rnn_evaluate_policy_carry_threading():
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.evaluate import evaluate_policy

    trainer = make_rnn_trainer()
    cfg = trainer.env_cfg.replace(auto_reset=False)
    rs = trainer.init(jax.random.PRNGKey(0))
    params = rs.params
    model = trainer.model

    def policy_fn(state, obs, key, carry):
        logits, _, carry = model.apply(params, obs, carry)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), carry

    ev = evaluate_policy(
        cfg, policy_fn, 8, seed=0,
        init_carry=lambda B: model.initial_carry((B, cfg.num_agents)),
    )
    assert ev["episodes"] == 8
    assert np.isfinite(ev["mean_episode_return"])


def test_rnn_epoch_shuffle_once_single_env_matches_each():
    """epoch_shuffle='once' is implemented as a pre-rollout env-STATE
    permutation (train/ppo_rnn.py use_state_shuffle) whose perm key is
    fold_in-derived, leaving the main draw stream unadvanced. At
    num_envs=1 the permutation is the identity and 'each' with
    ppo_epochs=1 consumes the same single scaffold key split — the two
    modes must then be draw-for-draw identical, anchoring the stream
    bookkeeping."""
    import jax
    import numpy as np

    kw = dict(ppo_epochs=1, num_envs=1, num_minibatches=1)
    ta = make_rnn_trainer(**kw, epoch_shuffle="each")
    tb = make_rnn_trainer(**kw, epoch_shuffle="once")
    ra = ta.init(jax.random.PRNGKey(7))
    rb = tb.init(jax.random.PRNGKey(7))
    for _ in range(2):
        ra, ma = ta.train_step(ra)
        rb, mb = tb.train_step(rb)
    for a, b in zip(jax.tree.leaves(ra.params), jax.tree.leaves(rb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for k in ma:
        assert float(ma[k]) == float(mb[k]), k


def test_rnn_epoch_shuffle_once_learns():
    """State-shuffled 'once' mode at num_envs>1: step runs, metrics
    finite, params move."""
    import jax
    import numpy as np

    trainer = make_rnn_trainer(epoch_shuffle="once")
    rs = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.leaves(rs.params)[0].copy()
    rs, m = trainer.train_step(rs)
    for k, v in m.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert not np.array_equal(
        np.asarray(p0), np.asarray(jax.tree.leaves(rs.params)[0]))


def test_gru_trainer_end_to_end_learns():
    """End-to-end GRU trainer: finite metrics, params move."""
    import jax
    import numpy as np

    trainer = make_rnn_trainer()
    rs = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.leaves(rs.params)[0].copy()
    for _ in range(2):
        rs, m = trainer.train_step(rs)
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    assert not np.array_equal(
        np.asarray(p0), np.asarray(jax.tree.leaves(rs.params)[0]))


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["gru", "lstm"])
def test_rnn_trainer_grad_backend_equivalence(arch):
    """grad_backend='pallas' (fused sequence-replay kernel) vs 'xla',
    same seed, same XLA rollout: identical draw streams (same
    pre-rollout env permutation + mirrored key split) -> env states
    BIT-equal, metrics/params to f32 tolerance — for BOTH recurrent
    cells (LSTM replay is round 4)."""
    import jax

    trx = make_rnn_trainer(arch, mask_actions=True, kl_coeff=0.1,
                           entropy_coef_final=0.001)
    trp = make_rnn_trainer(arch, mask_actions=True, kl_coeff=0.1,
                           entropy_coef_final=0.001,
                           grad_backend="pallas", pallas_interpret=True)
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(3):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < (
                2e-4 + 1e-3 * abs(float(mx[k]))), k
    for a, b in zip(jax.tree.leaves(rsx.env_state),
                    jax.tree.leaves(rsp.env_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(rsx.key),
                                  np.asarray(rsp.key))
    for a, b in zip(jax.tree.leaves(rsx.params),
                    jax.tree.leaves(rsp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-5)


@pytest.mark.slow
def test_rnn_fused_act_and_sgd_train():
    """rollout_backend='pallas' + grad_backend='pallas' (the fully
    fused recurrent trained path) runs end-to-end in interpret mode:
    finite metrics, params move, update counter advances."""
    import jax

    trainer = make_rnn_trainer(
        mask_actions=True, rollout_backend="pallas",
        grad_backend="pallas", pallas_block=8, pallas_interpret=True)
    rs = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.leaves(rs.params)[0].copy()
    for _ in range(2):
        rs, m = trainer.train_step(rs)
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    assert int(rs.update_idx) == 2
    assert not np.array_equal(
        np.asarray(p0), np.asarray(jax.tree.leaves(rs.params)[0]))


def test_rnn_grad_backend_gate_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="epoch_shuffle"):
        make_rnn_trainer(grad_backend="pallas", epoch_shuffle="each",
                         pallas_interpret=True)
    with _pytest.raises(ValueError, match="flat_optimizer"):
        make_rnn_trainer(grad_backend="pallas", flat_optimizer=True,
                         pallas_interpret=True)


def test_rnn_grad_gate_requires_chunk_final_truncation():
    """Round-4 code-review regression: the fused sequence-replay kernel
    runs the full T steps with NO carry resets, which is only exact
    when truncation lands on the chunk's last step — the grad gate must
    enforce max_steps % unroll_length == 0 (it used to miss it, which
    would have silently skipped mid-chunk carry resets)."""
    import pytest as _pytest

    from warehouse_tpu import TrainConfig, small_config
    from warehouse_tpu.train.ppo_rnn import make_train_rnn

    cfg = small_config(max_steps=10)       # 10 % 4 != 0
    t = TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                    hidden_dim=32, grad_backend="pallas",
                    pallas_interpret=True)
    with _pytest.raises(ValueError, match="max_steps"):
        make_train_rnn(cfg, t)
    # Auto must FALL BACK (not raise) on the same config.
    tr = make_rnn_trainer(unroll_length=4)
    tr2 = make_train_rnn(cfg, t.replace(grad_backend="auto"))
    assert tr2.backends["grad"] == "xla"
