"""Fused act-phase kernel (pallas/act.py) vs the XLA path.

Exactness contract (see the module docstring): env dynamics, obs,
rewards, and the boundary reset are BIT-exact; logits/values agree to
float accumulation order. All tests run the kernel in interpret mode on
the CPU backend; the real-chip drive is the trainer A/B in
benchmarks/ab_backend.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from warehouse_tpu.config import TrainConfig, small_config
from warehouse_tpu.env import engine
from warehouse_tpu.env.batch import (
    reset_truncated_batch,
    step_autoreset_batch,
    step_batch,
)
from warehouse_tpu.models import make_model
from warehouse_tpu.pallas.act import ppo_rollout_pallas

B, T = 128, 4


@pytest.fixture(scope="module")
def rollout():
    cfg = small_config().replace(max_steps=T)  # chunk end == episode end
    key = jax.random.PRNGKey(0)
    model = make_model(cfg)
    params = model.init(key, jnp.zeros((1, cfg.obs_dim), jnp.float32))
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    state, obs0 = jax.vmap(lambda k: engine.reset(cfg, k))(env_keys)
    out = ppo_rollout_pallas(cfg, params, state, T, jax.random.PRNGKey(7),
                             block=B, interpret=True)
    return cfg, model, params, state, obs0, out


def test_obs_and_dynamics_bit_exact(rollout):
    """Kernel obs/rewards/final state == XLA engine replaying the
    kernel's actions (cites the shared env_tick, pallas/rollout.py)."""
    cfg, model, params, state, obs0, out = rollout
    new_state, roll, reset_key_last, next_key = out
    assert bool(jnp.all(roll.obs[0] == obs0))
    s = state
    for t in range(T):
        s, ts = step_batch(cfg, s, roll.action[t])
        assert bool(jnp.all(ts.reward == roll.reward[t])), f"t={t}"
        assert bool(
            jnp.all(ts.delivered.sum(-1) == roll.delivered[t])), f"t={t}"
        if t + 1 < T:
            assert bool(jnp.all(ts.obs == roll.obs[t + 1])), f"t={t}"
    for f in ("agent_pos", "agent_req", "carrying", "req_pickup",
              "req_drop", "req_status", "req_agent", "t", "key"):
        assert bool(jnp.all(getattr(s, f) == getattr(new_state, f))), f
    # max_steps == T: every env truncates exactly at the chunk end.
    assert bool(jnp.all(roll.truncated[-1]))
    assert not bool(jnp.any(roll.truncated[:-1]))


def test_policy_head_matches_flax(rollout):
    """Kernel logits/value/log-prob vs flax apply on the same obs —
    equal up to f32 accumulation order; sampled actions equal to the
    XLA sampler consuming the same gumbel stream."""
    cfg, model, params, state, obs0, out = rollout
    _, roll, _, _ = out
    logits, value = model.apply(params, roll.obs.reshape(-1, cfg.obs_dim))
    value = value.reshape(T, B, cfg.num_agents)
    assert float(jnp.abs(value - roll.value).max()) < 1e-2

    # Recreate the gumbel chain the wrapper feeds the kernel.
    k = jax.random.PRNGKey(7)
    logits = logits.reshape(T, B * cfg.num_agents, cfg.num_actions)
    lp_all = jax.nn.log_softmax(logits, axis=-1)
    for t in range(T):
        k, ak = jax.random.split(k)
        g = jax.random.gumbel(ak, (cfg.num_actions, B * cfg.num_agents))
        act = jnp.argmax(logits[t].T + g, axis=0)
        assert bool(jnp.all(
            act.reshape(B, cfg.num_agents) == roll.action[t])), f"t={t}"
        lp = jnp.take_along_axis(
            lp_all[t], act[:, None], axis=-1)[:, 0]
        assert float(jnp.abs(
            lp.reshape(B, cfg.num_agents) - roll.log_prob[t]
        ).max()) < 1e-4, f"t={t}"


def test_boundary_reset_matches_autoreset_path(rollout):
    """reset_truncated_batch(kernel output) == step_autoreset_batch
    replaying the boundary step — draw-for-draw identical reset."""
    cfg, model, params, state, obs0, out = rollout
    new_state, roll, reset_key_last, _ = out
    reset_state, reset_obs, done = reset_truncated_batch(
        cfg, new_state, reset_key_last)
    assert bool(jnp.all(done))

    # XLA path: replay to the last step, then step_autoreset through it.
    s = state
    for t in range(T - 1):
        s, _ = step_batch(cfg, s, roll.action[t])
    s2, ts = step_autoreset_batch(cfg, s, roll.action[T - 1])
    for f in ("agent_pos", "agent_req", "carrying", "req_pickup",
              "req_drop", "req_status", "req_agent", "t", "key"):
        assert bool(jnp.all(getattr(s2, f) == getattr(reset_state, f))), f
    assert bool(jnp.all(ts.obs == reset_obs))


@pytest.mark.slow
def test_trainer_backend_equivalence():
    """make_train(rollout_backend='pallas') vs 'xla': same seed, two
    updates crossing an episode boundary — identical env states and
    near-identical metrics (logit ulps only)."""
    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=B, unroll_length=4, num_updates=2,
                       num_minibatches=2, minibatch_mode="env")
    trx = make_train_cached(cfg, base)
    trp = make_train_cached(
        cfg, base.replace(rollout_backend="pallas", pallas_block=B,
                          pallas_interpret=True))
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 1e-4, k
    assert bool(jnp.all(rsx.env_state.agent_pos == rsp.env_state.agent_pos))
    assert bool(jnp.all(rsx.env_state.t == rsp.env_state.t))


def make_train_cached(cfg, tcfg, arch="mlp"):
    from warehouse_tpu.train.ppo import make_train

    return make_train(cfg, tcfg, arch=arch)


def test_pallas_gate_raises_loudly():
    """Outside the kernel envelope the trainer must refuse, not silently
    fall back (train/ppo.py make_train gating)."""
    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=B, unroll_length=4,
                       rollout_backend="pallas", pallas_block=B)
    # (model_dtype="bfloat16" is IN-envelope since round 3: acting runs
    # f32 in-kernel, the SGD side uses bf16 matmuls.)
    for bad in (
        base.replace(unroll_length=3),     # 8 % 3 != 0
        base.replace(pallas_block=B + 8),  # B % block != 0
    ):
        with pytest.raises(ValueError, match="pallas"):
            make_train_cached(cfg, bad)
    with pytest.raises(ValueError, match="rollout_backend"):
        make_train_cached(cfg, base.replace(rollout_backend="bogus"))


@pytest.mark.slow
def test_impala_backend_equivalence():
    """IMPALA through the act kernel vs its XLA scan — same seed, two
    updates crossing an episode boundary."""
    from warehouse_tpu.train.impala import make_train_impala

    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=B, unroll_length=4, num_updates=2,
                       num_minibatches=2)
    trx = make_train_impala(cfg, base)
    trp = make_train_impala(
        cfg, base.replace(rollout_backend="pallas", pallas_block=B,
                          pallas_interpret=True))
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 1e-4, k
    assert bool(jnp.all(rsx.env_state.agent_pos == rsp.env_state.agent_pos))
    assert bool(jnp.all(rsx.env_state.t == rsp.env_state.t))


def test_rnn_kernel_matches_flax():
    """GRU act kernel: obs/dynamics bit-exact, values/carry match flax
    to f32 tolerance (pallas/act.py ppo_rnn_rollout_pallas)."""
    from warehouse_tpu.pallas.act import ppo_rnn_rollout_pallas

    cfg = small_config().replace(max_steps=T)
    key = jax.random.PRNGKey(0)
    model = make_model(cfg, arch="gru", hidden_dim=32, num_layers=2)
    carry0 = model.initial_carry((B, cfg.num_agents))
    params = model.init(key, jnp.zeros((1, cfg.obs_dim)),
                        model.initial_carry((1,)))
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    state, obs0 = jax.vmap(lambda k: engine.reset(cfg, k))(env_keys)

    new_state, roll, rk, nk, new_carry = ppo_rnn_rollout_pallas(
        cfg, params, state, carry0, T, jax.random.PRNGKey(7), B, True)
    assert bool(jnp.all(roll.obs[0] == obs0))
    s, h = state, carry0
    for t in range(T):
        logits, value, h = model.apply(params, roll.obs[t], h)
        assert float(jnp.abs(value - roll.value[t]).max()) < 1e-4
        s, ts = step_batch(cfg, s, roll.action[t])
        assert bool(jnp.all(ts.reward == roll.reward[t])), t
    assert float(jnp.abs(h - new_carry).max()) < 1e-5
    assert bool(jnp.all(s.agent_pos == new_state.agent_pos))


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["gru", "lstm"])
def test_rnn_trainer_backend_equivalence(arch):
    """make_train_rnn(rollout_backend='pallas') vs 'xla' across an
    episode boundary: same metrics, identical env states — for BOTH
    recurrent cells (the LSTM acting variant is round 4: flax
    OptimizedLSTMCell math in-kernel, (c, h) carry rows)."""
    from warehouse_tpu.train.ppo_rnn import make_train_rnn

    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=B, unroll_length=4, num_updates=2,
                       num_minibatches=2, hidden_dim=32)
    trx = make_train_rnn(cfg, base, arch=arch)
    trp = make_train_rnn(
        cfg, base.replace(rollout_backend="pallas", pallas_block=B,
                          pallas_interpret=True), arch=arch)
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 1e-4, k
    assert bool(jnp.all(rsx.env_state.agent_pos == rsp.env_state.agent_pos))


@pytest.mark.slow
def test_trainer_backend_equivalence_bootstrap():
    """bootstrap_truncated through the kernel path: the boundary boot
    value is computed outside from the pre-reset state (one row) —
    must match the XLA path's per-step final_obs bootstrapping."""
    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=B, unroll_length=4, num_updates=2,
                       num_minibatches=2, minibatch_mode="env",
                       bootstrap_truncated=True)
    trx = make_train_cached(cfg, base)
    trp = make_train_cached(
        cfg, base.replace(rollout_backend="pallas", pallas_block=B,
                          pallas_interpret=True))
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(3):   # crosses the t=8 boundary at update 2
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 1e-4, k
    assert bool(jnp.all(rsx.env_state.agent_pos == rsp.env_state.agent_pos))


@pytest.mark.slow
def test_trainer_backend_equivalence_masked():
    """In-kernel action masking + BFS-potential shaping vs the XLA
    path — same seed, same trajectories (edge cells exercise the
    bounds mask; shaping exercises the in-kernel table contraction,
    which is bit-exact because every one-hot sum selects exactly one
    element)."""
    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=B, unroll_length=4, num_updates=2,
                       num_minibatches=2, minibatch_mode="env",
                       mask_actions=True, shaping_coef=0.02)
    trx = make_train_cached(cfg, base)
    trp = make_train_cached(
        cfg, base.replace(rollout_backend="pallas", pallas_block=B,
                          pallas_interpret=True))
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 1e-4, k
    assert bool(jnp.all(rsx.env_state.agent_pos == rsp.env_state.agent_pos))


@pytest.mark.slow
def test_global_obs_kernel_bit_exact():
    """Global-view obs built in-kernel == the XLA engine's observe()
    (docs/SEMANTICS.md §10 global branch incl. the ch4 wall channel) —
    bit-exact, on a walled layout."""
    from warehouse_tpu.config import shelves_config

    cfg = shelves_config(max_steps=T, global_obs=True,
                         num_agents=3, queue_capacity=6,
                         init_requests=3)
    key = jax.random.PRNGKey(3)
    model = make_model(cfg)
    params = model.init(key, jnp.zeros((1, cfg.obs_dim), jnp.float32))
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(32))
    state, obs0 = jax.vmap(lambda k: engine.reset(cfg, k))(env_keys)
    _, roll, _, _ = ppo_rollout_pallas(
        cfg, params, state, T, jax.random.PRNGKey(9), block=32,
        interpret=True)
    assert bool(jnp.all(roll.obs[0] == obs0))
    s = state
    for t in range(T - 1):
        s, ts = step_batch(cfg, s, roll.action[t])
        assert bool(jnp.all(ts.obs == roll.obs[t + 1])), f"t={t}"


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["global_obs", "policy_groups",
                                     "global_groups_mask"])
def test_trainer_backend_equivalence_widened_envelope(variant):
    """The round-3 envelope: global_obs and policy_groups through the
    act kernel match the XLA trainer (mirrors
    test_trainer_backend_equivalence)."""
    from warehouse_tpu.train.ppo import make_train

    Bv = 16
    cfgkw = {}
    mtkw = {}
    mask = False
    if variant in ("global_obs", "global_groups_mask"):
        cfgkw["global_obs"] = True
    if variant in ("policy_groups", "global_groups_mask"):
        mtkw["policy_groups"] = (0, 1)
    if variant == "global_groups_mask":
        mask = True
    cfg = small_config(max_steps=8, **cfgkw)
    base = TrainConfig(num_envs=Bv, unroll_length=4, num_minibatches=2,
                       ppo_epochs=2, hidden_dim=16, mask_actions=mask)
    trx = make_train(cfg, base, **mtkw)
    trp = make_train(cfg, base.replace(rollout_backend="pallas",
                                       pallas_block=Bv,
                                       pallas_interpret=True), **mtkw)
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < (
                2e-4 + 1e-3 * abs(float(mx[k]))), (variant, k)
    assert bool(jnp.all(
        rsx.env_state.agent_pos == rsp.env_state.agent_pos))
    assert bool(jnp.all(rsx.env_state.t == rsp.env_state.t))


@pytest.mark.slow
def test_rnn_pallas_with_bf16_replay_trains():
    """The recurrent fast config: f32 GRU act kernel + bf16 sequence
    replay (model_dtype='bfloat16' is in-envelope for the rnn kernel;
    the carry dtype round-trips through the f32 kernel). Finite
    metrics, params move."""
    import numpy as np

    from warehouse_tpu.train.ppo_rnn import make_train_rnn

    cfg = small_config(max_steps=8)
    trainer = make_train_rnn(
        cfg,
        TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                    ppo_epochs=2, hidden_dim=16,
                    rollout_backend="pallas", pallas_block=16,
                    model_dtype="bfloat16", pallas_interpret=True),
        arch="gru")
    rs = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.leaves(rs.params)[0].copy()
    for _ in range(2):
        rs, m = trainer.train_step(rs)
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    assert int(rs.update_idx) == 2
    assert not np.array_equal(
        np.asarray(p0), np.asarray(jax.tree.leaves(rs.params)[0]))


def test_cnn_unrolled_conv_matches_model():
    """extract_cnn_weights: the unrolled [S²*OC, S²*IC] conv matrices +
    layer loop must reproduce ActorCriticCNN.apply (conv accumulation
    order aside) — the kernel-level proof for the CNN acting path."""
    import numpy as np

    from warehouse_tpu.config import small_config
    from warehouse_tpu.models import make_model
    from warehouse_tpu.pallas.act import extract_cnn_weights

    cfg = small_config()
    model = make_model(cfg, arch="cnn", hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.obs_dim), jnp.float32))
    rng = np.random.default_rng(1)
    obs = jnp.asarray(
        rng.normal(size=(64, cfg.obs_dim)).astype(np.float32))
    ref_logits, ref_value = model.apply(params, obs)

    wbs, (wh, bh), n_relu, grid_rows = extract_cnn_weights(params, cfg)
    x = obs.T                                    # [D, N]
    h = x[:grid_rows, :]
    for li, (w, b) in enumerate(wbs):
        z = w @ h + b
        h = jnp.maximum(z, 0.0) if li < n_relu else jnp.tanh(z)
        if li == n_relu - 1:
            h = jnp.concatenate([h, x[grid_rows:, :]], axis=0)
    out = wh @ h + bh
    np.testing.assert_allclose(np.asarray(out[:5].T),
                               np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[5]),
                               np.asarray(ref_value),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_trainer_backend_equivalence_cnn():
    """rollout_backend='pallas' with arch='cnn' (round 4: convs as
    unrolled in-kernel matmuls) vs the XLA scan — identical env
    states, metrics to logit-ulp tolerance."""
    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=B, unroll_length=4, num_updates=2,
                       num_minibatches=2, minibatch_mode="env",
                       hidden_dim=32)
    trx = make_train_cached(cfg, base, arch="cnn")
    trp = make_train_cached(
        cfg, base.replace(rollout_backend="pallas", pallas_block=B,
                          pallas_interpret=True), arch="cnn")
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 3e-4, k
    assert bool(jnp.all(rsx.env_state.agent_pos == rsp.env_state.agent_pos))
    assert bool(jnp.all(rsx.env_state.t == rsp.env_state.t))


def test_cnn_global_large_grid_gate():
    """Round-4 code-review regression: global-obs CNN on a large grid
    unrolls conv matrices past the act kernel's VMEM budget — the
    explicit gate must refuse (named) and auto must fall back, never
    crash in Mosaic allocation."""
    from warehouse_tpu.config import large_config
    from warehouse_tpu.train.ppo import make_train

    cfg = large_config(global_obs=True, max_steps=8)
    base = TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                       hidden_dim=32)
    with pytest.raises(ValueError, match="VMEM"):
        make_train(cfg, base.replace(rollout_backend="pallas",
                                     pallas_block=16), arch="cnn")
    tr = make_train(cfg, base, arch="cnn")      # auto -> xla, no raise
    assert tr.backends["rollout"] == "xla"
    # Ego-window CNN on the same grid stays in-envelope (tiny unroll).
    tr2 = make_train(large_config(max_steps=8),
                     base.replace(rollout_backend="pallas",
                                  pallas_block=16,
                                  pallas_interpret=True), arch="cnn")
    assert tr2.backends["rollout"] == "pallas"
