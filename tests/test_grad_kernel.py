"""Fused SGD-phase kernel (pallas/sgd.py) vs the XLA scaffold.

Interpret mode on the CPU backend. Three layers of proof:

1. Kernel-level: ``ppo_sgd_phase_pallas`` (the whole epoch/minibatch
   phase with in-kernel clip+Adam) against ``minibatch_epochs`` +
   ``optax`` on identical contiguous-env minibatches — params, Adam
   moments, counts, and per-step losses to f32 accumulation tolerance;
   ``ppo_minibatch_grads_pallas`` against ``jax.value_and_grad``.
2. Trainer-level: ``make_train(grad_backend='pallas')`` vs ``'xla'``
   from the same seed — the two SGD backends ride identical draw
   streams (same pre-rollout env-state permutation), so env states
   must be BIT-equal and params/metrics equal to tolerance.
3. Gates: the fused kernel's envelope fails loudly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from warehouse_tpu.config import TrainConfig, small_config
from warehouse_tpu.models.policy import ActorCriticMLP
from warehouse_tpu.ops.ppo_update import (
    NEG_INF,
    minibatch_epochs,
    ppo_losses,
)
from warehouse_tpu.pallas.act import _pad8
from warehouse_tpu.pallas.sgd import (
    FIELD_ROWS,
    find_adam_state,
    ppo_minibatch_grads_pallas,
    ppo_sgd_phase_pallas,
)

T, B, A, D = 4, 16, 2, 26
H = 16
E, M = 2, 2
CLIP, VCOEF, MAXNORM = 0.2, 0.5, 0.5
ENT, KL = 0.01, 0.05
Dp = _pad8(D)
TA = T * A
mbB = B // M


def _setup(mask_on: bool, seed: int = 0):
    rng = np.random.default_rng(seed)
    obs = jnp.asarray(rng.normal(size=(T, B, A, D)).astype(np.float32))
    action = jnp.asarray(
        rng.integers(0, 5, size=(T, B, A)).astype(np.int32))
    old_lp = jnp.asarray(
        (-1.6 + 0.1 * rng.normal(size=(T, B, A))).astype(np.float32))
    old_v = jnp.asarray(rng.normal(size=(T, B, A)).astype(np.float32))
    adv = jnp.asarray(rng.normal(size=(T, B, A)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(T, B, A)).astype(np.float32))
    mask_np = rng.random(size=(T, B, A, 5)) > 0.3
    mask_np[..., 0] = True
    mask_np[np.arange(T)[:, None, None], np.arange(B)[None, :, None],
            np.arange(A)[None, None, :], np.asarray(action)] = True
    mask = jnp.asarray(mask_np) if mask_on else jnp.ones(
        (T, B, A, 5), bool)

    model = ActorCriticMLP(num_actions=5, hidden_dims=(H, H))
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, D), jnp.float32))
    sched = optax.linear_schedule(3e-4, 0.0, 100)
    tx = optax.chain(optax.clip_by_global_norm(MAXNORM),
                     optax.adam(sched, eps=1e-5))
    opt_state = tx.init(params)

    # Advantages normalized per contiguous-env minibatch.
    adv_g = adv.reshape(T, M, mbB, A)
    mean = adv_g.mean(axis=(0, 2, 3), keepdims=True)
    std = adv_g.std(axis=(0, 2, 3), keepdims=True)
    adv_n = ((adv_g - mean) / (std + 1e-8)).reshape(T, B, A)
    data = (obs, action, old_lp, old_v, adv_n, tgt, mask)
    return model, params, tx, sched, opt_state, data


def _envmajor_minibatches(data):
    def envmajor(x):
        x = jnp.moveaxis(x, 1, 0)
        return x.reshape(B, TA, *x.shape[3:])

    batch = tuple(envmajor(x) for x in data)
    return jax.tree.map(
        lambda x: x.reshape(M, mbB * TA, *x.shape[2:]), batch)


def _kernel_inputs(data):
    obs, action, old_lp, old_v, adv_n, tgt, mask = data
    obs_bm = jnp.pad(
        obs.transpose(0, 2, 3, 1),
        ((0, 0), (0, 0), (0, Dp - D), (0, 0))).reshape(TA * Dp, B)

    def row_ta(x):
        return x.transpose(0, 2, 1).reshape(TA, B)

    frows = [row_ta(action.astype(jnp.float32)), row_ta(old_lp),
             row_ta(old_v), row_ta(adv_n), row_ta(tgt)]
    for r in range(5):
        frows.append(row_ta(mask[..., r].astype(jnp.float32)))
    frows += [jnp.zeros((TA, B), jnp.float32)] * (
        FIELD_ROWS - len(frows))
    fields = jnp.stack(frows, axis=1).reshape(TA * FIELD_ROWS, B)
    return obs_bm, fields


def _loss_fn_for(model, mask_on):
    def loss_fn(p, mb):
        o, a, olp, ov, ad, tg, mk = mb
        logits, value = model.apply(p, o)
        if mask_on:
            logits = jnp.where(mk, logits, NEG_INF)
        return ppo_losses(logits, value, a, olp, ov, ad, tg,
                          clip_eps=CLIP, value_coef=VCOEF,
                          ent_coef=ENT, kl_coeff=KL,
                          normalize_adv=False)

    return loss_fn


@pytest.mark.parametrize("mask_on", [False, True])
def test_sgd_phase_kernel_matches_xla_scaffold(mask_on):
    (model, params, tx, sched, opt_state, data) = _setup(mask_on)
    mbs = _envmajor_minibatches(data)
    loss_fn = _loss_fn_for(model, mask_on)

    p_ref, opt_ref, _, losses_ref = minibatch_epochs(
        params, opt_state, jax.random.PRNGKey(2),
        loss_fn=loss_fn, make_minibatches=lambda _k: mbs,
        num_epochs=E, tx=tx, reshuffle_each_epoch=False)

    obs_bm, fields = _kernel_inputs(data)
    n_steps = E * M
    count0, _, _ = find_adam_state(opt_state)
    steps = count0 + jnp.arange(n_steps)
    lr_row = jax.vmap(sched)(steps).astype(jnp.float32)
    cnt = (steps + 1).astype(jnp.float32)
    p_new, opt_new, losses = ppo_sgd_phase_pallas(
        params, opt_state, obs_bm, fields,
        lr_row, 1.0 - 0.9 ** cnt, 1.0 - 0.999 ** cnt, ENT, KL,
        num_epochs=E, num_minibatches=M, clip_eps=CLIP,
        value_coef=VCOEF, max_grad_norm=MAXNORM, mask_actions=mask_on,
        obs_dim=D, block_envs=8, rows_per_block=4, interpret=True)

    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(losses[i]), np.asarray(losses_ref[i]),
            rtol=1e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    ca, mu_a, nu_a = find_adam_state(opt_new)
    cb, mu_b, nu_b = find_adam_state(opt_ref)
    assert int(ca) == int(cb) == n_steps
    for a, b in zip(jax.tree.leaves(mu_a), jax.tree.leaves(mu_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(nu_a), jax.tree.leaves(nu_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-10)


@pytest.mark.parametrize("mask_on", [False, True])
def test_minibatch_grads_kernel_matches_jax_grad(mask_on):
    (model, params, _tx, _sched, _opt, data) = _setup(mask_on, seed=3)
    mbs = _envmajor_minibatches(data)
    loss_fn = _loss_fn_for(model, mask_on)
    obs_bm, fields = _kernel_inputs(data)

    for mb_idx in range(M):
        mb = jax.tree.map(lambda x: x[mb_idx], mbs)
        (l_ref, aux_ref), g_ref = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb)
        (l_k, aux_k), g_k = ppo_minibatch_grads_pallas(
            params, obs_bm, fields, mb_idx, ENT, KL,
            num_minibatches=M, clip_eps=CLIP, value_coef=VCOEF,
            mask_actions=mask_on, obs_dim=D, block_envs=8,
            interpret=True)
        assert abs(float(l_k) - float(l_ref)) < 1e-6
        for ra, ka in zip(aux_ref, aux_k):
            assert abs(float(ra) - float(ka)) < 1e-6
        for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-7)


@pytest.mark.slow
@pytest.mark.parametrize("mask_on", [False, True])
def test_trainer_grad_backend_equivalence(mask_on):
    """grad_backend='pallas' vs 'xla', same seed: identical draw
    streams (same pre-rollout env permutation + mirrored key split) →
    env states BIT-equal, metrics/params to f32 tolerance. Exercises a
    traced entropy anneal + adaptive KL through the kernel's scalars."""
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    base = TrainConfig(num_envs=16, unroll_length=4, num_updates=3,
                       num_minibatches=2, ppo_epochs=2, hidden_dim=16,
                       mask_actions=mask_on, kl_coeff=0.1,
                       entropy_coef_final=0.001)
    trx = make_train(cfg, base)
    trp = make_train(cfg, base.replace(grad_backend="pallas",
                                       pallas_interpret=True))
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
def test_fused_act_and_sgd_kernels_train():
    """rollout_backend='pallas' + grad_backend='pallas' (the fully
    fused trained path) runs end-to-end in interpret mode: finite
    metrics, params move, update counter advances."""
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    trainer = make_train(
        cfg,
        TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                    ppo_epochs=2, hidden_dim=16, mask_actions=True,
                    rollout_backend="pallas", grad_backend="pallas",
                    pallas_block=8, pallas_interpret=True))
    rs = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree.leaves(rs.params)[0].copy()
    for _ in range(2):
        rs, m = trainer.train_step(rs)
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"
    assert int(rs.update_idx) == 2
    assert not np.array_equal(
        np.asarray(p0), np.asarray(jax.tree.leaves(rs.params)[0]))


def test_grad_backend_gate_raises():
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    base = TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                       grad_backend="pallas")
    with pytest.raises(ValueError, match="epoch_shuffle"):
        make_train(cfg, base.replace(epoch_shuffle="each"))
    with pytest.raises(ValueError, match="minibatch_mode"):
        make_train(cfg, base.replace(minibatch_mode="flat"))
    with pytest.raises(ValueError, match="micro_batches"):
        make_train(cfg, base.replace(micro_batches=2))
    with pytest.raises(ValueError, match="flat_optimizer"):
        make_train(cfg, base.replace(flat_optimizer=True))
    # arch='cnn' is IN-envelope since round 5 (pallas/sgd_cnn.py);
    # attn remains outside the fused learners.
    with pytest.raises(ValueError, match="arch"):
        make_train(cfg, base, arch="attn")
    with pytest.raises(ValueError, match="grad_backend"):
        TrainConfig(grad_backend="bogus")


@pytest.mark.slow
def test_trainer_grad_backend_equivalence_policy_groups():
    """policy_groups inside the fused SGD kernel (round 4): pallas vs
    xla SGD backends from the same seed with a 2-group policy mapping —
    env states BIT-equal, per-group params to f32 tolerance. The
    trace-time group routing (slot % A) must reproduce the XLA
    MultiPolicyActorCritic one-hot select exactly."""
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    base = TrainConfig(num_envs=16, unroll_length=4, num_updates=3,
                       num_minibatches=2, ppo_epochs=2, hidden_dim=16,
                       mask_actions=True, kl_coeff=0.1)
    groups = (0, 1)  # small_config has 2 agents
    trx = make_train(cfg, base, policy_groups=groups)
    trp = make_train(cfg, base.replace(grad_backend="pallas",
                                       pallas_interpret=True),
                     policy_groups=groups)
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
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(rsx.params),
            jax.tree_util.tree_leaves_with_path(rsp.params)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-5,
                                   err_msg=str(pa))
    # The two groups actually trained apart (different data per agent).
    l0 = jax.tree.leaves({"p": rsp.params["params"]["policies_0"]})
    l1 = jax.tree.leaves({"p": rsp.params["params"]["policies_1"]})
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(l0, l1))
