"""Fused CNN SGD-phase kernel (pallas/sgd_cnn.py) vs the XLA scaffold.

Interpret mode on the CPU backend; same three layers of proof as
tests/test_grad_kernel.py (the MLP kernel): kernel-level phase +
per-minibatch grads against ``minibatch_epochs``/``jax.value_and_grad``
through the flax CNN (true convolutions — so these tests also prove
the unrolled-dense formulation + conv-basis grad fold equals the conv
backward), trainer-level backend equivalence, and the envelope gates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from warehouse_tpu.config import TrainConfig, small_config
from warehouse_tpu.models import make_model
from warehouse_tpu.ops.ppo_update import (
    NEG_INF,
    minibatch_epochs,
    ppo_losses,
)
from warehouse_tpu.pallas.act import _pad8
from warehouse_tpu.pallas.sgd import FIELD_ROWS, find_adam_state
from warehouse_tpu.pallas.sgd_cnn import (
    flat_cnn_tensors,
    ppo_cnn_minibatch_grads_pallas,
    ppo_cnn_sgd_phase_pallas,
    unflat_cnn_tensors,
)

CFG = small_config()
T, B, A = 4, 16, 2
D = CFG.obs_dim
H = 16
E, M = 2, 2
CLIP, VCOEF, MAXNORM = 0.2, 0.5, 0.5
ENT, KL = 0.01, 0.05
Dp = _pad8(D)
TA = T * A
mbB = B // M
TCFG = TrainConfig(num_envs=B, unroll_length=T, num_minibatches=M,
                   ppo_epochs=E, hidden_dim=H)


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

    model = make_model(CFG, arch="cnn", hidden_dim=H)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, D), jnp.float32))
    sched = optax.linear_schedule(3e-4, 0.0, 100)
    tx = optax.chain(optax.clip_by_global_norm(MAXNORM),
                     optax.adam(sched, eps=1e-5))
    opt_state = tx.init(params)

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


def test_flat_unflat_roundtrip():
    """Packed conv layout <-> flax tree is an exact bijection."""
    model = make_model(CFG, arch="cnn", hidden_dim=H)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, D), jnp.float32))
    back = unflat_cnn_tensors(flat_cnn_tensors(params), params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mask_on", [False, True])
def test_cnn_minibatch_grads_kernel_matches_jax_grad(mask_on):
    """The unrolled-dense conv backward + conv-basis fold equals
    jax.value_and_grad through flax's TRUE convolutions."""
    (model, params, _tx, _sched, _opt, data) = _setup(mask_on, seed=3)
    mbs = _envmajor_minibatches(data)
    loss_fn = _loss_fn_for(model, mask_on)
    obs_bm, fields = _kernel_inputs(data)

    for mb_idx in range(M):
        mb = jax.tree.map(lambda x: x[mb_idx], mbs)
        (l_ref, aux_ref), g_ref = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb)
        (l_k, aux_k), g_k = ppo_cnn_minibatch_grads_pallas(
            params, obs_bm, fields, mb_idx, ENT, KL,
            env_cfg=CFG, tcfg=TCFG,
            num_minibatches=M, clip_eps=CLIP, value_coef=VCOEF,
            mask_actions=mask_on, obs_dim=D, block_envs=8,
            interpret=True)
        assert abs(float(l_k) - float(l_ref)) < 1e-6
        for ra, ka in zip(aux_ref, aux_k):
            assert abs(float(ra) - float(ka)) < 1e-6
        for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


def test_cnn_sgd_phase_kernel_matches_xla_scaffold():
    """Whole fused phase (in-kernel fold + clip + Adam + unrolled
    rebuild) vs minibatch_epochs + optax through the flax CNN."""
    (model, params, tx, sched, opt_state, data) = _setup(True)
    mbs = _envmajor_minibatches(data)
    loss_fn = _loss_fn_for(model, True)

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
    p_new, opt_new, losses = ppo_cnn_sgd_phase_pallas(
        params, opt_state, obs_bm, fields,
        lr_row, 1.0 - 0.9 ** cnt, 1.0 - 0.999 ** cnt, ENT, KL,
        env_cfg=CFG, tcfg=TCFG,
        num_epochs=E, num_minibatches=M, clip_eps=CLIP,
        value_coef=VCOEF, max_grad_norm=MAXNORM, mask_actions=True,
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


@pytest.mark.slow
def test_trainer_grad_backend_equivalence_cnn_sgd():
    """arch='cnn' + grad_backend='pallas' vs 'xla' (both on the fused
    act rollout): identical env streams, params/metrics to tolerance —
    the trainer-level proof for the fused CNN learner."""
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    base = TrainConfig(num_envs=16, unroll_length=4, num_updates=3,
                       num_minibatches=2, ppo_epochs=2, hidden_dim=16,
                       mask_actions=True, kl_coeff=0.1,
                       rollout_backend="pallas", pallas_block=16,
                       pallas_interpret=True)
    trx = make_train(cfg, base, arch="cnn")
    trp = make_train(cfg, base.replace(grad_backend="pallas"),
                     arch="cnn")
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
    for a, b in zip(jax.tree.leaves(rsx.params),
                    jax.tree.leaves(rsp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-5)


def test_cnn_grad_gate_policy_groups():
    """policy_groups with arch='cnn' is outside the fused CNN
    learner's envelope — explicit pallas raises, auto falls back."""
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    base = TrainConfig(num_envs=16, unroll_length=4, num_minibatches=2,
                       grad_backend="pallas", pallas_interpret=True)
    with pytest.raises(ValueError, match="policy_groups"):
        make_train(cfg, base, policy_groups=(0, 1), arch="cnn")
