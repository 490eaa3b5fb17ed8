"""Fused IMPALA V-trace learner kernel (pallas/vtrace_sgd.py) vs the
XLA scaffold — interpret mode on the CPU backend.

1. Kernel-level: ``impala_sgd_phase_pallas`` (whole passes x
   minibatches phase with in-kernel V-trace + clip + RMSProp/Adam)
   against the exact train/impala.py learner cadence rebuilt with
   optax; ``impala_minibatch_grads_pallas`` against
   ``jax.value_and_grad`` through the V-trace loss.
2. Trainer-level equivalence lives in tests/test_impala.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from warehouse_tpu.models.policy import ActorCriticMLP
from warehouse_tpu.ops.ppo_update import action_log_prob_entropy
from warehouse_tpu.ops.vtrace import vtrace
from warehouse_tpu.pallas.act import _pad8
from warehouse_tpu.pallas.sgd import find_adam_state
from warehouse_tpu.pallas.vtrace_sgd import (
    find_rms_state,
    impala_minibatch_grads_pallas,
    impala_sgd_phase_pallas,
    pack_impala_fields,
    pack_last_obs,
)

T, B, A, D = 4, 16, 2, 26
H = 16
PASSES, M = 2, 2
GAMMA, RHO, CC = 0.99, 1.0, 1.0
VCOEF, ENT, MAXNORM = 0.5, 0.01, 0.5
Dp = _pad8(D)
TA = T * A
mbB = B // M
NEG_INF = -1e9


def _setup(mask_on: bool, use_rms: bool, seed: int = 0):
    rng = np.random.default_rng(seed)
    obs = jnp.asarray(rng.normal(size=(T, B, A, D)).astype(np.float32))
    last_obs = jnp.asarray(
        rng.normal(size=(B, A, D)).astype(np.float32))
    action = jnp.asarray(
        rng.integers(0, 5, size=(T, B, A)).astype(np.int32))
    b_lp = jnp.asarray(
        (-1.6 + 0.1 * rng.normal(size=(T, B, A))).astype(np.float32))
    reward = jnp.asarray(
        rng.normal(size=(T, B, A)).astype(np.float32))
    done = jnp.zeros((T, B, A), bool).at[-1].set(True)
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
    tx = optax.chain(
        optax.clip_by_global_norm(MAXNORM),
        optax.rmsprop(sched, decay=0.99, eps=0.1) if use_rms
        else optax.adam(sched, eps=1e-5))
    opt_state = tx.init(params)
    data = (obs, action, b_lp, reward, done, mask)
    return model, params, tx, sched, opt_state, data, last_obs


def _loss_fn_for(model, mask_on):
    """train/impala.py loss_fn rebuilt verbatim."""
    def loss_fn(params, mb, last_obs_mb):
        obs, action, b_lp, reward, done, mask = mb
        Tm, Bm = reward.shape[0], reward.shape[1]
        obs_flat = obs.reshape(Tm * Bm * A, -1)
        logits, value = model.apply(params, obs_flat)
        logits = logits.reshape(Tm, Bm, A, -1)
        value = value.reshape(Tm, Bm, A)
        if mask_on:
            logits = jnp.where(mask, logits, NEG_INF)
        lp, entropy = action_log_prob_entropy(logits, action)
        _, last_value = model.apply(params, last_obs_mb.reshape(Bm * A, -1))
        last_value = last_value.reshape(Bm, A)
        vs, pg_adv = vtrace(b_lp, lp, reward, value, done, last_value,
                            GAMMA, rho_clip=RHO, c_clip=CC)
        pg_loss = -(lp * pg_adv).mean()
        v_loss = 0.5 * ((value - vs) ** 2).mean()
        total = pg_loss + VCOEF * v_loss - ENT * entropy
        return total, (pg_loss, v_loss, entropy)

    return loss_fn


def _env_minibatches(data, last_obs):
    mbs = jax.tree.map(
        lambda x: jnp.moveaxis(
            x.reshape(x.shape[0], M, mbB, *x.shape[2:]), 1, 0),
        data)
    last_mbs = last_obs.reshape(M, mbB, *last_obs.shape[1:])
    return mbs, last_mbs


def _kernel_inputs(data, last_obs):
    obs, action, b_lp, reward, done, mask = data
    obs_bm = jnp.pad(
        obs.transpose(0, 2, 3, 1),
        ((0, 0), (0, 0), (0, Dp - D), (0, 0))).reshape(TA * Dp, B)
    fields = pack_impala_fields(action, b_lp, reward, done, mask, 5)
    lrows = pack_last_obs(last_obs, D)
    return obs_bm, fields, lrows


@pytest.mark.parametrize("mask_on,use_rms", [
    (True, True),
    pytest.param(False, True, marks=pytest.mark.slow),
    (True, False),
])
def test_impala_phase_kernel_matches_xla_scaffold(mask_on, use_rms):
    (model, params, tx, sched, opt_state, data, last_obs) = _setup(
        mask_on, use_rms)
    mbs, last_mbs = _env_minibatches(data, last_obs)
    loss_fn = _loss_fn_for(model, mask_on)

    # XLA scaffold: train/impala.py cadence — passes x minibatch scan.
    p_ref, opt_ref = params, opt_state
    losses_ref = []
    for _pass in range(PASSES):
        for m in range(M):
            mb = jax.tree.map(lambda x: x[m], mbs)
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p_ref, mb, last_mbs[m])
            updates, opt_ref = tx.update(grads, opt_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, updates)
            losses_ref.append((loss, *aux))

    obs_bm, fields, lrows = _kernel_inputs(data, last_obs)
    n_steps = PASSES * M
    steps = jnp.arange(n_steps)
    lr_row = jax.vmap(sched)(steps).astype(jnp.float32)
    cnt = (steps + 1).astype(jnp.float32)
    p_new, opt_new, losses = impala_sgd_phase_pallas(
        params, opt_state, obs_bm, fields, lrows,
        lr_row, 1.0 - 0.9 ** cnt, 1.0 - 0.999 ** cnt, ENT,
        num_passes=PASSES, num_minibatches=M, unroll_length=T,
        num_agents=A, gamma=GAMMA, rho_clip=RHO, c_clip=CC,
        value_coef=VCOEF, max_grad_norm=MAXNORM, mask_actions=mask_on,
        obs_dim=D, use_rms=use_rms, block_envs=8,
        eps=0.1 if use_rms else 1e-5, interpret=True)

    flat = [jnp.stack([r[i] for r in losses_ref]).reshape(PASSES, M)
            for i in range(4)]
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(losses[i]), np.asarray(flat[i]),
            rtol=1e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    if use_rms:
        nu_a = find_rms_state(opt_new)
        nu_b = find_rms_state(opt_ref)
    else:
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
def test_impala_minibatch_grads_matches_jax_grad(mask_on):
    (model, params, _tx, _s, _o, data, last_obs) = _setup(
        mask_on, True, seed=3)
    mbs, last_mbs = _env_minibatches(data, last_obs)
    loss_fn = _loss_fn_for(model, mask_on)
    obs_bm, fields, lrows = _kernel_inputs(data, last_obs)

    for m in range(M):
        mb = jax.tree.map(lambda x: x[m], mbs)
        (l_ref, aux_ref), g_ref = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb, last_mbs[m])
        (l_k, aux_k), g_k = impala_minibatch_grads_pallas(
            params, obs_bm, fields, lrows, m, ENT,
            num_minibatches=M, unroll_length=T, num_agents=A,
            gamma=GAMMA, rho_clip=RHO, c_clip=CC, value_coef=VCOEF,
            mask_actions=mask_on, obs_dim=D, block_envs=8,
            interpret=True)
        assert abs(float(l_k) - float(l_ref)) < 1e-6
        for ra, ka in zip(aux_ref, aux_k):
            assert abs(float(ra) - float(ka)) < 1e-6
        for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
