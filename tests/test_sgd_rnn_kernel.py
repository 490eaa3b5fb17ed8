"""Fused recurrent sequence-replay SGD kernel (pallas/sgd_rnn.py) vs
the XLA scaffold.

Interpret mode on the CPU backend. Mirrors tests/test_grad_kernel.py:

1. Kernel-level: ``ppo_rnn_sgd_phase_pallas`` (the whole epoch/minibatch
   phase with in-kernel BPTT + clip+Adam) against the XLA sequence
   replay (``minibatch_epochs`` + the same lax.scan loss the trainer
   uses) on identical contiguous-env minibatches;
   ``ppo_rnn_minibatch_grads_pallas`` against ``jax.value_and_grad``
   through the scan.
2. Trainer-level equivalence lives in tests/test_ppo_rnn.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from warehouse_tpu.models.policy import ActorCriticRNN
from warehouse_tpu.ops.ppo_update import (
    NEG_INF,
    minibatch_epochs,
    ppo_losses,
)
from warehouse_tpu.pallas.act import _pad8
from warehouse_tpu.pallas.sgd import FIELD_ROWS, find_adam_state
from warehouse_tpu.pallas.sgd_rnn import (
    ppo_rnn_minibatch_grads_pallas,
    ppo_rnn_sgd_phase_pallas,
)

T, B, A, D = 4, 16, 2, 26
H = 16
E, M = 2, 2
CLIP, VCOEF, MAXNORM = 0.2, 0.5, 0.5
ENT, KL = 0.01, 0.05
Dp = _pad8(D)
TA = T * A
mbB = B // M


def _setup(mask_on: bool, n_enc: int = 1, seed: int = 0,
           cell: str = "gru"):
    rng = np.random.default_rng(seed)
    obs = jnp.asarray(rng.normal(size=(T, B, A, D)).astype(np.float32))
    h0 = jnp.asarray(
        (0.5 * rng.normal(size=(B, A, H))).astype(np.float32))
    if cell == "lstm":
        c0 = jnp.asarray(
            (0.5 * rng.normal(size=(B, A, H))).astype(np.float32))
        h0 = (c0, h0)
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
    # Truncation only on the chunk's LAST step (the trainer envelope):
    # the XLA replay's in-scan carry zeroing there has no consumer, so
    # the kernel (which ignores done) must match exactly.
    done = jnp.zeros((T, B, A), bool).at[-1].set(True)

    model = ActorCriticRNN(num_actions=5, cell_type=cell,
                           hidden_dims=(H,) * n_enc, rnn_hidden=H)
    zcar = (jnp.zeros((1, H), jnp.float32) if cell == "gru"
            else (jnp.zeros((1, H), jnp.float32),
                  jnp.zeros((1, H), jnp.float32)))
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, D), jnp.float32), zcar)
    sched = optax.linear_schedule(3e-4, 0.0, 100)
    tx = optax.chain(optax.clip_by_global_norm(MAXNORM),
                     optax.adam(sched, eps=1e-5))
    opt_state = tx.init(params)

    # Advantages normalized per contiguous-env minibatch.
    adv_g = adv.reshape(T, M, mbB, A)
    mean = adv_g.mean(axis=(0, 2, 3), keepdims=True)
    std = adv_g.std(axis=(0, 2, 3), keepdims=True)
    adv_n = ((adv_g - mean) / (std + 1e-8)).reshape(T, B, A)
    data = (obs, action, old_lp, old_v, adv_n, tgt, mask, done)
    return model, params, tx, sched, opt_state, data, h0


def _seq_minibatches(data, h0):
    """Env-axis sequence minibatches ((seq...), h0) like the trainer."""
    def split_seq(x):        # [T, B, ...] -> [M, T, B/M, ...]
        sh = x.reshape(x.shape[0], M, mbB, *x.shape[2:])
        return jnp.moveaxis(sh, 1, 0)

    def split_h0(x):         # [B, ...] -> [M, B/M, ...]
        return x.reshape(M, mbB, *x.shape[1:])

    return (jax.tree.map(split_seq, data),
            jax.tree.map(split_h0, h0))


def _kernel_inputs(data, h0):
    obs, action, old_lp, old_v, adv_n, tgt, mask, _done = data
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

    def crow(x):
        return x.transpose(1, 2, 0).reshape(A * H, B)

    if isinstance(h0, tuple):                 # LSTM: c rows, h rows
        h0_rows = jnp.concatenate([crow(h0[0]), crow(h0[1])], axis=0)
    else:
        h0_rows = crow(h0)
    return obs_bm, fields, h0_rows


def _loss_fn_for(model, mask_on):
    """The trainer's sequence-replay loss (train/ppo_rnn.py loss_fn)."""
    def loss_fn(p, mb):
        (obs, action, old_lp, old_v, adv, tgt, mask, done), h_init = mb

        def cell_step(h, xs):
            obs_t, mask_t, done_t = xs
            logits, value, h_new = model.apply(p, obs_t, h)
            if mask_on:
                logits = jnp.where(mask_t, logits, NEG_INF)
            h_new = jax.tree.map(
                lambda x: jnp.where(done_t[..., None], 0.0, x), h_new)
            return h_new, (logits, value)

        _, (logits, value) = jax.lax.scan(
            cell_step, h_init, (obs, mask, done))
        return ppo_losses(logits, value, action, old_lp, old_v, adv,
                          tgt, clip_eps=CLIP, value_coef=VCOEF,
                          ent_coef=ENT, kl_coeff=KL,
                          normalize_adv=False)

    return loss_fn


@pytest.mark.parametrize("mask_on,n_enc,cell", [
    (True, 1, "gru"),
    pytest.param(False, 1, "gru", marks=pytest.mark.slow),
    pytest.param(False, 2, "gru", marks=pytest.mark.slow),
    (False, 1, "lstm"),
    pytest.param(True, 2, "lstm", marks=pytest.mark.slow),
])
def test_rnn_sgd_phase_kernel_matches_xla_scaffold(mask_on, n_enc,
                                                   cell):
    (model, params, tx, sched, opt_state, data, h0) = _setup(
        mask_on, n_enc, cell=cell)
    mbs = _seq_minibatches(data, h0)
    loss_fn = _loss_fn_for(model, mask_on)

    p_ref, opt_ref, _, losses_ref = minibatch_epochs(
        params, opt_state, jax.random.PRNGKey(2),
        loss_fn=loss_fn, make_minibatches=lambda _k: mbs,
        num_epochs=E, tx=tx, reshuffle_each_epoch=False)

    obs_bm, fields, h0_rows = _kernel_inputs(data, h0)
    n_steps = E * M
    count0, _, _ = find_adam_state(opt_state)
    steps = count0 + jnp.arange(n_steps)
    lr_row = jax.vmap(sched)(steps).astype(jnp.float32)
    cnt = (steps + 1).astype(jnp.float32)
    p_new, opt_new, losses = ppo_rnn_sgd_phase_pallas(
        params, opt_state, obs_bm, fields, h0_rows,
        lr_row, 1.0 - 0.9 ** cnt, 1.0 - 0.999 ** cnt, ENT, KL,
        num_epochs=E, num_minibatches=M, unroll_length=T,
        num_agents=A, clip_eps=CLIP, value_coef=VCOEF,
        max_grad_norm=MAXNORM, mask_actions=mask_on, obs_dim=D,
        block_envs=8, interpret=True)

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


@pytest.mark.parametrize("mask_on,cell", [
    (True, "gru"),
    pytest.param(False, "gru", marks=pytest.mark.slow),
    (True, "lstm"),
])
def test_rnn_minibatch_grads_kernel_matches_jax_grad(mask_on, cell):
    (model, params, _tx, _sched, _opt, data, h0) = _setup(
        mask_on, seed=3, cell=cell)
    mbs = _seq_minibatches(data, h0)
    loss_fn = _loss_fn_for(model, mask_on)
    obs_bm, fields, h0_rows = _kernel_inputs(data, h0)

    for mb_idx in range(M):
        mb = (jax.tree.map(lambda x: x[mb_idx], mbs[0]),
              jax.tree.map(lambda x: x[mb_idx], mbs[1]))
        (l_ref, aux_ref), g_ref = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb)
        (l_k, aux_k), g_k = ppo_rnn_minibatch_grads_pallas(
            params, obs_bm, fields, h0_rows, mb_idx, ENT, KL,
            num_minibatches=M, unroll_length=T, num_agents=A,
            clip_eps=CLIP, value_coef=VCOEF, mask_actions=mask_on,
            obs_dim=D, block_envs=8, interpret=True)
        assert abs(float(l_k) - float(l_ref)) < 1e-6
        for ra, ka in zip(aux_ref, aux_k):
            assert abs(float(ra) - float(ka)) < 1e-6
        for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
