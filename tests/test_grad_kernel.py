"""Fused PPO loss+backward kernel (pallas/grad.py) vs jax.value_and_grad.

Interpret mode on the CPU backend; the contract is gradient equality to
f32 accumulation order across both surrogate regimes — epoch-0 exact
ties (ratio == 1 everywhere) and active clip branches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from warehouse_tpu.config import TrainConfig, medium_config, small_config
from warehouse_tpu.models import make_model
from warehouse_tpu.ops.ppo_update import ppo_losses
from warehouse_tpu.pallas.grad import ppo_value_and_grad_pallas

N = 1024


def _setup(ratio_offset: float):
    cfg = medium_config()
    key = jax.random.PRNGKey(0)
    model = make_model(cfg)
    params = model.init(key, jnp.zeros((1, cfg.obs_dim), jnp.float32))
    ks = jax.random.split(key, 7)
    obs = jax.random.uniform(ks[0], (N, cfg.obs_dim))
    action = jax.random.randint(ks[1], (N,), 0, 5)
    logits0, value0 = model.apply(params, obs)
    lp0 = jnp.take_along_axis(
        jax.nn.log_softmax(logits0), action[:, None], 1)[:, 0]
    if ratio_offset:
        lp0 = lp0 - ratio_offset * jnp.abs(
            jax.random.normal(ks[6], (N,)))
    adv = jax.random.normal(ks[3], (N,))
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    tgt = jax.random.normal(ks[4], (N,))
    old_v = value0 + 0.05 * jax.random.normal(ks[5], (N,))
    return cfg, model, params, obs, action, lp0, old_v, adv_n, tgt


@pytest.mark.parametrize("ratio_offset,kl_coeff", [(0.0, 0.1), (0.3, 0.0)])
def test_grad_kernel_matches_jax_grad(ratio_offset, kl_coeff):
    (cfg, model, params, obs, action, lp0, old_v, adv_n,
     tgt) = _setup(ratio_offset)

    def loss_fn(p):
        logits, value = model.apply(p, obs)
        return ppo_losses(logits, value, action, lp0, old_v, adv_n, tgt,
                          clip_eps=0.2, value_coef=0.5, ent_coef=0.01,
                          kl_coeff=kl_coeff, normalize_adv=False)

    (ref_loss, ref_aux), ref_g = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    (k_loss, k_aux), k_g = ppo_value_and_grad_pallas(
        params, obs, action, lp0, old_v, adv_n, tgt,
        ent_coef=0.01, kl_coeff=kl_coeff, clip_eps=0.2, value_coef=0.5,
        block=512, interpret=True)

    assert abs(float(ref_loss) - float(k_loss)) < 1e-6
    for ra, ka in zip(ref_aux, k_aux):
        assert abs(float(ra) - float(ka)) < 1e-6
    flat_k = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(k_g)}
    for kp, rv in jax.tree_util.tree_leaves_with_path(ref_g):
        kv = flat_k[jax.tree_util.keystr(kp)]
        denom = np.abs(np.asarray(rv)).max() + 1e-8
        rel = float(np.abs(np.asarray(rv) - np.asarray(kv)).max() / denom)
        assert rel < 1e-4, (jax.tree_util.keystr(kp), rel)


@pytest.mark.slow
def test_trainer_grad_backend_equivalence():
    """make_train(grad_backend='pallas') vs 'xla': same seed, two
    updates — params equal to f32 accumulation tolerance."""
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=128, unroll_length=4, num_updates=2,
                       num_minibatches=2, minibatch_mode="env",
                       entropy_coef_final=0.001)  # exercises traced coef
    trx = make_train(cfg, base)
    trp = make_train(cfg, base.replace(grad_backend="pallas",
                                       pallas_interpret=True))
    rsx = trx.init(jax.random.PRNGKey(0))
    rsp = trp.init(jax.random.PRNGKey(0))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 1e-4, k
    for a, b in zip(jax.tree.leaves(rsx.params),
                    jax.tree.leaves(rsp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_grad_backend_gate_raises():
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=128, unroll_length=4,
                       grad_backend="pallas")
    with pytest.raises(ValueError, match="pallas"):
        make_train(cfg, base.replace(mask_actions=True))
    with pytest.raises(ValueError, match="grad_backend"):
        make_train(cfg, base.replace(grad_backend="bogus"))


@pytest.mark.slow
def test_grad_kernel_with_micro_batches():
    """grad_backend='pallas' composes with micro-batch accumulation
    (the kernel is the vg inside the micro scan)."""
    from warehouse_tpu.train.ppo import make_train

    cfg = small_config().replace(max_steps=8)
    base = TrainConfig(num_envs=128, unroll_length=4, num_updates=2,
                       num_minibatches=2, minibatch_mode="env")
    trx = make_train(cfg, base)
    trp = make_train(cfg, base.replace(grad_backend="pallas",
                                       micro_batches=2,
                                       pallas_interpret=True))
    rsx = trx.init(jax.random.PRNGKey(1))
    rsp = trp.init(jax.random.PRNGKey(1))
    for _ in range(2):
        rsx, mx = trx.train_step(rsx)
        rsp, mp = trp.train_step(rsp)
        for k in mx:
            assert abs(float(mx[k]) - float(mp[k])) < 1e-4, k
    for a, b in zip(jax.tree.leaves(rsx.params),
                    jax.tree.leaves(rsp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-6)
