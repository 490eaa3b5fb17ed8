"""Drill-down ablation of the PPO LEARN phase (the 93% of the step).

Times, per update (T=16, B=4096, A=4 → 262144 samples, 4 epochs × 4
minibatches), on a fixed synthetic trajectory:

  learn_full      real shuffle + real loss/grad/optimizer
  learn_noshuffle identity minibatches + real loss/grad/optimizer
  shuffle_only    real shuffle, trivial reduction instead of grads
  grad_only_1mb   one grad step on the full 262k batch (epoch-equivalent
                  FLOPs in 1 launch instead of 4)

Usage: python benchmarks/profile_learn.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--unroll-length", type=int, default=16)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--minibatches", type=int, default=4)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.models import make_model
    from warehouse_tpu.ops.ppo_update import (flat_minibatches,
                                              minibatch_epochs, ppo_losses)
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config()
    tcfg = TrainConfig(num_envs=args.num_envs,
                       unroll_length=args.unroll_length,
                       ppo_epochs=args.epochs,
                       num_minibatches=args.minibatches,
                       model_dtype=args.dtype)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = make_model(env_cfg, dtype=dtype)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, env_cfg.obs_dim)))
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adam(3e-4, eps=1e-5))
    opt_state = tx.init(params)

    N = tcfg.num_envs * tcfg.unroll_length * env_cfg.num_agents
    k1, k2, k3 = jax.random.split(key, 3)
    batch = (
        jax.random.uniform(k1, (N, env_cfg.obs_dim), jnp.float32),
        jax.random.randint(k2, (N,), 0, 5),
        jnp.full((N,), -1.6, jnp.float32),   # old_lp
        jnp.zeros((N,), jnp.float32),        # old_v
        jax.random.normal(k3, (N,)),         # adv
        jax.random.normal(k3, (N,)),         # tgt
    )
    steps_per_update = tcfg.num_envs * tcfg.unroll_length

    def loss_fn(params, mb):
        obs, action, old_lp, old_v, adv, tgt = mb
        logits, value = model.apply(params, obs)
        return ppo_losses(logits, value, action, old_lp, old_v, adv, tgt,
                          clip_eps=0.2, value_coef=0.5, ent_coef=0.01,
                          kl_coeff=0.0)

    def timed(fn, tag, warm=1, calls=3):
        for _ in range(warm):
            float(fn())
        times = []
        for _ in range(calls):
            t0 = time.perf_counter()
            float(fn())
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(json.dumps({
            "phase": tag, "best_s": round(best, 4),
            "all_s": [round(t, 4) for t in times],
            "equiv_env_steps_per_s": round(steps_per_update / best),
        }))

    @jax.jit
    def learn_full(params, opt_state):
        params, opt_state, _, losses = minibatch_epochs(
            params, opt_state, jax.random.PRNGKey(1),
            loss_fn=loss_fn,
            make_minibatches=lambda k: flat_minibatches(
                k, batch, tcfg.num_minibatches),
            num_epochs=tcfg.ppo_epochs, tx=tx)
        return losses[0].sum()

    timed(lambda: learn_full(params, opt_state), "learn_full")

    mb_size = N // tcfg.num_minibatches

    @jax.jit
    def learn_noshuffle(params, opt_state):
        params, opt_state, _, losses = minibatch_epochs(
            params, opt_state, jax.random.PRNGKey(1),
            loss_fn=loss_fn,
            make_minibatches=lambda k: jax.tree.map(
                lambda x: x.reshape(tcfg.num_minibatches, mb_size,
                                    *x.shape[1:]), batch),
            num_epochs=tcfg.ppo_epochs, tx=tx)
        return losses[0].sum()

    timed(lambda: learn_noshuffle(params, opt_state), "learn_noshuffle")

    @jax.jit
    def shuffle_only():
        def epoch(acc, k):
            mbs = flat_minibatches(k, batch, tcfg.num_minibatches)
            return acc + mbs[0].sum() + mbs[4].sum(), None
        keys = jax.random.split(jax.random.PRNGKey(2), tcfg.ppo_epochs)
        acc, _ = jax.lax.scan(epoch, jnp.float32(0), keys)
        return acc

    timed(shuffle_only, "shuffle_only")

    # E2: int8-packed obs for the shuffle gather (one-hot channels are
    # exact in int8; feats stay f32) — loss casts back, same numbers.
    grid_len = env_cfg.obs_dim - 6
    batch_packed = ((batch[0][:, :grid_len] > 0.5).astype(jnp.int8),
                    batch[0][:, grid_len:], *batch[1:])

    def loss_fn_packed(params, mb):
        ch, feats, action, old_lp, old_v, adv, tgt = mb
        obs = jnp.concatenate([ch.astype(jnp.float32), feats], axis=-1)
        logits, value = model.apply(params, obs)
        return ppo_losses(logits, value, action, old_lp, old_v, adv, tgt,
                          clip_eps=0.2, value_coef=0.5, ent_coef=0.01,
                          kl_coeff=0.0)

    @jax.jit
    def learn_packed(params, opt_state):
        params, opt_state, _, losses = minibatch_epochs(
            params, opt_state, jax.random.PRNGKey(1),
            loss_fn=loss_fn_packed,
            make_minibatches=lambda k: flat_minibatches(
                k, batch_packed, tcfg.num_minibatches),
            num_epochs=tcfg.ppo_epochs, tx=tx)
        return losses[0].sum()

    timed(lambda: learn_packed(params, opt_state), "learn_int8_packed_obs")

    # E3: one real shuffle, then per-epoch jnp.roll regrouping (contiguous
    # copy instead of gather).
    @jax.jit
    def learn_shuffle_once(params, opt_state):
        perm = jax.random.permutation(jax.random.PRNGKey(1), N)
        shuffled = jax.tree.map(lambda x: x[perm], batch)

        def mk(k):
            off = jax.random.randint(k, (), 1, N)
            return jax.tree.map(
                lambda x: jnp.roll(x, off, axis=0).reshape(
                    tcfg.num_minibatches, mb_size, *x.shape[1:]),
                shuffled)

        params, opt_state, _, losses = minibatch_epochs(
            params, opt_state, jax.random.PRNGKey(2),
            loss_fn=loss_fn, make_minibatches=mk,
            num_epochs=tcfg.ppo_epochs, tx=tx)
        return losses[0].sum()

    timed(lambda: learn_shuffle_once(params, opt_state),
          "learn_shuffle_once_roll")

    # E4: how much of the grad cost is the [N, 5] elementwise loss chain
    # (only 5 of 128 VPU lanes live) vs the matmuls?
    def loss_model_only(params, mb):
        obs = mb[0]
        logits, value = model.apply(params, obs)
        return (logits * logits).sum() + (value * value).sum(), (
            jnp.float32(0),) * 4

    @jax.jit
    def grad_model_only(params, opt_state):
        def one(carry, _):
            params, opt_state = carry
            (loss, _), grads = jax.value_and_grad(
                loss_model_only, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), None, length=tcfg.ppo_epochs)
        return losses.sum()

    timed(lambda: grad_model_only(params, opt_state),
          "grad_model_only_x_epochs")

    # E5: lane-efficient loss — logits transposed to [5, N] so the
    # softmax/entropy chain runs on full 128-lane rows.
    def loss_fn_T(params, mb):
        obs, action, old_lp, old_v, adv, tgt = mb
        logits, value = model.apply(params, obs)
        lt = logits.T                                  # [5, N]
        logp = jax.nn.log_softmax(lt, axis=0)
        onehot = jax.nn.one_hot(action, 5, dtype=logp.dtype).T  # [5, N]
        lp = (logp * onehot).sum(0)
        ratio = jnp.exp(lp - old_lp)
        adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 0.8, 1.2) * adv_n).mean()
        v_clip = old_v + jnp.clip(value - old_v, -0.2, 0.2)
        v_loss = 0.5 * jnp.maximum(
            (value - tgt) ** 2, (v_clip - tgt) ** 2).mean()
        entropy = -(jnp.exp(logp) * logp).sum(0).mean()
        return pg + 0.5 * v_loss - 0.01 * entropy, (
            pg, v_loss, entropy, (old_lp - lp).mean())

    @jax.jit
    def learn_noshuffle_T(params, opt_state):
        params, opt_state, _, losses = minibatch_epochs(
            params, opt_state, jax.random.PRNGKey(1),
            loss_fn=loss_fn_T,
            make_minibatches=lambda k: jax.tree.map(
                lambda x: x.reshape(tcfg.num_minibatches, mb_size,
                                    *x.shape[1:]), batch),
            num_epochs=tcfg.ppo_epochs, tx=tx)
        return losses[0].sum()

    timed(lambda: learn_noshuffle_T(params, opt_state),
          "learn_noshuffle_transposed_loss")

    @jax.jit
    def grad_only_1mb(params, opt_state):
        def one(carry, _):
            params, opt_state = carry
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), None, length=tcfg.ppo_epochs)
        return losses.sum()

    timed(lambda: grad_only_1mb(params, opt_state), "grad_only_1mb_x_epochs")


if __name__ == "__main__":
    main()
