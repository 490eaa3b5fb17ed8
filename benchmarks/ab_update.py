"""Floor-calibrated decomposition of the full PPO update.

The tunneled chip pays a ~25 ms host-readback round-trip PER TIMED CALL
on slow days, which swamped the per-stage numbers of earlier micro
probes (ab_fwd.py's single-dot and half-batch variants measured the
same 1.24 ms/rep as the full model — i.e. pure floor). This probe
measures everything in ONE process, interleaved, and subtracts a NULL
variant (empty scan + same scalar readback) from every stage:

  NULL        scalar readback only — the floor
  ROLLOUT     16-step policy rollout (gated auto-reset path)
  FIXED       rollout + GAE + env-major layout (no SGD)
  GRAD1       fixed + 1 full-batch grad step
  EPOCH4      fixed + 4 epochs x 4 minibatches (the real update shape)

Usage: python benchmarks/ab_update.py [--reps 20] [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from warehouse_tpu.config import medium_config
    from warehouse_tpu.env import engine
    from warehouse_tpu.env.batch import step_autoreset_batch
    from warehouse_tpu.models import make_model
    from warehouse_tpu.ops.gae import gae
    from warehouse_tpu.ops.ppo_update import ppo_losses, sample_action
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config(auto_reset=True)
    B, T, A = args.num_envs, 16, env_cfg.num_agents
    NMB, NEP = 4, 4
    model = make_model(env_cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, env_cfg.obs_dim), jnp.float32))
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adam(3e-4, eps=1e-5))
    opt_state = tx.init(params)
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    env_state, obs = jax.vmap(lambda k: engine.reset(env_cfg, k))(env_keys)

    def one_rollout(params, carry):
        def env_step(c, _):
            s, o, k = c
            k, ak = jax.random.split(k)
            logits, value = model.apply(params, o)
            action, log_prob = sample_action(ak, logits)
            s, ts = step_autoreset_batch(env_cfg, s,
                                         action.astype(jnp.int32))
            done = jnp.broadcast_to(ts.truncated[:, None], ts.reward.shape)
            return (s, ts.obs, k), (o, action, log_prob, value,
                                    ts.reward, done)

        return jax.lax.scan(env_step, carry, None, length=T)

    def fixed_part(params, carry):
        carry, traj = one_rollout(params, carry)
        _, last_obs, _ = carry
        _, last_value = model.apply(params, last_obs)
        adv, tgt = gae(traj[4], traj[3], traj[5], last_value, 0.99, 0.95)
        fields = (traj[0], traj[1], traj[2], traj[3], adv, tgt)
        ta = T * A

        def envmajor(x):
            x = jnp.moveaxis(x, 1, 0)
            return x.reshape(B, ta, *x.shape[3:])

        return carry, tuple(envmajor(x) for x in fields)

    def loss_fn(params, mb):
        o, a, lp, v, adv, tgt = mb
        logits, value = model.apply(
            params, o.reshape(-1, env_cfg.obs_dim))
        return ppo_losses(logits, value, a.reshape(-1), lp.reshape(-1),
                          v.reshape(-1), adv.reshape(-1), tgt.reshape(-1),
                          clip_eps=0.2, value_coef=0.5, ent_coef=0.01,
                          kl_coeff=0.0)

    def make(stage):
        def update(carry, k):
            if stage == 0:
                return carry, jnp.float32(0.0)
            carry, batch = fixed_part(params, carry)
            out = batch[4][0, 0]
            if stage == 2:  # GRAD1
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch)
                out = out + loss
            if stage == 3:  # EPOCH4: the real 4x4 SGD (params fixed at
                # the probe's init so stages stay comparable; optimizer
                # update included).
                def epoch(c, ek):
                    prm, ost = c
                    perm = jax.random.permutation(ek, B)
                    mbs = jax.tree.map(
                        lambda x: x[perm].reshape(
                            NMB, B // NMB, *x.shape[1:]), batch)

                    def mb_update(c2, mb):
                        prm, ost = c2
                        (loss, _), grads = jax.value_and_grad(
                            loss_fn, has_aux=True)(prm, mb)
                        upd, ost = tx.update(grads, ost, prm)
                        prm = optax.apply_updates(prm, upd)
                        return (prm, ost), loss

                    (prm, ost), losses = jax.lax.scan(mb_update,
                                                      (prm, ost), mbs)
                    return (prm, ost), losses.sum()

                eks = jax.random.split(k, NEP)
                (_, _), ls = jax.lax.scan(epoch, (params, opt_state), eks)
                out = out + ls.sum()
            return carry, out

        @jax.jit
        def run(env_state, obs, k):
            keys = jax.random.split(k, args.reps)
            carry, outs = jax.lax.scan(
                update, (env_state, obs, k), keys)
            return outs.sum()

        return run

    names = ["NULL", "FIXED", "GRAD1", "EPOCH4"]
    stages = [0, 1, 2, 3]
    runs = {}
    for stage, name in zip(stages, names):
        fn = make(stage)
        t0 = time.perf_counter()
        float(fn(env_state, obs, key))
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (fn, [])

    for _ in range(args.rounds):
        for name, (fn, times) in runs.items():
            t0 = time.perf_counter()
            float(fn(env_state, obs, key))
            times.append(time.perf_counter() - t0)

    floor = min(runs["NULL"][1])
    results = {}
    for name, (_, times) in runs.items():
        per = (min(times) - (0.0 if name == "NULL" else floor)) / args.reps
        results[name] = per
        print(json.dumps({
            "stage": name,
            "per_update_ms": round(per * 1e3, 3),
            "raw_call_ms": round(min(times) * 1e3, 1),
        }))
    steps = B * T
    full = results["EPOCH4"]
    print(json.dumps({
        "stage": "implied_env_steps_per_s",
        "value": round(steps / full) if full > 0 else None,
    }))


if __name__ == "__main__":
    main()
