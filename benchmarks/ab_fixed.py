"""Isolate the PPO update's FIXED (non-epoch) cost stage by stage.

ab_epochs.py showed t(e, m) ~= 18.7ms + 3.1ms*e with grad steps ~free
at BASELINE config 4 — the fixed term, not the SGD, is the wall. This
probes cumulative pipelines (same process, interleaved timing):

  P0 rollout      the env_step scan storing the full Transition
  P1 +gae         + last_value forward + GAE
  P2 +layout      + env-major moveaxis/reshape of all 8 fields
  P3 +gather      + one epoch's 4096-row permutation gather
  P4 +grad        + one 262k-sample grad step (epoch-equivalent FLOPs)

Usage: python benchmarks/ab_fixed.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=10, help="updates per call")
    p.add_argument("--rounds", type=int, default=3)
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
    model = make_model(env_cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, env_cfg.obs_dim), jnp.float32))
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adam(3e-4, eps=1e-5))
    opt_state = tx.init(params)
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    env_state, obs = jax.vmap(lambda k: engine.reset(env_cfg, k))(env_keys)

    def one_rollout(carry):
        env_state, obs, k = carry

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

        carry, traj = jax.lax.scan(env_step, (env_state, obs, k), None,
                                   length=T)
        return carry, traj

    def add_gae(carry, traj):
        _, last_obs, _ = carry
        _, last_value = model.apply(params, last_obs)
        adv, tgt = gae(traj[4], traj[3], traj[5], last_value, 0.99, 0.95)
        return adv, tgt

    def add_layout(traj, adv, tgt):
        fields = (traj[0], traj[1], traj[2], traj[3], adv, tgt)
        ta = T * A

        def envmajor(x):
            x = jnp.moveaxis(x, 1, 0)
            return x.reshape(B, ta, *x.shape[3:])

        return tuple(envmajor(x) for x in fields)

    def add_gather(k, batch):
        perm = jax.random.permutation(k, B)
        return jax.tree.map(lambda x: x[perm], batch)

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
            carry, traj = one_rollout(carry)
            out = traj[4].sum()  # rewards checksum anchors the rollout
            if stage >= 1:
                adv, tgt = add_gae(carry, traj)
                out = out + adv.sum()
            if stage >= 2:
                batch = add_layout(traj, adv, tgt)
                out = out + batch[0][0, 0, 0]
            if stage >= 3:
                batch = add_gather(k, batch)
                out = out + batch[1][0, 0].astype(jnp.float32)
            if stage >= 4:
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, batch)
                out = out + loss
            return carry, out

        @jax.jit
        def run(env_state, obs, k):
            keys = jax.random.split(k, args.reps)
            carry, outs = jax.lax.scan(
                update, (env_state, obs, k), keys)
            return outs.sum()

        return run

    names = ["P0_rollout", "P1_gae", "P2_layout", "P3_gather", "P4_grad"]
    runs = {}
    for stage, name in enumerate(names):
        fn = make(stage)
        t0 = time.perf_counter()
        float(fn(env_state, obs, key))
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (fn, [])

    for r in range(args.rounds):
        for name, (fn, times) in runs.items():
            t0 = time.perf_counter()
            float(fn(env_state, obs, key))
            times.append(time.perf_counter() - t0)

    prev = 0.0
    for name, (_, times) in runs.items():
        per = min(times) / args.reps
        print(json.dumps({
            "stage": name,
            "per_update_ms": round(per * 1e3, 2),
            "delta_ms": round((per - prev) * 1e3, 2),
        }))
        prev = per


if __name__ == "__main__":
    main()
