"""Decompose the pallas-path update's NON-SGD time (floor-calibrated).

After the act kernel, the config-4 update is ~9.0 ms of which the
4-epoch SGD is ~6.2 ms — this probes where the remaining ~2.8 ms goes:

  NULL     readback floor
  K0       kernel call, outputs consumed batch-minor (no transposes)
  K1       + the [T,B,A,D]/[T,B,A] trajectory transposes (wrapper)
  K2       + boundary reset + env-major minibatch layout
  K3       + GAE + last_value forward

Usage: python benchmarks/ab_pallas_fixed.py
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
    args = p.parse_args()
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.config import medium_config
    from warehouse_tpu.env import engine
    from warehouse_tpu.env.batch import reset_truncated_batch
    from warehouse_tpu.models import make_model
    from warehouse_tpu.ops.gae import gae
    from warehouse_tpu.pallas import act as pact
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    cfg = medium_config()
    B, T, A = args.num_envs, 16, cfg.num_agents
    D = cfg.obs_dim
    model = make_model(cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, D), jnp.float32))
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    env_state, obs0 = jax.vmap(lambda k: engine.reset(cfg, k))(env_keys)

    def make(stage):
        def update(carry, k):
            s = carry
            new_s, roll, rk, k2 = pact.ppo_rollout_pallas(
                cfg, params, s, T, k, 512)
            out = roll.reward.sum() + roll.value[0, 0].sum()
            if stage >= 2:
                s2, last_obs, _ = reset_truncated_batch(cfg, new_s, rk)
                ta = T * A
                obs_env = roll.obs.transpose(1, 0, 2, 3).reshape(
                    B, ta, D)
                out = out + obs_env[0, 0, 0] + last_obs.sum() * 0
                new_s = s2
            if stage >= 3:
                _, last_value = model.apply(params, last_obs)
                adv, tgt = gae(roll.reward, roll.value,
                               roll.truncated[:, :, None].astype(
                                   jnp.float32)
                               * jnp.ones_like(roll.reward),
                               last_value, 0.99, 0.95)
                out = out + adv.sum()
            return new_s, out

        @jax.jit
        def run(env_state, k):
            keys = jax.random.split(k, args.reps)
            s, outs = jax.lax.scan(update, env_state, keys)
            return outs.sum()

        return run

    @jax.jit
    def null(k):
        return k[0].astype(jnp.float32)

    names = {"NULL": None, "K1": make(1), "K2": make(2), "K3": make(3)}
    runs = {}
    for name, fn in names.items():
        t0 = time.perf_counter()
        if name == "NULL":
            float(null(key))
        else:
            float(fn(env_state, key))
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (fn, [])

    for _ in range(args.rounds):
        for name, (fn, times) in runs.items():
            t0 = time.perf_counter()
            if name == "NULL":
                float(null(key))
            else:
                float(fn(env_state, key))
            times.append(time.perf_counter() - t0)

    floor = min(runs["NULL"][1])
    for name, (_, times) in runs.items():
        per = (min(times) - (0.0 if name == "NULL" else floor)) / args.reps
        print(json.dumps({"stage": name,
                          "per_update_ms": round(per * 1e3, 3)}))


if __name__ == "__main__":
    main()
