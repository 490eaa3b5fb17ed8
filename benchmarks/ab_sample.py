"""A/B the rollout's action-sampling layout at BASELINE config 4.

ab_fixed.py (post auto-reset gating) shows the rollout is 6.2 ms of the
~19 ms update. `jax.random.categorical` + log_softmax + take_along_axis
run on [B, A, 5] logits — 5 of 128 vector lanes live, the same layout
problem the loss chain had before it moved to [5, N]. Variants, timed
interleaved (full 16-step rollouts, same model/engine):

  R0_current   sample_action as shipped (categorical on [B, A, 5])
  R1_lanes     explicit-gumbel argmax + log-prob on the [5, N] transpose
  R2_nosample  argmax actions, log_prob stubbed — lower bound (no RNG,
               no sampling chain at all)

Usage: python benchmarks/ab_sample.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=20, help="rollouts per call")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.config import medium_config
    from warehouse_tpu.env import engine
    from warehouse_tpu.env.batch import step_autoreset_batch
    from warehouse_tpu.models import make_model
    from warehouse_tpu.ops.ppo_update import sample_action
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config(auto_reset=True)
    B, T = args.num_envs, 16
    model = make_model(env_cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, env_cfg.obs_dim), jnp.float32))
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    env_state, obs = jax.vmap(lambda k: engine.reset(env_cfg, k))(env_keys)

    def sample_lanes(key, logits):
        n_act = logits.shape[-1]
        lt = logits.reshape(-1, n_act).T                   # [5, N]
        g = jax.random.gumbel(key, lt.shape, lt.dtype)
        z = lt + g
        action = jnp.argmax(z, axis=0).astype(jnp.int32)
        logp = jax.nn.log_softmax(lt, axis=0)
        onehot = jax.nn.one_hot(action, n_act, dtype=logp.dtype).T
        lp = (logp * onehot).sum(0)
        shape = logits.shape[:-1]
        return action.reshape(shape), lp.reshape(shape)

    def sample_argmax(key, logits):
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return action, jnp.zeros(logits.shape[:-1], jnp.float32)

    def make(sampler):
        def env_step(c, _):
            s, o, k = c
            k, ak = jax.random.split(k)
            logits, value = model.apply(params, o)
            action, log_prob = sampler(ak, logits)
            s, ts = step_autoreset_batch(env_cfg, s,
                                         action.astype(jnp.int32))
            out = (log_prob.sum() + value.sum() + ts.reward.sum())
            return (s, ts.obs, k), out

        @jax.jit
        def run(env_state, obs, k):
            def rollout(c, _):
                c, outs = jax.lax.scan(env_step, c, None, length=T)
                return c, outs.sum()
            (s, o, k), outs = jax.lax.scan(
                rollout, (env_state, obs, k), None, length=args.reps)
            return outs.sum()

        return run

    variants = {
        "R0_current": make(sample_action),
        "R1_lanes": make(sample_lanes),
        "R2_nosample": make(sample_argmax),
    }
    runs = {}
    for name, fn in variants.items():
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

    for name, (_, times) in runs.items():
        per = min(times) / args.reps
        print(json.dumps({
            "stage": name,
            "per_rollout_ms": round(per * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
