"""Ablation profile of the PPO trained path (BASELINE config 4).

Decomposes the Anakin train step into its phases and times each on the
real chip, gated on a SINGLE scalar readback per timing (the tunnel's
block_until_ready is unreliable — docs/RESULTS.md "Throughput").

Phases:
  full        train_many(n)           — the honest trained number
  full_steps  per-update python loop  — what round 1 measured (pays one
                                        host readback per update)
  rollout     scan(policy+env+store)  — acting only
  env_only    scan(env, fixed action) — engine ceiling within this shape
  policy_only scan(policy fwd+sample) — model ceiling
  learn_only  GAE + epochs on a fixed trajectory

Usage: python benchmarks/profile_ppo.py [--updates 20] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=20)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--unroll-length", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--minibatch-mode", default="flat",
                   choices=["flat", "env"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--full-only", action="store_true",
                   help="skip the component phases")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of one train step")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config()
    tcfg = TrainConfig(num_envs=args.num_envs,
                       unroll_length=args.unroll_length,
                       minibatch_mode=args.minibatch_mode,
                       model_dtype=args.dtype)
    trainer = make_train(env_cfg, tcfg)
    rs = trainer.init(jax.random.PRNGKey(0))
    n = args.updates
    steps_per_update = tcfg.num_envs * tcfg.unroll_length

    def timed(fn, tag, units_per_call, warm=1, calls=3):
        """fn() must return a device scalar; timing gated on readback."""
        for _ in range(warm):
            float(fn())
        times = []
        for _ in range(calls):
            t0 = time.perf_counter()
            float(fn())
            times.append(time.perf_counter() - t0)
        best = min(times)
        rate = units_per_call / best
        print(json.dumps({
            "phase": tag,
            "best_s": round(best, 4),
            "all_s": [round(t, 4) for t in times],
            "env_steps_per_s": round(rate),
        }))
        return rate

    # ---- full: n updates fused in one scan, one readback --------------
    def full():
        new_rs, metrics = trainer.train_many(rs, n)
        return metrics["loss"][-1]

    timed(full, "full_train_many", n * steps_per_update)
    if args.full_only:
        return

    # ---- full_steps: python loop, one readback per update --------------
    def full_steps():
        r = rs
        out = None
        for _ in range(n):
            r, m = trainer.train_step(r)
            out = float(m["loss"])  # per-update readback (round-1 style)
        return out

    timed(full_steps, "full_stepwise_readback", n * steps_per_update,
          warm=1, calls=2)

    # ---- component phases ----------------------------------------------
    from warehouse_tpu.env import engine
    from warehouse_tpu.models import make_model

    model = trainer.model
    params = rs.params
    env_state, obs = rs.env_state, rs.obs
    T = tcfg.unroll_length * n  # same step count as n updates

    @jax.jit
    def rollout_only(env_state, obs, key):
        def step(carry, _):
            s, o, k = carry
            k, ak = jax.random.split(k)
            logits, value = model.apply(params, o)
            a = jax.random.categorical(ak, logits)
            lp = jnp.take_along_axis(
                jax.nn.log_softmax(logits), a[..., None], -1).squeeze(-1)
            s, ts = jax.vmap(
                lambda ss, aa: engine.step(env_cfg, ss, aa)
            )(s, a.astype(jnp.int32))
            return (s, ts.obs, k), (o, a, lp, value, ts.reward)
        (s, o, _), traj = jax.lax.scan(
            step, (env_state, obs, key), None, length=T)
        return traj[4].sum()

    timed(lambda: rollout_only(env_state, obs, jax.random.PRNGKey(1)),
          "rollout_store", T * tcfg.num_envs)

    @jax.jit
    def env_only(env_state):
        def step(s, _):
            a = jnp.ones((tcfg.num_envs, env_cfg.num_agents), jnp.int32)
            s, ts = jax.vmap(
                lambda ss, aa: engine.step(env_cfg, ss, aa)
            )(s, a)
            return s, None
        s, _ = jax.lax.scan(step, env_state, None, length=T)
        return s.t.sum()

    timed(lambda: env_only(env_state), "env_only", T * tcfg.num_envs)

    @jax.jit
    def policy_only(obs, key):
        def step(carry, _):
            o, k, acc = carry
            k, ak = jax.random.split(k)
            logits, value = model.apply(params, o)
            a = jax.random.categorical(ak, logits)
            # fold the action back into the obs so nothing is DCE'd
            o = o + 1e-9 * a[..., None].astype(jnp.float32)
            return (o, k, acc + value.sum()), None
        (o, _, acc), _ = jax.lax.scan(
            step, (obs, key, jnp.float32(0)), None, length=T)
        return acc

    timed(lambda: policy_only(obs, jax.random.PRNGKey(2)),
          "policy_only", T * tcfg.num_envs)

    # learn-only: run the real train step but with unroll folded — approx
    # by subtracting rollout from full is noisy; instead time ONE train
    # step vs one rollout of the same T.
    if args.profile_dir:
        with jax.profiler.trace(args.profile_dir):
            new_rs, m = trainer.train_step(rs)
            float(m["loss"])
        print(json.dumps({"phase": "trace_written",
                          "dir": args.profile_dir}))


if __name__ == "__main__":
    main()
