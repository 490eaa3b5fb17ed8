"""Diagnose the PPO SGD phase (4 epochs x 4 minibatches ~= 7.8 ms).

bf16 was throughput-neutral (ab_backend.py) so the wall is not the MXU.
Stages below vary ONE suspect each; all are floor-calibrated and thread
(params, opt_state) through reps so nothing hoists. The batch is a real
rollout captured once; only the SGD runs per rep.

  NULL        readback floor
  FULL        the real 4x4 SGD
  NOPERM      identity minibatching (no per-epoch permutation gather)
  REMAT       jax.checkpoint around the model forward (recompute h in
              bwd: trades FLOPs for activation HBM traffic)
  BF16        bfloat16 torso in the loss
  BF16REMAT   both
  NOTANH      identity activation (diagnostic only, not the real math)
  MB1         num_minibatches=1 (4 full-batch grad steps)

Usage: python benchmarks/ab_sgd.py
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
    p.add_argument("--only", type=str, default="",
                   help="comma-separated stage subset (NULL always runs)")
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
    from warehouse_tpu.models import ActorCriticMLP, make_model
    from warehouse_tpu.ops.gae import gae
    from warehouse_tpu.ops.ppo_update import ppo_losses, sample_action
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config(auto_reset=True)
    B, T, A = args.num_envs, 16, env_cfg.num_agents
    NEP = 4
    model = make_model(env_cfg)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, env_cfg.obs_dim), jnp.float32))
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adam(3e-4, eps=1e-5))
    opt_state = tx.init(params)
    env_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(B))
    env_state, obs = jax.vmap(lambda k: engine.reset(env_cfg, k))(env_keys)

    # One real rollout -> env-major batch, captured once.
    @jax.jit
    def build_batch(env_state, obs, k):
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

        (s, last_obs, k), traj = jax.lax.scan(
            env_step, (env_state, obs, k), None, length=T)
        _, last_value = model.apply(params, last_obs)
        adv, tgt = gae(traj[4], traj[3], traj[5], last_value, 0.99, 0.95)
        fields = (traj[0], traj[1], traj[2], traj[3], adv, tgt)
        ta = T * A

        def envmajor(x):
            x = jnp.moveaxis(x, 1, 0)
            return x.reshape(B, ta, *x.shape[3:])

        return tuple(envmajor(x) for x in fields)

    batch = jax.tree.map(lambda x: x, build_batch(env_state, obs, key))
    batch = jax.block_until_ready(batch)

    models = {
        "f32": model,
        "bf16": make_model(env_cfg, dtype=jnp.bfloat16),
        "notanh": ActorCriticMLP(num_actions=env_cfg.num_actions,
                                 hidden_dims=(128, 128)),
    }

    def make(variant):
        mdl = models["bf16"] if "bf16" in variant else (
            models["notanh"] if variant == "NOTANH" else models["f32"])
        remat = "REMAT" in variant
        nmb = 1 if variant == "MB1" else 4
        noperm = variant == "NOPERM"

        apply_fn = mdl.apply
        if variant == "NOTANH":
            # Diagnostic: same matmul shapes, identity activation.
            def apply_fn(p, o):  # noqa: ANN001
                x = o
                d = p["params"]
                x = x @ d["Dense_0"]["kernel"] + d["Dense_0"]["bias"]
                x = x @ d["Dense_1"]["kernel"] + d["Dense_1"]["bias"]
                lg = x @ d["Dense_2"]["kernel"] + d["Dense_2"]["bias"]
                vv = x @ d["Dense_3"]["kernel"] + d["Dense_3"]["bias"]
                return lg, vv[..., 0]
        if remat:
            apply_fn = jax.checkpoint(apply_fn)

        def loss_fn(prm, mb):
            o, a, lp, v, adv, tgt = mb
            logits, value = apply_fn(prm, o.reshape(-1, env_cfg.obs_dim))
            return ppo_losses(logits, value, a.reshape(-1), lp.reshape(-1),
                              v.reshape(-1), adv.reshape(-1),
                              tgt.reshape(-1),
                              clip_eps=0.2, value_coef=0.5, ent_coef=0.01,
                              kl_coeff=0.0)

        micro = 1
        if variant.startswith("MICRO"):
            micro = int(variant[5:])

        def sgd(carry, k):
            prm, ost = carry

            def epoch(c, ek):
                prm, ost = c
                if noperm:
                    perm = jnp.arange(B)
                else:
                    perm = jax.random.permutation(ek, B)
                mbs = jax.tree.map(
                    lambda x: x[perm].reshape(
                        nmb, B // nmb, *x.shape[1:]), batch)

                def mb_update(c2, mb):
                    prm, ost = c2
                    if micro == 1:
                        (loss, _), grads = jax.value_and_grad(
                            loss_fn, has_aux=True)(prm, mb)
                    else:
                        # Gradient accumulation: same gradient as the
                        # full minibatch (mean of equal-size micro
                        # grads), run at the faster small-batch regime.
                        micros = jax.tree.map(
                            lambda x: x.reshape(
                                micro, x.shape[0] // micro,
                                *x.shape[1:]), mb)

                        def acc(g, mi):
                            (loss, _), gr = jax.value_and_grad(
                                loss_fn, has_aux=True)(prm, mi)
                            return jax.tree.map(jnp.add, g, gr), loss

                        zero = jax.tree.map(jnp.zeros_like, prm)
                        grads, losses = jax.lax.scan(acc, zero, micros)
                        grads = jax.tree.map(lambda g: g / micro, grads)
                        loss = losses.mean()
                    upd, ost = tx.update(grads, ost, prm)
                    prm = optax.apply_updates(prm, upd)
                    return (prm, ost), loss

                (prm, ost), losses = jax.lax.scan(mb_update, (prm, ost),
                                                  mbs)
                return (prm, ost), losses.sum()

            eks = jax.random.split(k, NEP)
            (prm, ost), ls = jax.lax.scan(epoch, (prm, ost), eks)
            return (prm, ost), ls.sum()

        @jax.jit
        def run(prm, ost, k):
            keys = jax.random.split(k, args.reps)
            (prm, ost), outs = jax.lax.scan(sgd, (prm, ost), keys)
            return outs.sum()

        return run

    names = ["NULL", "FULL", "NOPERM", "REMAT", "BF16", "BF16REMAT",
             "NOTANH", "MB1", "MICRO2", "MICRO4", "MICRO8"]
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep or n == "NULL"]

    @jax.jit
    def null(k):
        return k[0].astype(jnp.float32)

    runs = {}
    for name in names:
        if name == "NULL":
            fn = lambda: float(null(key))  # noqa: E731
        else:
            r = make(name)
            fn = (lambda r=r: float(r(params, opt_state, key)))
        t0 = time.perf_counter()
        fn()
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (fn, [])

    for _ in range(args.rounds):
        for name, (fn, times) in runs.items():
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)

    floor = min(runs["NULL"][1])
    for name, (_, times) in runs.items():
        per = (min(times) - (0.0 if name == "NULL" else floor)) / args.reps
        print(json.dumps({
            "stage": name,
            "per_sgd_ms": round(per * 1e3, 3),
        }))


if __name__ == "__main__":
    main()
