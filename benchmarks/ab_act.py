"""Decompose the fused trained update's ACTING side at BASELINE config 4.

After the round-3 fused SGD kernel, the 5.25 ms update is roughly half
acting-side. This probe times, floor-calibrated and interleaved:

- ``update``  — the full fused train_step (reference point)
- ``act``     — rollout kernel + boundary reset + GAE + advantage
  normalization + fields build (everything up to the SGD call), gated
  on a scalar readback
- ``draws``   — ONLY the env-draw + gumbel precompute scans the act
  wrapper runs before the kernel
- ``sgd``     — ONLY ppo_sgd_phase_pallas on captured inputs

Usage: python benchmarks/ab_act.py [--updates 20] [--rounds 4]
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
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--block", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.env import engine
    from warehouse_tpu import rng as _rng
    from warehouse_tpu.ops.gae import gae
    from warehouse_tpu.pallas.act import ppo_rollout_pallas, _pad8
    from warehouse_tpu.pallas.sgd import FIELD_ROWS, ppo_sgd_phase_pallas
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    cfg = medium_config()
    cfg_noar = cfg.replace(auto_reset=False)
    tcfg = TrainConfig(num_envs=args.num_envs, unroll_length=16,
                       rollout_backend="pallas", grad_backend="pallas",
                       pallas_block=args.block)
    T, A, D = tcfg.unroll_length, cfg.num_agents, cfg.obs_dim
    Dp = _pad8(D)
    B = args.num_envs
    M = tcfg.num_minibatches

    tr = make_train(cfg, tcfg)
    rs = tr.init(jax.random.PRNGKey(0))

    # ---- captured inputs for the isolated phases -------------------
    params = rs.params
    env_state = rs.env_state

    @jax.jit
    def act_phase(env_state, key):
        new_state, roll, rk, key = ppo_rollout_pallas(
            cfg_noar, params, env_state, T, key, args.block)
        from warehouse_tpu.env.batch import (observe_batch,
                                             reset_truncated_batch)
        st, last_obs, _ = reset_truncated_batch(cfg_noar, new_state, rk)
        _, last_value = tr.model.apply(params, last_obs)
        adv, tgt = gae(roll.reward, roll.value,
                       jnp.broadcast_to(roll.truncated[:, :, None],
                                        roll.reward.shape),
                       last_value, tcfg.gamma, tcfg.gae_lambda)
        mbB = B // M
        adv_g = adv.reshape(T, M, mbB, A)
        mean = adv_g.mean(axis=(0, 2, 3), keepdims=True)
        std = adv_g.std(axis=(0, 2, 3), keepdims=True)
        adv_n = ((adv_g - mean) / (std + 1e-8)).reshape(T, B, A)

        def row_ta(x):
            return x.transpose(0, 2, 1).reshape(T * A, B)

        frows = [row_ta(roll.action.astype(jnp.float32)),
                 row_ta(roll.log_prob), row_ta(roll.value),
                 row_ta(adv_n), row_ta(tgt)]
        frows += [jnp.zeros((T * A, B), jnp.float32)] * (
            FIELD_ROWS - len(frows))
        fields = jnp.stack(frows, axis=1).reshape(T * A * FIELD_ROWS, B)
        return st, roll.obs_bm, fields, roll.delivered.sum()

    @jax.jit
    def draws_only(key, env_keys):
        # The production (batched) draw precompute — rng.py.
        fk, u, pk, dr, rk = _rng.batched_step_draws(env_keys, cfg_noar,
                                                    T)
        nk, g = _rng.batched_gumbel_stream(key, T, (5, B * A))
        return u.sum() + g.sum()

    st2, obs_bm, fields, d0 = act_phase(env_state, jax.random.PRNGKey(3))
    _ = int(d0)

    n_steps = tcfg.ppo_epochs * M
    lr_row = jnp.full((n_steps,), 3e-4, jnp.float32)
    cnt = jnp.arange(1, n_steps + 1, dtype=jnp.float32)
    bc1 = 1.0 - 0.9 ** cnt
    bc2 = 1.0 - 0.999 ** cnt

    @jax.jit
    def sgd_only(params, opt_state, obs_bm, fields):
        p2, o2, losses = ppo_sgd_phase_pallas(
            params, opt_state, obs_bm, fields, lr_row, bc1, bc2,
            0.01, 0.0, num_epochs=tcfg.ppo_epochs, num_minibatches=M,
            clip_eps=0.2, value_coef=0.5, max_grad_norm=0.5,
            mask_actions=False, obs_dim=D,
            block_envs=tcfg.sgd_block_envs,
            rows_per_block=tcfg.sgd_rows_per_block)
        return losses[0].sum()

    # ---- warm all variants -----------------------------------------
    rs, m = tr.train_many(rs, args.updates)
    _ = float(m["loss"][-1])
    _ = int(act_phase(env_state, jax.random.PRNGKey(4))[3])
    _ = float(draws_only(jax.random.PRNGKey(5), env_state.key))
    _ = float(sgd_only(params, rs.opt_state, obs_bm, fields))

    @jax.jit
    def null():
        return jnp.float32(0.0)

    float(null())
    floors = []
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        float(null())
        floors.append(time.perf_counter() - t0)
    floor = min(floors)

    times = {"update": [], "act": [], "draws": [], "sgd": []}
    for _ in range(args.rounds):
        t0 = time.perf_counter()
        rs, m = tr.train_many(rs, args.updates)
        _ = float(m["loss"][-1])
        times["update"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        for i in range(args.updates):
            out = act_phase(env_state, jax.random.fold_in(
                jax.random.PRNGKey(6), i))
        _ = int(out[3])
        times["act"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        for i in range(args.updates):
            r = draws_only(jax.random.fold_in(jax.random.PRNGKey(7), i),
                           env_state.key)
        _ = float(r)
        times["draws"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        for i in range(args.updates):
            r = sgd_only(params, rs.opt_state, obs_bm, fields)
        _ = float(r)
        times["sgd"].append(time.perf_counter() - t0)

    print(json.dumps({"stage": "floor_ms", "value": round(floor * 1e3, 2)}))
    for name, ts in times.items():
        per = (min(ts) - floor) / args.updates
        print(json.dumps({"stage": name,
                          "per_call_ms": round(per * 1e3, 3)}))


if __name__ == "__main__":
    main()
