"""Roofline positions of the fused kernel families on the real chip.

VERDICT r4 item 1: measure each family's per-update time (interleaved,
floor-calibrated — docs/RESULTS.md measurement rules), pair it with
the analytic cost model (warehouse_tpu/utils/roofline.py), and print
achieved TFLOP/s / GB/s as a fraction of the v5e peaks plus the
speed-of-light fraction per family.

Families: ppo (act+sgd fused), impala (act+vtrace fused), cnn
(act+unrolled-conv sgd fused — true-conv FLOP count, so its sol_frac
understates the unrolled kernel's retired rate), gru / lstm
(act+replay fused), and the greedy whole-episode kernel. Whole-update
numbers per family; the act/learner split per family is in the ab_*
probes (ab_impala.py's passes trick, ab_rnn_sgd.py, ab_cnn.py).

Usage: python benchmarks/roofline.py [--updates 20] [--rounds 4]
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
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()
    import jax

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.train.impala import make_train_impala
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.train.ppo_rnn import make_train_rnn
    from warehouse_tpu.utils import roofline as rl
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = medium_config()
    base = TrainConfig(num_envs=4096, unroll_length=16,
                       rollout_backend="pallas", grad_backend="pallas")
    variants = {
        "ppo": ("ppo", base),
        "impala": ("impala", base),
        "cnn": ("cnn", base),
        "gru": ("gru", base.replace(model_dtype="bfloat16")),
        "lstm": ("lstm", base.replace(model_dtype="bfloat16")),
        # Phase isolation by differencing: doubling epochs/passes adds
        # EXACTLY one learner phase (same act, same bookkeeping), so
        # t(x2) - t(x1) is the learner phase alone and the remainder
        # is act + XLA glue (ab_impala.py's passes trick, generalized).
        "ppo_e8": ("ppo", base.replace(ppo_epochs=8)),
        "gru_e8": ("gru", base.replace(model_dtype="bfloat16",
                                       ppo_epochs=8)),
        "lstm_e8": ("lstm", base.replace(model_dtype="bfloat16",
                                         ppo_epochs=8)),
        "impala_p2": ("impala", base.replace(impala_passes=2)),
        # Act-block sweep: the act phase is the latency-bound part
        # (serial env ticks on [A, block] rows); wider blocks amortize
        # VPU instruction issue over more lanes — measured here.
        # (block=2048 exceeds the act kernel's VMEM budget at these
        # shapes — ~145MB of 128MB, now gate-rejected; 1024 is the
        # widest feasible block.)
        "ppo_blk1024": ("ppo", base.replace(pallas_block=1024)),
    }
    if args.only:
        names = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in names}

    runs = {}
    for name, (fam, tcfg) in variants.items():
        if fam == "ppo":
            tr = make_train(env_cfg, tcfg)
        elif fam == "cnn":
            tr = make_train(env_cfg, tcfg, arch="cnn")
        elif fam == "impala":
            tr = make_train_impala(env_cfg, tcfg)
        else:
            tr = make_train_rnn(env_cfg, tcfg, arch=fam)
        rs = tr.init(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        rs, m = tr.train_many(rs, args.updates)
        _ = float(m["loss"][-1])
        print(f"[roofline] {name}: warm in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr, flush=True)
        runs[name] = (tr, rs, [], rl.family_cost(fam, env_cfg, tcfg))

    # Greedy whole-episode kernel (the bench.py headline path).
    greedy = "greedy" in variants or not args.only
    if greedy:
        import jax.numpy as jnp

        from warehouse_tpu.env import engine
        from warehouse_tpu.pallas.rollout import greedy_rollout_pallas

        gcfg = medium_config()
        GB, BLOCK = 131072, 1024

        @jax.jit
        def reset_all(seed):
            keys = jax.vmap(
                lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
            )(jnp.arange(GB))
            state, _ = jax.vmap(lambda k: engine.reset(gcfg, k))(keys)
            return state

        def episode(state):
            s, d, r = greedy_rollout_pallas(gcfg, state, gcfg.max_steps,
                                            BLOCK)
            return s, d.sum()

        gstate = reset_all(0)
        _, d = episode(gstate)
        _ = int(d)
        print("[roofline] greedy: warm", file=sys.stderr, flush=True)
        gtimes = []

    from warehouse_tpu.utils.profiling import readback_floor

    floor = readback_floor(args.rounds)

    for _ in range(args.rounds):
        for name, (tr, rs, times, cost) in runs.items():
            t0 = time.perf_counter()
            rs, m = tr.train_many(rs, args.updates)
            _ = float(m["loss"][-1])
            times.append(time.perf_counter() - t0)
            runs[name] = (tr, rs, times, cost)
        if greedy:
            gstate = reset_all(len(gtimes))
            t0 = time.perf_counter()
            _, d = episode(gstate)
            _ = int(d)
            gtimes.append(time.perf_counter() - t0)

    print(json.dumps({"stage": "floor_ms", "value": round(floor * 1e3, 2)}))
    for name, (_, _, times, cost) in runs.items():
        per = (min(times) - floor) / args.updates
        rep = rl.report(cost, per)
        rep["env_steps_per_s"] = round(cost.unit_env_steps / per)
        print(json.dumps(rep))
    if greedy:
        per = min(gtimes) - floor
        cost = rl.greedy_rollout_cost(gcfg, GB)
        rep = rl.report(cost, per)
        rep["env_steps_per_s"] = round(cost.unit_env_steps / per)
        print(json.dumps(rep))


if __name__ == "__main__":
    main()
