"""Decompose the IMPALA update (VERDICT r3 item 3).

Round 3 benched IMPALA at 9.16M env-steps/s vs fused-SGD PPO's 11.69M
with the SAME fused acting — the deficit lives in its all-XLA V-trace
learner phase. This probe isolates that phase cleanly: with
``impala_passes=2`` the learner runs twice on the same rollout, so
``t(passes=2) - t(passes=1)`` is EXACTLY one learner phase
(num_minibatches grad steps + optimizer), with acting, GAE-equivalent
bookkeeping and metrics held constant.

All variants interleaved in one process, floor-calibrated
(docs/RESULTS.md measurement rules).

Usage: python benchmarks/ab_impala.py [--updates 10] [--rounds 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=10)
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--env", choices=["medium", "large"], default="medium",
                   help="medium = BASELINE config 4; large = config 3 "
                        "stress geometry (15x15, 8 agents)")
    p.add_argument("--block", type=int, default=512)
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()
    import jax

    from warehouse_tpu.config import (TrainConfig, large_config,
                                      medium_config)
    from warehouse_tpu.train.impala import make_train_impala
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = (large_config if args.env == "large" else medium_config)()
    base = TrainConfig(num_envs=args.num_envs, unroll_length=16,
                       rollout_backend="pallas",
                       pallas_block=args.block, grad_backend="xla")
    variants = {
        # The round-3 bench config (act kernel + XLA V-trace learner).
        "impala": ("impala", base),
        # Same but the learner runs twice: the delta IS one learner
        # phase (4 minibatch grad steps + RMSProp), nothing else moves.
        "impala_p2": ("impala", base.replace(impala_passes=2)),
        # Adam instead of RMSProp (isolate the optimizer choice).
        "impala_adam": ("impala", base.replace(impala_rmsprop=False)),
        # Micro-batching the learner fwd+bwd (2 chunks): smaller
        # activations per backward, measures XLA scheduling overhead.
        "impala_mb2": ("impala", base.replace(micro_batches=2)),
        # Cross-family reference: the fully fused PPO at same shapes.
        "ppo_fused": ("ppo", base.replace(grad_backend="pallas")),
        # Round-4 candidate: fused V-trace learner (vtrace_sgd.py).
        "impala_fused": ("impala", base.replace(grad_backend="pallas")),
        "impala_fused_b256": ("impala",
                              base.replace(grad_backend="pallas",
                                           impala_block_envs=256)),
        "impala_fused_b512": ("impala",
                              base.replace(grad_backend="pallas",
                                           impala_block_envs=512)),
    }
    if args.only:
        names = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in names}

    runs = {}
    for name, (fam, tcfg) in variants.items():
        tr = (make_train_impala(env_cfg, tcfg) if fam == "impala"
              else make_train(env_cfg, tcfg))
        rs = tr.init(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        rs, m = tr.train_many(rs, args.updates)
        loss = float(m["loss"][-1])
        print(f"[ab] {name}: warm in {time.perf_counter() - t0:.1f}s "
              f"(loss {loss:.5f})", file=sys.stderr, flush=True)
        runs[name] = (tr, rs, [])

    from warehouse_tpu.utils.profiling import readback_floor

    floor = readback_floor(args.rounds)

    for _ in range(args.rounds):
        for name, (tr, rs, times) in runs.items():
            t0 = time.perf_counter()
            rs, m = tr.train_many(rs, args.updates)
            _ = float(m["loss"][-1])
            times.append(time.perf_counter() - t0)
            runs[name] = (tr, rs, times)

    steps = args.num_envs * 16 * args.updates
    print(json.dumps({"stage": "floor_ms", "value": round(floor * 1e3, 2)}))
    per_ms = {}
    for name, (_, _, times) in runs.items():
        per = (min(times) - floor) / args.updates
        per_ms[name] = per * 1e3
        print(json.dumps({
            "stage": name,
            "per_update_ms": round(per * 1e3, 3),
            "env_steps_per_s": round(steps / (min(times) - floor)),
        }))
    if "impala" in per_ms and "impala_p2" in per_ms:
        learner = per_ms["impala_p2"] - per_ms["impala"]
        print(json.dumps({
            "stage": "learner_phase_ms (p2 - p1)",
            "per_update_ms": round(learner, 3),
            "act_plus_overhead_ms": round(per_ms["impala"] - learner, 3),
        }))


if __name__ == "__main__":
    main()
