"""A/B the recurrent-PPO SGD backend (XLA sequence replay vs the fused
Pallas sequence-replay kernel, pallas/sgd_rnn.py).

Times full train_many updates (GRU rollout + GAE + 4x4 sequence-replay
SGD) at BASELINE config 4, all variants interleaved in one process,
floor-calibrated against a null readback (docs/RESULTS.md measurement
rules for this tunneled chip).

Usage: python benchmarks/ab_rnn_sgd.py [--updates 10] [--rounds 4]
       [--only fused_bf16,act_bf16]
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
    p.add_argument("--arch", choices=["gru", "lstm"], default="gru")
    p.add_argument("--only", type=str, default="",
                   help="comma-separated variant subset")
    args = p.parse_args()
    import jax

    from warehouse_tpu.config import (TrainConfig, large_config,
                                      medium_config)
    from warehouse_tpu.train.ppo_rnn import make_train_rnn
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), file=sys.stderr)

    env_cfg = (large_config if args.env == "large" else medium_config)()
    # Backends EXPLICIT so nothing silently resolves via "auto".
    base = TrainConfig(num_envs=args.num_envs, unroll_length=16,
                       rollout_backend="xla", grad_backend="xla")
    pall = base.replace(rollout_backend="pallas",
                        pallas_block=args.block)
    variants = {
        # Round-3 reference points:
        "xla_f32": base,                                   # 1.62M (r3)
        "act_bf16": pall.replace(model_dtype="bfloat16"),  # 2.60M (r3)
        # The round-4 candidate: fused act + fused sequence-replay SGD.
        "fused_f32": pall.replace(grad_backend="pallas"),
        "fused_bf16": pall.replace(grad_backend="pallas",
                                   model_dtype="bfloat16"),
        # Block-geometry sweep for the replay kernel.
        "fused_bf16_b128": pall.replace(grad_backend="pallas",
                                        model_dtype="bfloat16",
                                        sgd_rnn_block_envs=128),
        "fused_bf16_b512": pall.replace(grad_backend="pallas",
                                        model_dtype="bfloat16",
                                        sgd_rnn_block_envs=512),
        "fused_bf16_b1024": pall.replace(grad_backend="pallas",
                                         model_dtype="bfloat16",
                                         sgd_rnn_block_envs=1024),
    }
    if args.only:
        names = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in names}

    runs = {}
    for name, tcfg in variants.items():
        tr = make_train_rnn(env_cfg, tcfg, arch=args.arch)
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
    for name, (_, _, times) in runs.items():
        per = (min(times) - floor) / args.updates
        print(json.dumps({
            "stage": name,
            "per_update_ms": round(per * 1e3, 3),
            "env_steps_per_s": round(steps / (min(times) - floor)),
        }))


if __name__ == "__main__":
    main()
