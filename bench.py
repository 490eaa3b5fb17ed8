"""Throughput benchmark on 1 chip, six paths, ONE JSON line.

Paths reported (BASELINE.json configs 2 & 4):

- ``pallas``  — fused Pallas greedy rollout kernel (headline `value`):
  full 128-step episodes at B=131072 incl. synchronized reset
  (warehouse_tpu/pallas/rollout.py, bit-exact vs the XLA engine).
- ``engine``  — pure-XLA engine + jitted greedy policy, auto-reset fused
  in-step (the general-policy rollout path), B=8192.
- ``ppo``     — the TRAINED path: full Anakin PPO update (rollout + GAE +
  4 epochs x 4 minibatches) at BASELINE config 4 (4096 envs, 9x9, 4
  agents), with DEFAULT TrainConfig SGD cadence (minibatch_mode="env" +
  epoch_shuffle="once" are the defaults as of round 3 — curve-proven
  equivalent to the RLlib cadence, docs/RESULTS.md; so this number is
  what a default ``python -m warehouse_tpu.train`` run gets).
- ``impala``  — trained V-trace actor-learner, same config-4 shapes.
- ``ppo_rnn`` — trained recurrent (GRU) PPO, same config-4 shapes.
- ``lstm``    — trained recurrent (LSTM) PPO, same config-4 shapes
  (VERDICT r4 weak 6: the LSTM fused replay gets a driver-captured
  number, not just builder-run A/Bs).

North-star metric (BASELINE.json:2): env-steps/s per chip; the aggregate
target is >10M env-steps/s on v5e-16, i.e. 625k/chip — ``vs_baseline``
is headline-per-chip / 625k.

Timing is gated on host readbacks of device-side scalars, NOT
``block_until_ready`` (unreliable over this machine's remote-device
transport — see docs/RESULTS.md). The headline pays ONE readback for all
episodes; ``pallas_episode_s`` additionally reports per-episode timings
(each gated on its own readback, so they include one tunnel round-trip)
as a chip-weather diagnostic: a wide spread means tunnel/chip variance,
not a code regression.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

PER_CHIP_TARGET = 10_000_000 / 16

# Per-path wall-clock budgets (seconds), enforced by SUBPROCESS
# isolation: a wedged remote-compile RPC blocks inside PJRT C++ and is
# not interruptible by signals, so each path runs in its own process
# (see main) — a hang or crash degrades that one path to null instead
# of sinking the whole bench (observed 2026-08-20: the tunnel's compile
# service went down for >1h while cached programs kept executing).
PATH_BUDGET_S = {"pallas": 1800, "engine": 900, "ppo": 1500,
                 "impala": 1500, "ppo_rnn": 2100, "lstm": 2100}
# ppo_rnn gets the largest budget: a cold GRU train_many compile was
# measured at ~20 min on a slow-tunnel day (cached thereafter).


def _progress(msg: str) -> None:
    """Progress marker on stderr (stdout carries ONLY the JSON line)."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def bench_pallas(jax, jnp):
    from warehouse_tpu import medium_config
    from warehouse_tpu.env import engine
    from warehouse_tpu.pallas.rollout import greedy_rollout_pallas

    cfg = medium_config()  # auto_reset handled at episode boundary below
    B, BLOCK = 131072, 1024
    T = cfg.max_steps  # one full episode per kernel call

    @jax.jit
    def reset_all(seed):
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(jnp.arange(B))
        state, _ = jax.vmap(lambda k: engine.reset(cfg, k))(keys)
        return state

    def episode(state):
        new_state, deliv, rew = greedy_rollout_pallas(cfg, state, T, BLOCK)
        return new_state, deliv.sum(), rew.sum()

    _progress(f"pallas: compiling reset (B={B}) …")
    state = reset_all(0)
    _progress("pallas: compiling fused rollout kernel …")
    t_c = time.perf_counter()
    s2, d, r = episode(state)
    _ = int(d)
    _progress(f"pallas: warmup episode {time.perf_counter() - t_c:.1f}s; "
              "timing 8 episodes …")

    # Aggregate (headline): one readback for all episodes.
    iters = 8
    deliv_parts = []
    t0 = time.perf_counter()
    for i in range(iters):
        state = reset_all(i)
        state, d, r = episode(state)
        deliv_parts.append(d)
    total_d = int(sum(deliv_parts))
    dt = time.perf_counter() - t0
    assert total_d > 0, "no deliveries — engine dynamics look broken"
    agg_sps = B * T * iters / dt

    # Per-episode spread diagnostic: each timing pays its own readback.
    ep_times = []
    for i in range(4):
        state = reset_all(100 + i)
        t1 = time.perf_counter()
        state, d, r = episode(state)
        _ = int(d)
        ep_times.append(round(time.perf_counter() - t1, 4))

    # Floor-calibrated headline (VERDICT r3 item 7): null-jit readback
    # floor + MIN over per-episode timings — min filters slow-tunnel
    # episodes, the floor removes the readback tax, so THIS number is
    # the cross-round-comparable one (the wall-clock aggregate above
    # conflates kernel quality with chip/tunnel weather).
    from warehouse_tpu.utils.profiling import readback_floor

    floor = readback_floor()
    cal_denom = min(ep_times) - floor
    cal_sps = B * T / cal_denom if cal_denom > 0 else None
    # Roofline position of the calibrated episode (VERDICT r4 item 1).
    from warehouse_tpu.utils import roofline as rl

    roof = (rl.report(rl.greedy_rollout_cost(cfg, B), cal_denom)
            if cal_denom and cal_denom > 0 else None)
    return agg_sps, ep_times, cal_sps, roof


def bench_engine(jax, jnp):
    from warehouse_tpu import medium_config
    from warehouse_tpu.baselines.greedy import greedy_actions
    from warehouse_tpu.env import engine
    from warehouse_tpu.env.batch import step_autoreset_batch

    cfg = medium_config(auto_reset=True)
    B, T = 8192, 256

    @jax.jit
    def reset_all(seed):
        keys = jax.vmap(
            lambda i: jax.random.fold_in(jax.random.PRNGKey(seed), i)
        )(jnp.arange(B))
        state, _ = jax.vmap(lambda k: engine.reset(cfg, k))(keys)
        return state

    @jax.jit
    def rollout(state):
        def body(s, _):
            a = jax.vmap(lambda ss: greedy_actions(cfg, ss))(s)
            # Canonical general-policy path: auto-reset cond-gated at
            # the batch level (bit-exact vs in-step, tests/test_autoreset).
            s, ts = step_autoreset_batch(cfg, s, a)
            return s, ts.delivered.sum()
        s, dels = jax.lax.scan(body, state, None, length=T)
        return s, dels.sum()

    _progress(f"engine: compiling greedy rollout (B={B}, T={T}) …")
    state = reset_all(0)
    _, d = rollout(state)
    _ = int(d)
    _progress("engine: timing …")
    best = None
    for i in range(3):
        state = reset_all(i)
        t0 = time.perf_counter()
        _, d = rollout(state)
        assert int(d) >= 0
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return B * T / best


def bench_trained(jax, jnp, family="ppo", backend="pallas"):
    """Trained-path throughput for one trainer family at BASELINE
    config 4 shapes, DEFAULT TrainConfig SGD cadence."""
    from warehouse_tpu.config import TrainConfig, medium_config

    tcfg = TrainConfig(num_envs=4096, unroll_length=16,
                       rollout_backend=backend)
    if family == "ppo":
        from warehouse_tpu.train.ppo import make_train

        if backend == "pallas":
            # The fully fused trained path: act kernel + one-launch
            # SGD-phase kernel (pallas/sgd.py) — 12.5M env-steps/s
            # measured vs 8.3M with XLA grads (docs/RESULTS.md r3s1).
            tcfg = tcfg.replace(grad_backend="pallas")
        trainer = make_train(medium_config(), tcfg)
    elif family == "impala":
        from warehouse_tpu.train.impala import make_train_impala

        trainer = make_train_impala(medium_config(), tcfg)
    elif family in ("ppo_rnn", "lstm"):
        from warehouse_tpu.train.ppo_rnn import make_train_rnn

        if backend == "pallas":
            # Recurrent fast path: f32 GRU/LSTM act kernel + the fused
            # bf16 sequence-replay SGD kernel (pallas/sgd_rnn.py, round
            # 4; grad_backend="auto" resolves to it on the chip). bf16
            # matmuls are the measured win — the replay is matmul-bound
            # (docs/RESULTS.md r3s1/r4).
            tcfg = tcfg.replace(model_dtype="bfloat16")
        cell = "lstm" if family == "lstm" else "gru"
        trainer = make_train_rnn(medium_config(), tcfg, arch=cell)
    else:
        raise SystemExit(f"unknown trained family {family!r}")
    _progress(f"{family}[{backend}]: compiling train_many (config 4) …")
    rs = trainer.init(jax.random.PRNGKey(0))
    # 150 updates per timed block: timing is gated on a host readback
    # (the honest gate on this tunneled chip), which costs ~25 ms — at
    # 50 updates that tax was still ~7% of a 4 ms/update family
    # (round-5 act speedups made the tax visible again; 150 amortizes
    # it under 2% while staying well inside the axon watchdog bound).
    n = 150
    rs, m = trainer.train_many(rs, n)
    _ = float(m["loss"][-1])
    _progress(f"{family}[{backend}]: timing …")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        rs, m = trainer.train_many(rs, n)
        _ = float(m["loss"][-1])
        times.append(time.perf_counter() - t0)
    best = min(times)
    # Spread across timed blocks: chip-weather diagnostic (a wide
    # spread means tunnel variance, not a code regression).
    spread = round(max(times) / best, 2)
    # Roofline position (VERDICT r4 item 1): analytic FLOPs/bytes per
    # update vs the v5e peaks (warehouse_tpu/utils/roofline.py).
    from warehouse_tpu.utils import roofline as rl

    roof = rl.report(rl.family_cost(family, medium_config(), tcfg),
                     best / n)
    return (n * tcfg.num_envs * tcfg.unroll_length / best, spread,
            trainer.backends, roof)


def run_path(path: str) -> None:
    """Child-process entry: run ONE bench path, print its JSON result."""
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if path == "pallas":
        sps, ep_times, cal_sps, roof = bench_pallas(jax, jnp)
        out = {"sps": sps, "ep_times": ep_times, "cal_sps": cal_sps,
               "roofline": roof, "n_chips": jax.device_count()}
    elif path == "engine":
        out = {"sps": bench_engine(jax, jnp)}
    elif path in ("ppo", "impala", "ppo_rnn", "lstm"):
        # Trained paths: the fused Pallas act-phase backend
        # (pallas/act.py); each falls back to the XLA scan backend.
        try:
            sps, spread, resolved, roof = bench_trained(
                jax, jnp, path, "pallas")
            out = {"sps": sps, "spread": spread, "backend": "pallas",
                   "resolved": resolved, "roofline": roof}
        except Exception as e:
            _progress(f"{path} pallas backend FAILED: {e!r}")
            sps, spread, resolved, roof = bench_trained(
                jax, jnp, path, "xla")
            out = {"sps": sps, "spread": spread, "backend": "xla",
                   "resolved": resolved, "roofline": roof}
    else:
        raise SystemExit(f"unknown path {path!r}")
    print("RESULT " + json.dumps(out))


def _run_isolated(path: str):
    """Run one bench path in a subprocess with a budget; None on
    hang/crash (see PATH_BUDGET_S)."""
    _progress(f"{path}: starting (budget {PATH_BUDGET_S[path]}s) …")
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--path", path],
            capture_output=True, text=True,
            timeout=PATH_BUDGET_S[path],
        )
    except subprocess.TimeoutExpired:
        _progress(f"{path} path TIMED OUT — reporting null")
        return None
    sys.stderr.write(proc.stderr)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    _progress(f"{path} path FAILED (rc={proc.returncode}) — null")
    return None


def main() -> None:
    pallas = _run_isolated("pallas")
    engine = _run_isolated("engine")
    ppo = _run_isolated("ppo")
    impala = _run_isolated("impala")
    ppo_rnn = _run_isolated("ppo_rnn")
    lstm = _run_isolated("lstm")

    pallas_sps = pallas["sps"] if pallas else None
    ep_times = pallas["ep_times"] if pallas else []
    engine_sps = engine["sps"] if engine else None
    ppo_sps = ppo["sps"] if ppo else None
    ppo_backend = ppo["backend"] if ppo else None

    # Headline: the fused greedy kernel; degrade to the engine path if
    # the kernel path was unavailable this run.
    n_chips = pallas["n_chips"] if pallas else 1
    headline = pallas_sps if pallas_sps else (engine_sps or 0)
    per_chip = headline / n_chips
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(per_chip),
                "unit": (
                    "env-steps/s/chip (9x9 grid, 4 agents, greedy baseline,"
                    f" fused Pallas rollout, B=131072, full 128-step"
                    " episodes incl. reset)"
                ),
                "vs_baseline": round(per_chip / PER_CHIP_TARGET, 3),
                "engine_path_steps_per_s": (
                    round(engine_sps) if engine_sps else None
                ),
                "ppo_trained_steps_per_s": (
                    round(ppo_sps) if ppo_sps else None
                ),
                "ppo_backend": ppo_backend if ppo_sps else None,
                # RESOLVED backends per trained family ({"rollout":
                # ..., "grad": ...}) — which compute paths actually
                # produced each number (VERDICT r3 item 6).
                "ppo_resolved": ppo.get("resolved") if ppo else None,
                "impala_resolved": (
                    impala.get("resolved") if impala else None
                ),
                "ppo_rnn_resolved": (
                    ppo_rnn.get("resolved") if ppo_rnn else None
                ),
                "ppo_vs_baseline": (
                    round(ppo_sps / PER_CHIP_TARGET, 3) if ppo_sps else None
                ),
                "ppo_spread": ppo.get("spread") if ppo else None,
                "impala_steps_per_s": (
                    round(impala["sps"]) if impala else None
                ),
                "impala_backend": impala["backend"] if impala else None,
                "impala_spread": (
                    impala.get("spread") if impala else None
                ),
                "ppo_rnn_steps_per_s": (
                    round(ppo_rnn["sps"]) if ppo_rnn else None
                ),
                "ppo_rnn_backend": (
                    ppo_rnn["backend"] if ppo_rnn else None
                ),
                "ppo_rnn_spread": (
                    ppo_rnn.get("spread") if ppo_rnn else None
                ),
                "lstm_steps_per_s": (
                    round(lstm["sps"]) if lstm else None
                ),
                "lstm_backend": lstm["backend"] if lstm else None,
                "lstm_spread": lstm.get("spread") if lstm else None,
                "lstm_resolved": lstm.get("resolved") if lstm else None,
                "pallas_episode_s": ep_times,
                "pallas_episode_spread": (
                    round(max(ep_times) / min(ep_times), 2)
                    if ep_times and min(ep_times) > 0 else None
                ),
                # Floor-calibrated per-step greedy number — use THIS
                # for cross-round comparisons (min episode minus the
                # null-readback floor; weather-insensitive).
                "pallas_calibrated_steps_per_s": (
                    round(pallas["cal_sps"])
                    if pallas and pallas.get("cal_sps") else None
                ),
                # Roofline positions per path (VERDICT r4 item 1):
                # achieved TFLOP/s & GB/s vs v5e peaks + speed-of-light
                # fraction, from the analytic cost models
                # (warehouse_tpu/utils/roofline.py; docs/RESULTS.md
                # "roofline" section for the per-phase split).
                "roofline": {
                    "greedy": pallas.get("roofline") if pallas else None,
                    "ppo": ppo.get("roofline") if ppo else None,
                    "impala": impala.get("roofline") if impala else None,
                    "ppo_rnn": (
                        ppo_rnn.get("roofline") if ppo_rnn else None
                    ),
                    "lstm": lstm.get("roofline") if lstm else None,
                },
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--path":
        run_path(sys.argv[2])
    else:
        main()
