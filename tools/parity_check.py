"""The PR1 parity gate harness (SURVEY.md §3.5).

Runs K seeds × T steps of the greedy baseline through:
  1. the NumPy oracle (readable spec),
  2. the JAX engine (jit, B=1),
  3. the C++ batched engine (injected draws),
and asserts bit-exact agreement on states, obs, rewards, and returns.

The oracle↔REFERENCE leg is stubbed: /root/reference is an empty mount
(SURVEY.md §0). When it becomes readable, run the SURVEY.md §8 extraction
checklist, amend docs/SEMANTICS.md, then implement `run_reference()`
below against the real env class and re-run this script — every
implementation difference will surface here first.

Usage: python tools/parity_check.py [--seeds 8] [--steps 128] [--env small]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH) and bool(os.listdir(REFERENCE_PATH))


def run_reference(cfg, seed, steps):  # pragma: no cover - blocked on mount
    raise NotImplementedError(
        "implement against the real reference env once /root/reference is "
        "non-empty (SURVEY.md §8)"
    )


def check_seed(cfg, seed: int, steps: int) -> dict:
    import jax

    from warehouse_tpu import rng as _rng
    from warehouse_tpu.baselines.greedy import greedy_actions as jx_greedy
    from warehouse_tpu.env import engine
    from warehouse_tpu.oracle import JaxDrawSource, OracleEnv
    from warehouse_tpu.oracle import greedy_actions as np_greedy

    key = jax.random.PRNGKey(seed)
    oenv = OracleEnv(cfg, JaxDrawSource(key))
    oobs = oenv.reset()
    jstate, jobs = engine.reset(cfg, key)
    np.testing.assert_array_equal(oobs, np.asarray(jobs))

    native = None
    try:
        from warehouse_tpu.native import NativeBatchedEnv

        native = NativeBatchedEnv(cfg, 1)
        native.load_state(0, jstate)
    except Exception as e:
        print(f"  [native engine unavailable: {e}]")

    total = np.zeros(cfg.num_agents, np.float32)
    for t in range(steps):
        oa = np_greedy(cfg, oenv.state)
        ja = np.asarray(jx_greedy(cfg, jstate))
        np.testing.assert_array_equal(oa, ja, err_msg=f"actions t={t}")
        if native is not None:
            np.testing.assert_array_equal(
                native.greedy_actions()[0], ja, err_msg=f"native act t={t}"
            )
            draws = _rng.step_draws(jstate.key, cfg)
            nrew, _, _, _ = native.step(
                ja[None], np.asarray(draws.spawn_u)[None],
                np.asarray(draws.spawn_pick)[None],
                np.asarray(draws.spawn_drop)[None],
            )
        oobs, orew, _, otrunc, _ = oenv.step(oa)
        jstate, ts = engine.step(cfg, jstate, ja)
        np.testing.assert_array_equal(oobs, np.asarray(ts.obs),
                                      err_msg=f"obs t={t}")
        np.testing.assert_array_equal(orew, np.asarray(ts.reward),
                                      err_msg=f"rew t={t}")
        np.testing.assert_array_equal(
            oenv.state.agent_pos, np.asarray(jstate.agent_pos),
            err_msg=f"pos t={t}",
        )
        if native is not None:
            np.testing.assert_array_equal(
                native.agent_pos[0], np.asarray(jstate.agent_pos),
                err_msg=f"native pos t={t}",
            )
            np.testing.assert_array_equal(nrew[0], orew,
                                          err_msg=f"native rew t={t}")
        total += orew
    return {"seed": seed, "return": [round(float(x), 4) for x in total]}


def main() -> None:
    p = argparse.ArgumentParser("parity_check")
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--env", default="small",
                   choices=["small", "medium", "large", "shelves"])
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from warehouse_tpu.configs_cli import _PRESETS

    cfg = _PRESETS[args.env](max_steps=1 << 30)

    print(f"parity check: {args.env}, {args.seeds} seeds x {args.steps} steps")
    for seed in range(args.seeds):
        r = check_seed(cfg, seed, args.steps)
        print(f"  seed {seed}: BIT-EXACT (oracle==engine==native), "
              f"returns {r['return']}")

    if reference_available():
        print("REFERENCE MOUNT IS NON-EMPTY — run SURVEY.md §8 and "
              "implement run_reference().")
        sys.exit(2)
    else:
        print("reference leg: SKIPPED (/root/reference is empty — "
              "SURVEY.md §0)")
    print("PARITY OK")


if __name__ == "__main__":
    main()
