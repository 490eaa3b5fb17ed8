"""Sweep harness tests (Ray Tune capability parity, SURVEY.md §3.1).

Runs on the CPU backend (conftest) with tiny shapes.
"""

import json

import numpy as np

from warehouse_tpu import TrainConfig, small_config
from warehouse_tpu.train.sweep import run_sweep, run_trial


def _tiny_tcfg(**kw):
    base = dict(num_envs=8, unroll_length=4, num_updates=3,
                num_minibatches=2, ppo_epochs=1, hidden_dim=16,
                num_layers=1)
    base.update(kw)
    return TrainConfig(**base)


def test_sweep_grid_rows_and_best(tmp_path):
    cfg = small_config(max_steps=8)
    out = tmp_path / "sweep.jsonl"
    rows, best = run_sweep(
        cfg, _tiny_tcfg(),
        grid={"learning_rate": [3e-4, 1e-3], "entropy_coef": [0.01]},
        num_seeds=2, last_k=2, out_path=str(out),
    )
    # 2 grid points x 2 seeds + 1 summary row.
    assert len(rows) == 5
    assert best["num_trials"] == 2
    assert best["best_trial"] in (0, 1)
    assert best["best_overrides"]["learning_rate"] in (3e-4, 1e-3)
    assert len(best["all_scores"]) == 2
    # File round-trips as JSONL and matches the returned rows.
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 5
    assert lines[-1]["summary"] is True
    # Every trial row carries finite score + final metrics.
    for r in lines[:-1]:
        assert np.isfinite(r["score"])
        assert np.isfinite(r["final"]["loss"])


def test_vmapped_seeds_match_sequential():
    """Seed replica s of the vmapped trial == a standalone run with the
    same derived key (the vmap axis must not perturb training)."""
    import jax

    from warehouse_tpu.train.ppo import make_train

    cfg = small_config(max_steps=8)
    tcfg = _tiny_tcfg(num_updates=2)
    _, metrics_v = run_trial(cfg, tcfg, num_seeds=2)

    trainer = make_train(cfg, tcfg)
    key = jax.random.fold_in(jax.random.PRNGKey(tcfg.seed), 1)
    rs = trainer.init(key)
    _, metrics_s = trainer.train_many(rs, 2)

    for k in metrics_v:
        np.testing.assert_allclose(
            metrics_v[k][1], np.asarray(metrics_s[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_sweep_reproducible():
    cfg = small_config(max_steps=8)
    grid = {"learning_rate": [1e-3]}
    _, best1 = run_sweep(cfg, _tiny_tcfg(), grid, num_seeds=1, last_k=2)
    _, best2 = run_sweep(cfg, _tiny_tcfg(), grid, num_seeds=1, last_k=2)
    assert best1["best_score_mean"] == best2["best_score_mean"]


def test_sweep_mode_min():
    cfg = small_config(max_steps=8)
    rows, best = run_sweep(
        cfg, _tiny_tcfg(), {"learning_rate": [3e-4, 1e-3]},
        num_seeds=1, select_metric="loss", mode="min", last_k=2,
    )
    scores = best["all_scores"]
    assert best["best_trial"] == int(np.argmin(scores))


def test_sweep_cli(tmp_path):
    from warehouse_tpu.train.sweep import main

    out = tmp_path / "s.jsonl"
    main([
        "--env", "small",
        "--env-config", '{"max_steps": 8}',
        "--grid", '{"learning_rate": [0.001]}',
        "--seeds", "1", "--updates", "2", "--num-envs", "8",
        "--unroll", "4", "--out", str(out), "--cpu",
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[-1]["summary"] is True
