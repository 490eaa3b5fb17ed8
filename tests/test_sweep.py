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


def test_meshed_seed_axis_matches_unmeshed():
    """Sharding the seed-replica axis over the `pop` mesh axis must not
    change any trial's numbers (GSPMD partitioning of independent
    replicas; 8 fake CPU devices from conftest)."""
    import jax

    from warehouse_tpu.parallel.mesh import make_pop_mesh

    cfg = small_config(max_steps=8)
    tcfg = _tiny_tcfg(num_updates=2)
    mesh = make_pop_mesh(4, jax.devices()[:4])
    _, m_plain = run_trial(cfg, tcfg, num_seeds=4)
    _, m_mesh = run_trial(cfg, tcfg, num_seeds=4, seed_mesh=mesh)
    for k in m_plain:
        np.testing.assert_allclose(m_plain[k], m_mesh[k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)


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


def test_random_search_points():
    from warehouse_tpu.train.sweep import _random_points

    space = {
        "learning_rate": {"loguniform": [1e-5, 1e-2]},
        "entropy_coef": {"uniform": [0.0, 0.05]},
        "num_minibatches": [2, 4],
        "ppo_epochs": {"randint": [1, 5]},
    }
    pts = _random_points(space, 16, seed=3)
    assert len(pts) == 16
    assert pts == _random_points(space, 16, seed=3)       # deterministic
    assert pts != _random_points(space, 16, seed=4)
    for p in pts:
        assert 1e-5 <= p["learning_rate"] <= 1e-2
        assert 0.0 <= p["entropy_coef"] <= 0.05
        assert p["num_minibatches"] in (2, 4)
        assert 1 <= p["ppo_epochs"] < 5


def test_random_search_sweep():
    cfg = small_config(max_steps=8)
    rows, best = run_sweep(
        cfg, _tiny_tcfg(num_updates=2),
        {"learning_rate": {"loguniform": [1e-4, 1e-3]}},
        num_seeds=1, search="random", num_samples=2, last_k=2,
    )
    assert best["num_trials"] == 2
    lrs = {r["overrides"]["learning_rate"] for r in rows if "overrides" in r}
    assert len(lrs) == 2


def test_asha_successive_halving(tmp_path):
    from warehouse_tpu.train.sweep import run_asha

    cfg = small_config(max_steps=8)
    out = tmp_path / "asha.jsonl"
    rows, best = run_asha(
        cfg, _tiny_tcfg(),
        grid={"learning_rate": [1e-4, 3e-4, 1e-3, 3e-3]},
        rung_updates=(2, 2), eta=2, num_seeds=1, last_k=2,
        out_path=str(out),
    )
    # Rung 0: all 4 trials scored, exactly 2 promoted (eta=2).
    r0 = [r for r in rows if r.get("rung") == 0]
    assert len(r0) == 4
    assert sum(r["promoted"] for r in r0) == 2
    # Rung 1 (final): only the 2 survivors trained further.
    r1 = [r for r in rows if r.get("rung") == 1]
    assert len(r1) == 2
    assert all(r["updates_so_far"] == 4 for r in r1)
    # Best trial survived to the last rung.
    assert best["best_trial"] in {r["trial"] for r in r1}
    promoted_r0 = {r["trial"] for r in r0 if r["promoted"]}
    assert {r["trial"] for r in r1} == promoted_r0
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[-1]["scheduler"] == "asha"


def test_asha_cli(tmp_path):
    from warehouse_tpu.train.sweep import main

    out = tmp_path / "a.jsonl"
    main([
        "--env", "small",
        "--env-config", '{"max_steps": 8}',
        "--grid", '{"learning_rate": [0.0003, 0.001]}',
        "--seeds", "1", "--num-envs", "8", "--unroll", "4",
        "--scheduler", "asha", "--rungs", "2,2", "--eta", "2",
        "--out", str(out), "--cpu",
    ])
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[-1]["summary"] is True
    assert lines[-1]["scheduler"] == "asha"
