"""PBT trainer tests: exploit/explore loop, knobs, and the (pop, data)
mesh path (SURVEY.md §4.5 — 8 fake CPU devices from conftest)."""

import pytest
import numpy as np

from warehouse_tpu import TrainConfig, small_config


def tiny(**tkw):
    env_cfg = small_config(max_steps=8)
    t = dict(num_envs=8, unroll_length=4, num_minibatches=2, ppo_epochs=2,
             hidden_dim=16)
    t.update(tkw)
    return env_cfg, TrainConfig(**t)


def test_pbt_run_end_to_end(tmp_path):
    from warehouse_tpu.train.pbt import run_pbt

    env_cfg, tcfg = tiny()
    res = run_pbt(
        env_cfg, tcfg,
        {"learning_rate": {"loguniform": [1e-4, 1e-2]},
         "entropy_coef": {"uniform": [0.005, 0.02]}},
        population_size=4, perturb_interval=2, num_intervals=2,
        out_path=str(tmp_path / "pbt.jsonl"),
    )
    assert res.best["best_member"] in range(4)
    rows = [r for r in res.rows if "member" in r]
    assert len(rows) == 4 * 2
    assert all(np.isfinite(r["score"]) for r in rows)
    assert (tmp_path / "pbt.jsonl").exists()


def test_pbt_with_knobs_smoke():
    """PBT honors mask_actions/shaping/adaptive-KL/bootstrap (the knobs
    it silently lacked before the shared-core refactor)."""
    import jax

    from warehouse_tpu.train.pbt import make_pbt_trainer

    env_cfg, tcfg = tiny(mask_actions=True, shaping_coef=0.02,
                         kl_coeff=0.2, bootstrap_truncated=True)
    init_members, train_chunk, get_lr, with_hp = make_pbt_trainer(
        env_cfg, tcfg)
    member = init_members(jax.random.PRNGKey(0),
                          np.full(2, 3e-4), np.full(2, 0.01))
    member, metrics = train_chunk(member, 2)
    assert np.asarray(member.kl_coeff).shape == (2,)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k


@pytest.mark.slow
def test_pbt_meshed_pop_times_data():
    """Population sharded over `pop` × env batch sharded over `data` on
    the 8-device virtual mesh; run_pbt end-to-end incl. the cross-shard
    exploit gather."""
    import jax

    from warehouse_tpu.parallel.mesh import make_pop_mesh
    from warehouse_tpu.train.pbt import make_pbt_trainer, run_pbt

    env_cfg, tcfg = tiny()
    mesh = make_pop_mesh(2, jax.devices()[:8])  # (pop=2, data=4)
    init_members, train_chunk, get_lr, with_hp = make_pbt_trainer(
        env_cfg, tcfg, mesh=mesh)
    member = init_members(jax.random.PRNGKey(0),
                          np.full(4, 3e-4), np.full(4, 0.01))
    member, metrics = train_chunk(member, 2)
    assert np.asarray(metrics["loss"]).shape == (4, 2)
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k

    res = run_pbt(
        env_cfg, tcfg, {"learning_rate": {"loguniform": [1e-4, 1e-2]}},
        population_size=4, perturb_interval=2, num_intervals=2, mesh=mesh,
    )
    assert np.isfinite(res.best["best_score"])


def test_pbt_pop_sharded_matches_unmeshed():
    """Pure population sharding (data=1) computes the same per-member
    updates as the single-device vmap."""
    import jax

    from warehouse_tpu.parallel.mesh import make_pop_mesh
    from warehouse_tpu.train.pbt import make_pbt_trainer

    env_cfg, tcfg = tiny()
    lrs = np.array([3e-4, 1e-3, 3e-3, 1e-4])
    ents = np.full(4, 0.01)

    im_u, tc_u, _, _ = make_pbt_trainer(env_cfg, tcfg)
    m_u = im_u(jax.random.PRNGKey(1), lrs, ents)
    m_u, met_u = tc_u(m_u, 2)

    mesh = make_pop_mesh(4, jax.devices()[:4])  # (pop=4, data=1)
    im_m, tc_m, _, _ = make_pbt_trainer(env_cfg, tcfg, mesh=mesh)
    m_m = im_m(jax.random.PRNGKey(1), lrs, ents)
    m_m, met_m = tc_m(m_m, 2)

    for a, b in zip(jax.tree.leaves(m_u.params), jax.tree.leaves(m_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(met_u["loss"]),
                               np.asarray(met_m["loss"]),
                               rtol=1e-5, atol=1e-6)
