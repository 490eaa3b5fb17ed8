"""utils/: profiling + debug helpers."""

import pytest
import os

import numpy as np


def test_steps_per_second_meter():
    import time

    from warehouse_tpu.utils import StepsPerSecond

    m = StepsPerSecond()
    assert m.update(100) == 0.0  # first call establishes t0
    time.sleep(0.01)
    r = m.update(100)
    assert r > 0


@pytest.mark.slow
def test_trace_writes_files(tmp_path):
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.utils import annotate, trace

    d = str(tmp_path / "trace")
    with trace(d):
        with annotate("smoke"):
            jnp.ones(8).sum().block_until_ready()
    found = any(files for _, _, files in os.walk(d))
    assert found, "no trace files written"


def test_check_state_invariants_flags_corruption():
    import jax
    import jax.numpy as jnp

    from warehouse_tpu import small_config
    from warehouse_tpu.env import engine
    from warehouse_tpu.utils.debug import check_state_invariants

    cfg = small_config()
    state, _ = engine.reset(cfg, jax.random.PRNGKey(0))
    assert bool(check_state_invariants(cfg, state))
    # Corrupt: both agents on the same cell.
    bad = state.replace(
        agent_pos=jnp.zeros_like(state.agent_pos)
    )
    assert not bool(check_state_invariants(cfg, bad))
    # Corrupt: carrying without a request.
    bad2 = state.replace(carrying=jnp.ones_like(state.carrying))
    assert not bool(check_state_invariants(cfg, bad2))


def test_assert_replicated_in_sync():
    import jax
    import jax.numpy as jnp

    from warehouse_tpu.utils.debug import assert_replicated_in_sync

    x = jnp.ones((8, 8))
    assert_replicated_in_sync({"a": x})  # single shard: trivially in sync


def test_roofline_cost_models():
    """Analytic roofline models (utils/roofline.py): positive costs,
    sane relative ordering, and report classification."""
    from warehouse_tpu import TrainConfig, medium_config
    from warehouse_tpu.utils import roofline as rl

    cfg = medium_config()
    tcfg = TrainConfig(num_envs=4096, unroll_length=16)

    costs = {f: rl.family_cost(f, cfg, tcfg)
             for f in ("ppo", "impala", "gru", "lstm", "cnn")}
    for c in costs.values():
        assert c.mxu_flops > 0 and c.hbm_bytes > 0 and c.vpu_ops > 0
        assert c.unit_env_steps == 4096 * 16
    # CNN torso (convs + dense trunk) > plain MLP on learner FLOPs.
    assert costs["cnn"].mxu_flops > costs["ppo"].mxu_flops
    # LSTM (4 gates) > GRU (3 gates) > PPO MLP; IMPALA (1 pass) < PPO
    # (4 epochs) on learner FLOPs.
    assert costs["lstm"].mxu_flops > costs["gru"].mxu_flops
    assert costs["gru"].mxu_flops > costs["ppo"].mxu_flops
    assert costs["impala"].mxu_flops < costs["ppo"].mxu_flops
    # SGD-phase FLOPs scale linearly in epochs.
    sgd4 = rl.ppo_sgd_cost(cfg, tcfg)
    sgd8 = rl.ppo_sgd_cost(cfg, tcfg.replace(ppo_epochs=8))
    assert abs(sgd8.mxu_flops - 2 * sgd4.mxu_flops) < 1e-6 * sgd8.mxu_flops

    # Greedy: zero matmuls, VPU-classified.
    g = rl.greedy_rollout_cost(cfg, 1024)
    assert g.mxu_flops == 0 and g.vpu_ops > 0
    rep = rl.report(g, 1.0)
    assert rep["bound"] == "vpu" and rep["mxu_pct"] == 0.0

    # Report arithmetic: sol_frac = sol_ms / measured ms; a measured
    # time equal to the SoL time reports sol_frac 1.0.
    c = costs["ppo"]
    sol_s = max(c.mxu_flops / rl.MXU_PEAK, c.hbm_bytes / rl.HBM_PEAK,
                c.vpu_ops / rl.VPU_PEAK)
    rep = rl.report(c, sol_s)
    assert abs(rep["sol_frac"] - 1.0) < 1e-6
    assert rep["bound"] == "mxu"
