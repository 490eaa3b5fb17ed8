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
