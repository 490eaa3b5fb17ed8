"""Checkpoint/resume: bit-identical restore (SURVEY.md §5.4)."""

import numpy as np
import pytest

from warehouse_tpu import TrainConfig, small_config


def test_save_restore_roundtrip(tmp_path):
    import jax

    from warehouse_tpu.train import checkpoint as ckpt
    from warehouse_tpu.train.ppo import make_train

    trainer = make_train(
        small_config(max_steps=8),
        TrainConfig(num_envs=8, unroll_length=4, num_minibatches=2,
                    ppo_epochs=1, hidden_dim=16),
    )
    rs = trainer.init(jax.random.PRNGKey(0))
    rs, _ = trainer.train_step(rs)

    d = str(tmp_path / "ckpts")
    ckpt.save(d, 1, rs)
    assert ckpt.latest_step(d) == 1

    restored_step, restored = ckpt.restore_latest(d, rs)
    assert restored_step == 1
    for a, b in zip(jax.tree.leaves(rs), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Training continues identically from the restored state.
    rs_a, m_a = trainer.train_step(rs)
    rs_b, m_b = trainer.train_step(restored)
    assert float(m_a["loss"]) == float(m_b["loss"])
    for a, b in zip(jax.tree.leaves(rs_a.params), jax.tree.leaves(rs_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_empty(tmp_path):
    from warehouse_tpu.train import checkpoint as ckpt

    assert ckpt.latest_step(str(tmp_path / "nope")) is None
    assert ckpt.restore_latest(str(tmp_path / "nope"), None) is None
