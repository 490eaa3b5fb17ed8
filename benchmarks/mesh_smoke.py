"""Real Mosaic under shard_map on the real chip, 1-device mesh
(VERDICT r3 item 5).

The Pallas-under-shard_map composition had only ever executed in
interpret mode on CPU fake devices (docs/ARCHITECTURE.md honest-limit
note). This smoke builds a ``make_mesh(jax.devices()[:1])`` mesh ON
TPU and runs the fully fused train steps (act kernel + SGD kernels,
``pallas_interpret=False``) through the EXACT shard_map code path the
multi-chip deployment uses — proving the Mosaic-under-shard_map
lowering and the grads-variant kernels (ppo_minibatch_grads_pallas /
ppo_rnn_minibatch_grads_pallas + psum/pmean collectives) execute on
hardware. It cannot prove multi-device ICI (one chip on this machine);
it closes everything short of that.

Checks: finite metrics for (a) fused feed-forward PPO, (b) fused
recurrent PPO, (c) fused PPO with policy groups — each meshed — plus a
meshed-vs-unmeshed metrics cross-check for (a) (same seed; the meshed
path runs per-minibatch grad kernels + XLA optimizer instead of the
whole-phase kernel, so metrics agree to f32 tolerance, not bit-exact).

Usage: python benchmarks/mesh_smoke.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    import jax

    from warehouse_tpu.config import TrainConfig, medium_config
    from warehouse_tpu.parallel.mesh import make_mesh
    from warehouse_tpu.train.ppo import make_train
    from warehouse_tpu.train.ppo_rnn import make_train_rnn
    from warehouse_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "this smoke must run on TPU"
    mesh = make_mesh(jax.devices()[:1])
    print(f"mesh: {mesh}", file=sys.stderr)

    env_cfg = medium_config()
    tcfg = TrainConfig(num_envs=2048, unroll_length=16,
                       rollout_backend="pallas", pallas_block=512,
                       grad_backend="pallas")
    results = {}

    # (a) fused FF PPO, meshed vs unmeshed.
    tr_mesh = make_train(env_cfg, tcfg, mesh=mesh)
    rs = tr_mesh.shard_runner_state(tr_mesh.init(jax.random.PRNGKey(0)))
    rs, m_mesh = tr_mesh.train_step(rs)
    m_mesh = {k: float(v) for k, v in m_mesh.items()}
    assert all(abs(v) < 1e6 for v in m_mesh.values())
    tr_solo = make_train(env_cfg, tcfg)
    rs2 = tr_solo.init(jax.random.PRNGKey(0))
    rs2, m_solo = tr_solo.train_step(rs2)
    m_solo = {k: float(v) for k, v in m_solo.items()}
    diffs = {k: abs(m_mesh[k] - m_solo[k]) for k in m_mesh}
    assert all(d < 2e-3 + 1e-2 * abs(m_solo[k])
               for k, d in diffs.items()), diffs
    results["ppo_fused_meshed"] = {"metrics": m_mesh,
                                   "max_abs_diff_vs_unmeshed":
                                   max(diffs.values())}

    # (b) fused recurrent PPO, meshed.
    tr_rnn = make_train_rnn(
        env_cfg, tcfg.replace(model_dtype="bfloat16"), arch="gru",
        mesh=mesh)
    rsr = tr_rnn.shard_runner_state(tr_rnn.init(jax.random.PRNGKey(1)))
    rsr, m_rnn = tr_rnn.train_step(rsr)
    m_rnn = {k: float(v) for k, v in m_rnn.items()}
    assert all(abs(v) < 1e6 for v in m_rnn.values())
    results["ppo_rnn_fused_meshed"] = {"metrics": m_rnn}

    # (c) fused PPO with policy groups, meshed.
    tr_pg = make_train(env_cfg, tcfg, mesh=mesh,
                       policy_groups=(0, 1, 0, 1))
    rsg = tr_pg.shard_runner_state(tr_pg.init(jax.random.PRNGKey(2)))
    rsg, m_pg = tr_pg.train_step(rsg)
    m_pg = {k: float(v) for k, v in m_pg.items()}
    assert all(abs(v) < 1e6 for v in m_pg.values())
    results["ppo_groups_fused_meshed"] = {"metrics": m_pg}

    print(json.dumps({"mesh_smoke": "ok", "devices": 1,
                      **{k: round(v["metrics"]["loss"], 6)
                         for k, v in results.items()}}))


if __name__ == "__main__":
    main()
