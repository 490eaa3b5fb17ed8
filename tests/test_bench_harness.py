"""bench.py's subprocess isolation: a hung/failed path degrades to
null instead of sinking the bench (the 2026-08-20 tunnel-outage mode:
a wedged remote-compile RPC blocks inside PJRT C++, uninterruptible)."""

from __future__ import annotations

import importlib.util
import json
import subprocess
import sys


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", "/root/repo/bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_timed_out_path_degrades_to_null(monkeypatch, tmp_path):
    bench = _load_bench()
    monkeypatch.setitem(bench.PATH_BUDGET_S, "engine", 1)
    # The child would spin up jax on this host; with a 1 s budget it is
    # guaranteed to hit TimeoutExpired and must return None, not hang.
    assert bench._run_isolated("engine") is None


def test_crashed_path_degrades_to_null(monkeypatch):
    bench = _load_bench()

    def fake_run(cmd, **kw):
        class P:
            returncode = 3
            stdout = "no result line here\n"
            stderr = ""
        return P()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._run_isolated("pallas") is None


def test_result_line_parsed(monkeypatch):
    bench = _load_bench()
    payload = {"sps": 123.0, "ep_times": [0.1], "n_chips": 1}

    def fake_run(cmd, **kw):
        class P:
            returncode = 0
            stdout = "noise\nRESULT " + json.dumps(payload) + "\n"
            stderr = ""
        return P()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    assert bench._run_isolated("pallas") == payload


def test_main_emits_json_with_all_paths_null(monkeypatch, capsys):
    """Even with every path unavailable the bench prints ONE valid JSON
    line (the driver contract) with null fields and value 0."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_run_isolated", lambda p: None)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert d["metric"] == "env_steps_per_sec_per_chip"
    assert d["value"] == 0
    assert d["ppo_trained_steps_per_s"] is None
    assert d["engine_path_steps_per_s"] is None
    assert d["lstm_steps_per_s"] is None
