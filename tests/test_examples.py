"""Examples stay runnable (the reference's notebook-as-validation role,
SURVEY.md §4 — here executable scripts smoke-run in the suite)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=240):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), "--cpu",
         *args],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


def test_double_integrator_study():
    out = _run("double_integrator_study.py", "--steps", "8")
    assert "all steps solved: True" in out


def test_dewh_dsm_study():
    out = _run("dewh_dsm_study.py", "--hours", "3")
    assert "all MIQPs solved: True" in out


def test_micro_grid_study():
    out = _run("micro_grid_study.py", "--steps", "3", "--agents", "2")
    assert "agent 0 history" in out


def test_serve_loop():
    """Serving surface: ready banner, ping, solve, graceful bad input."""
    reqs = "\n".join(['{"cmd": "ping"}', '{"x": [2.0, 0.0]}',
                      'not json', '{"cmd": "quit"}']) + "\n"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-m", "pyhybridcontrol_tpu.serve",
         "--config", "double_integrator", "--cpu"],
        input=reqs, capture_output=True, text=True, timeout=300,
        cwd=REPO, env=env)
    lines = [l for l in r.stdout.splitlines() if l.strip()]
    assert r.returncode == 0, r.stderr[-1500:]
    import json as _json

    recs = [_json.loads(l) for l in lines]
    assert recs[0]["ready"] and recs[1]["pong"]
    assert recs[2]["found"] and len(recs[2]["u"]) == 1
    assert "error" in recs[3]


def test_scenario_tree_study():
    out = _run("scenario_tree_study.py", "--scenarios", "2",
               "--horizon", "4")
    assert "study ok: True" in out
    assert "hedging value" in out


def test_pwa_formulation_study():
    out = _run("pwa_formulation_study.py", "--N", "6", "--waves", "6",
               timeout=420)
    assert "hull <= bigm: True" in out
