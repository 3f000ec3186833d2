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
