"""Two-process loopback-DCN smoke (SURVEY.md §4.5) run as a subprocess
of the suite — validates jax.distributed + cross-process collectives in
the sharded B&B."""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "multihost_smoke.py")


def test_two_process_sharded_bnb():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # workers set their own device counts
    r = subprocess.run(
        [sys.executable, os.path.abspath(SCRIPT)],
        capture_output=True, text=True, timeout=260, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(SCRIPT))))
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "PASS" in r.stdout


FAULT_SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                            "fault_injection.py")


def test_fault_injection_and_resume():
    """SURVEY.md §5: kill one of two processes mid-study; restart resumes
    from the per-step checkpoint and matches the uninterrupted run."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.abspath(FAULT_SCRIPT)],
        capture_output=True, text=True, timeout=480, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(FAULT_SCRIPT))))
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    assert "PASS" in r.stdout
