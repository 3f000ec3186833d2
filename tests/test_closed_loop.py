"""Closed-loop engine tests (SURVEY.md §4.4): receding-horizon scan,
parity between B&B and enumeration controllers, batched scenarios,
golden-trajectory regression."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.loop import closed_loop, make_mpc_step
from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.solver.bnb import BnbSpec

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "double_integrator_N6_T10.npz")


@pytest.fixture(scope="module")
def ctrl():
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    qp = c.device_qp()
    admm = prepare_admm_mpc(c)
    return model, c, qp, admm


def test_closed_loop_regulates(ctrl):
    model, c, qp, admm = ctrl
    step = make_mpc_step(model, qp, admm, method="bnb",
                         bnb_spec=BnbSpec(capacity=128, wave_size=16,
                                          qp_iters=400))
    x0 = jnp.asarray([2.0, 0.0])
    res = closed_loop(model, step, x0, T=10)
    assert res.xs.shape == (11, 2)
    assert bool(res.found.all())
    # regulation: terminal state much closer to origin
    assert float(jnp.linalg.norm(res.xs[-1])) < 0.3 * float(
        jnp.linalg.norm(x0))
    # dynamics consistency: x_{k+1} = step(x_k, v_k)
    for k in [0, 4, 9]:
        want = model.step_v(res.xs[k], res.vs[k])
        np.testing.assert_allclose(res.xs[k + 1], want, rtol=1e-5, atol=1e-6)


def test_bnb_matches_enumeration_closed_loop(ctrl):
    model, c, qp, admm = ctrl
    sb = make_mpc_step(model, qp, admm, method="bnb",
                       bnb_spec=BnbSpec(capacity=256, wave_size=16,
                                        qp_iters=600))
    se = make_mpc_step(model, qp, admm, method="enumerate", qp_iters=600)
    x0 = jnp.asarray([2.0, 0.0])
    rb = closed_loop(model, sb, x0, T=8)
    re = closed_loop(model, se, x0, T=8)
    # warm-started B&B probes can evaluate a leaf slightly BETTER than
    # the cold fixed-iteration enumeration, after which the trajectories
    # (legitimately) diverge on near-ties — compare total cost + states,
    # not per-step objectives
    np.testing.assert_allclose(float(np.sum(np.asarray(rb.objs))),
                               float(np.sum(np.asarray(re.objs))),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(rb.xs), np.asarray(re.xs),
                               rtol=1e-2, atol=1e-2)


def test_batched_scenarios_vmap(ctrl):
    model, c, qp, admm = ctrl
    step = make_mpc_step(model, qp, admm, method="bnb",
                         bnb_spec=BnbSpec(capacity=64, wave_size=8,
                                          qp_iters=150))
    x0s = jnp.asarray([[2.0, 0.0], [-1.0, 0.5], [0.5, -0.5], [3.0, 1.0]])
    run = jax.vmap(lambda x0: closed_loop(model, step, x0, T=5))
    res = run(x0s)
    assert res.xs.shape == (4, 6, 2)
    # batched row equals solo run
    solo = closed_loop(model, step, x0s[1], T=5)
    np.testing.assert_allclose(np.asarray(res.xs[1]), np.asarray(solo.xs),
                               rtol=1e-4, atol=1e-4)


def test_golden_trajectory_regression(ctrl):
    """SURVEY.md §4.4: committed golden trajectory for BASELINE config 1."""
    model, c, qp, admm = ctrl
    step = make_mpc_step(model, qp, admm, method="enumerate", qp_iters=600)
    x0 = jnp.asarray([2.0, 0.0])
    res = closed_loop(model, step, x0, T=10)
    xs = np.asarray(res.xs)
    total_cost = float(np.sum(np.asarray(res.objs)))
    if not os.path.exists(GOLDEN):
        if os.environ.get("PHC_REGEN_GOLDENS"):
            os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
            np.savez(GOLDEN, xs=xs, vs=np.asarray(res.vs),
                     total_cost=total_cost)
            pytest.skip("golden regenerated (PHC_REGEN_GOLDENS)")
        pytest.fail("golden file missing — goldens are committed "
                    "artifacts; set PHC_REGEN_GOLDENS=1 to regenerate")
    g = np.load(GOLDEN)
    np.testing.assert_allclose(xs, g["xs"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(total_cost, float(g["total_cost"]),
                               rtol=1e-3)


@pytest.mark.slow
def test_closed_loop_batch_pooled_matches_vmap(ctrl):
    """Pooled batched closed loop (round 4: the chip-scale closed-LOOP
    study engine — loop/closed_loop.py closed_loop_batch) produces the
    same trajectories as vmapping the single-instance loop: pooling
    changes the per-step schedule, never the per-instance search
    semantics."""
    from pyhybridcontrol_tpu.loop.closed_loop import (
        closed_loop_batch, make_mpc_step_batch)

    model, c, qp, admm = ctrl
    probe = prepare_admm_mpc(c, rho=10.0)
    spec = BnbSpec(capacity=64, wave_size=64, max_waves=512,
                   qp_iters=400, probe_iters=1000)
    B, T = 4, 6
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.normal(0, 1.2, (B, 2)).astype(np.float32))

    step_b = make_mpc_step_batch(model, qp, admm, bnb_spec=spec,
                                 pool_slots=16 * B, admm_probe=probe)
    rb = closed_loop_batch(model, step_b, x0s, T)

    spec1 = BnbSpec(capacity=64, wave_size=16, max_waves=128,
                    qp_iters=400, probe_iters=1000)
    step1 = make_mpc_step(model, qp, admm, method="bnb", bnb_spec=spec1,
                          admm_probe=probe)
    rv = jax.vmap(lambda x: closed_loop(model, step1, x, T))(x0s)

    assert bool(np.all(np.asarray(rb.found)))
    assert bool(np.all(np.asarray(rv.found)))
    # xs: pooled logs are (T+1, B, nx); vmapped are (B, T+1, nx)
    np.testing.assert_allclose(
        np.asarray(rb.xs).transpose(1, 0, 2), np.asarray(rv.xs),
        atol=5e-3)
    # per-step objectives agree to solver tolerance (different warm-
    # start paths land on different near-converged iterates; the
    # trajectory agreement above is the binding check)
    np.testing.assert_allclose(
        np.asarray(rb.objs).T, np.asarray(rv.objs), rtol=5e-3, atol=5e-3)
