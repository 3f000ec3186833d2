"""B&B invariant property tests (SURVEY.md §4.6): incumbent monotone
non-increasing in wave budget; frontier empty at clean termination;
determinism; vmapped multi-instance solving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb

BIG = 1e30


@pytest.fixture(scope="module")
def prob():
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    qp = c.device_qp()
    admm = prepare_admm_mpc(c)
    x0 = np.array([2.0, 0.0], np.float32)
    f, h = qp.assemble(jnp.asarray(x0))
    return qp, admm, f, h


def test_incumbent_monotone_in_wave_budget(prob):
    qp, admm, f, h = prob
    objs = []
    for mw in (1, 2, 4, 8, 16, 32):
        r = solve_miqp_bnb(admm, qp, f, h,
                           BnbSpec(capacity=128, wave_size=8, max_waves=mw,
                                   qp_iters=400))
        objs.append(float(r.obj))
    # more waves can only improve (or keep) the incumbent
    for a, b in zip(objs, objs[1:]):
        assert b <= a + 1e-5, objs


def test_frontier_empty_at_termination(prob):
    qp, admm, f, h = prob
    r = solve_miqp_bnb(admm, qp, f, h,
                       BnbSpec(capacity=256, wave_size=16, max_waves=64,
                               qp_iters=400))
    # terminated before the wave budget → no open nodes remain
    assert int(r.waves) < 64
    assert float(r.best_open_bound) >= BIG * 0.99


def test_single_device_determinism(prob):
    qp, admm, f, h = prob
    spec = BnbSpec(capacity=128, wave_size=8, qp_iters=300)
    r1 = solve_miqp_bnb(admm, qp, f, h, spec)
    r2 = solve_miqp_bnb(admm, qp, f, h, spec)
    assert float(r1.obj) == float(r2.obj)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))
    assert int(r1.nodes_solved) == int(r2.nodes_solved)


def test_incumbent_bounds_enumeration_from_above(prob):
    """Any incumbent (even with a tiny wave budget) is a valid UPPER
    bound on the true optimum."""
    qp, admm, f, h = prob
    from pyhybridcontrol_tpu.solver.enumerate import (
        solve_miqp_enumerate_device)

    _, obj_true, _, _ = solve_miqp_enumerate_device(admm, qp, f, h,
                                                    iters=600)
    r = solve_miqp_bnb(admm, qp, f, h,
                       BnbSpec(capacity=64, wave_size=4, max_waves=3,
                               qp_iters=400))
    if bool(r.found):
        assert float(r.obj) >= float(obj_true) - 5e-3


def test_vmapped_multi_instance(prob):
    """Config-4 style: vmap the whole B&B solver over instances."""
    qp, admm, f, h = prob
    rng = np.random.default_rng(1)
    B = 8
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    fs, hs = jax.vmap(qp.assemble)(x0s)
    spec = BnbSpec(capacity=64, wave_size=8, max_waves=32, qp_iters=300)
    rb = jax.jit(jax.vmap(
        lambda f_, h_: solve_miqp_bnb(admm, qp, f_, h_, spec)))(fs, hs)
    assert rb.obj.shape == (B,)
    solo = solve_miqp_bnb(admm, qp, fs[2], hs[2], spec)
    np.testing.assert_allclose(float(rb.obj[2]), float(solo.obj),
                               rtol=1e-4, atol=1e-4)


def test_spec_validation():
    import pytest

    with pytest.raises(ValueError):
        BnbSpec(capacity=8, wave_size=16)
    with pytest.raises(ValueError):
        BnbSpec(capacity=1, wave_size=1)
    BnbSpec(capacity=16, wave_size=16)   # boundary is fine


def test_overflow_keeps_gap_conservative():
    """Pool overflow drops children; their unexplored subtrees may hold
    the optimum, so the certified lower bound (best_open_bound) must
    fold the dropped bounds in: min(incumbent, best_open) <= true
    optimum must hold even under heavy overflow."""
    from pyhybridcontrol_tpu.solver.oracle import (
        solve_miqp_enumeration_oracle)

    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)

    # big-M pwa: degenerate relaxations, no pruning → a 6-slot pool on
    # a 9-binary tree must overflow
    model = pwa_spring_mld(on_off=True)
    c = CondensedMpc(model, 3, pwa_weights())
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    x0 = np.array([1.5, 0.0], np.float32)
    f, h = qp.assemble(jnp.asarray(x0))
    fo, ho = c.assemble_np(x0)
    orc = solve_miqp_enumeration_oracle(c.H, fo, c.G, ho, c.lb, c.ub,
                                        c.binary_idx)
    spec = BnbSpec(capacity=6, wave_size=2, max_waves=24, qp_iters=300,
                   probe_iters=1500, presolve_fix=False)
    r = solve_miqp_bnb(admm, qp, f, h, spec,
                       admm_probe=prepare_admm_mpc(c, rho=10.0))
    assert bool(r.overflow)
    lower_claim = min(float(r.obj), float(r.best_open_bound))
    assert lower_claim <= orc.obj + 1e-3, (
        lower_claim, orc.obj, float(r.best_open_bound))
