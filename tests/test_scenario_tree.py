"""Scenario-tree MPC (SURVEY.md §2a / BASELINE config 4): branching
forecasts with non-anticipativity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc, MpcWeights
from pyhybridcontrol_tpu.ops.scenario_tree import (
    ScenarioTree, build_scenario_tree_qp, tree_price_seq)
from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb


def _omega_model():
    """Double integrator + additive disturbance on velocity."""
    import numpy as np

    base = switched_double_integrator()
    m = base.numpy_mats()
    from pyhybridcontrol_tpu.mld.info import MldInfo
    from pyhybridcontrol_tpu.mld.model import MldModel

    info = base.info
    return MldModel.from_matrices(
        MldInfo(nx=2, nu=1, ndelta=1, nz=1, nomega=1, ny=2,
                ncons=info.ncons),
        A=m.A, B1=m.B1, B3=m.B3, B4=np.array([[0.0], [1.0]]),
        C=m.C, E=m.E, F1=m.F1, F2=m.F2, F3=m.F3, f5=m.f5)


def test_tree_groups_from_branching():
    S, N = 4, 6
    omega = np.zeros((S, N, 1))
    tree = ScenarioTree.from_branching(omega, branch_steps=(0, 3))
    # before step 3: grouped in pairs; after: all distinct
    np.testing.assert_array_equal(tree.groups[:, 0], [0, 0, 1, 1])
    np.testing.assert_array_equal(tree.groups[:, 2], [0, 0, 1, 1])
    np.testing.assert_array_equal(tree.groups[:, 3], [0, 1, 2, 3])


def test_scenario_tree_non_anticipativity():
    """Scenarios diverging at step 2 must share decisions for k < 2."""
    model = _omega_model()
    N, S = 4, 2
    c = CondensedMpc(model, N, default_weights())
    rng = np.random.default_rng(0)
    omega = np.zeros((S, N, 1))
    omega[0, 2:] = 0.8       # scenario 0: pushed after step 2
    omega[1, 2:] = -0.8
    tree = ScenarioTree.from_branching(omega, branch_steps=(2,))
    joint = build_scenario_tree_qp(c, tree)
    qp = joint.device_qp()
    admm = prepare_admm_mpc(joint)
    x0 = np.array([1.0, 0.0], np.float32)
    W = jnp.asarray(omega.reshape(S * N, 1), jnp.float32)
    f, h = qp.assemble(jnp.asarray(x0), W)
    res = solve_miqp_bnb(admm, qp, f, h,
                         BnbSpec(capacity=512, wave_size=32, qp_iters=500,
                                 max_waves=48))
    assert bool(res.found)
    V = np.asarray(res.x).reshape(S, N, model.info.nv)
    # shared prefix: u, δ equal for k < 2
    np.testing.assert_allclose(V[0, :2, :2], V[1, :2, :2], atol=2e-2)
    # diverged tail: controls may differ (they should, given ±ω push)
    assert not np.allclose(V[0, 2:, 0], V[1, 2:, 0], atol=1e-2)


def test_scenario_tree_matches_single_when_identical():
    """A 2-scenario tree with IDENTICAL paths reproduces the
    single-scenario solution."""
    model = _omega_model()
    N, S = 4, 2
    c = CondensedMpc(model, N, default_weights())
    omega = np.full((S, N, 1), 0.3)
    tree = ScenarioTree.from_branching(omega, branch_steps=(2,))
    joint = build_scenario_tree_qp(c, tree)
    qps, admms = joint.device_qp(), prepare_admm_mpc(joint)
    x0 = np.array([1.5, 0.5], np.float32)
    W = jnp.asarray(omega.reshape(S * N, 1), jnp.float32)
    f, h = qps.assemble(jnp.asarray(x0), W)
    spec = BnbSpec(capacity=512, wave_size=32, qp_iters=500, max_waves=48)
    r_tree = solve_miqp_bnb(admms, qps, f, h, spec)

    qp1, admm1 = c.device_qp(), prepare_admm_mpc(c)
    f1, h1 = qp1.assemble(jnp.asarray(x0), jnp.asarray(omega[0],
                                                       jnp.float32))
    r_one = solve_miqp_bnb(admm1, qp1, f1, h1, spec)
    assert bool(r_tree.found) and bool(r_one.found)
    # tree objective = Σ p_s · J_s = J_single when scenarios coincide
    np.testing.assert_allclose(float(r_tree.obj), float(r_one.obj),
                               rtol=5e-3, atol=5e-3)
    V0 = np.asarray(r_tree.x).reshape(S, N, model.info.nv)[0]
    V1 = np.asarray(r_one.x).reshape(N, model.info.nv)
    np.testing.assert_allclose(V0[:, 0], V1[:, 0], atol=3e-2)


def test_tree_price_seq_weighting():
    omega = np.zeros((2, 3, 1))
    tree = ScenarioTree.from_branching(omega, probs=np.array([0.7, 0.3]),
                                       branch_steps=(1,))
    ps = tree_price_seq(tree, np.ones((3, 4)))
    assert ps.shape == (6, 4)
    np.testing.assert_allclose(ps[:3], 0.7)
    np.testing.assert_allclose(ps[3:], 0.3)


def test_controller_scenario_tree_feedback():
    """set_scenario_tree: controller-level stochastic MPC must match the
    ops-level joint solve (same tree, same spec)."""
    from pyhybridcontrol_tpu.control.mpc import MpcController

    model = _omega_model()
    N, S = 4, 2
    omega = np.zeros((S, N, 1))
    omega[0, 2:] = 0.8
    omega[1, 2:] = -0.8
    tree = ScenarioTree.from_branching(omega, branch_steps=(2,))
    spec = BnbSpec(capacity=512, wave_size=32, qp_iters=500, max_waves=48)

    ctrl = MpcController(model, N, default_weights(), bnb_spec=spec)
    ctrl.set_scenario_tree(tree)
    sol = ctrl.feedback(jnp.asarray(np.array([1.0, 0.0], np.float32)))
    assert bool(sol.found)
    assert sol.v_seq.shape == (S * N, model.info.nv)

    # ops-level reference (the pre-existing flow)
    c = CondensedMpc(model, N, default_weights())
    joint = build_scenario_tree_qp(c, tree)
    qp, admm = joint.device_qp(), prepare_admm_mpc(joint)
    W = jnp.asarray(omega.reshape(S * N, 1), jnp.float32)
    f, h = qp.assemble(jnp.asarray(np.array([1.0, 0.0], np.float32)), W)
    ref = solve_miqp_bnb(admm, qp, f, h, spec)
    np.testing.assert_allclose(float(sol.obj), float(ref.obj),
                               rtol=1e-3, atol=1e-3)
    # first-stage input is the non-anticipative shared decision
    V = np.asarray(sol.v_seq).reshape(S, N, model.info.nv)
    np.testing.assert_allclose(V[0, :2], V[1, :2], atol=2e-2)

    # transforms on top of a tree are rejected with a clear error
    ctrl2 = MpcController(model, N, default_weights())
    ctrl2.set_scenario_tree(tree)
    ctrl2.set_soft_constraints([0])
    with pytest.raises(ValueError):
        ctrl2.build()
