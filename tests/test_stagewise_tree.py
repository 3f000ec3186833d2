"""Scenario-tree MIQP over the stagewise O(N) frame
(ops/stagewise_tree.py — VERDICT r3 item 6: long-horizon tree MPC).
Parity reference is the condensed consensus path, compared in a COMMON
frame: each frame drops a different data-dependent constant (x0/ω
terms), so raw objectives differ by design — plans are evaluated with
the condensed H, f."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.control.mpc import MpcController
from pyhybridcontrol_tpu.mld.info import MldInfo
from pyhybridcontrol_tpu.mld.model import MldModel
from pyhybridcontrol_tpu.models.double_integrator import (
    default_weights, switched_double_integrator)
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.ops.scenario_tree import ScenarioTree
from pyhybridcontrol_tpu.ops.stagewise_tree import (
    assemble_stagewise_tree, prepare_stagewise_tree,
    solve_tree_miqp_stagewise, stagewise_tree_admm_solve)
from pyhybridcontrol_tpu.solver.bnb import BnbSpec


def _omega_model():
    base = switched_double_integrator()
    m = base.numpy_mats()
    return MldModel.from_matrices(
        MldInfo(nx=2, nu=1, ndelta=1, nz=1, nomega=1, ny=2,
                ncons=base.info.ncons),
        A=m.A, B1=m.B1, B3=m.B3, B4=np.array([[0.0], [1.0]]),
        C=m.C, E=m.E, F1=m.F1, F2=m.F2, F3=m.F3, f5=m.f5)


@pytest.fixture(scope="module")
def tree_prob():
    model = _omega_model()
    rng = np.random.default_rng(3)
    S, N = 4, 6
    paths = rng.normal(0.0, 0.3, size=(S, N, 1))
    tree = ScenarioTree.from_branching(paths, branch_steps=(1, 3))
    return model, tree


def _J_tree_condensed(c, tree, x0, V_sn):
    """Evaluate an (S, n_cond) plan in the condensed frame, p-weighted."""
    H = np.asarray(c.H)
    probs = np.asarray(tree.probs)
    om = np.asarray(tree.omega_paths)
    tot = 0.0
    for s in range(tree.S):
        fs, _ = c.assemble_np(np.asarray(x0), om[s])
        tot += probs[s] * (0.5 * V_sn[s] @ H @ V_sn[s] + fs @ V_sn[s])
    return tot


def test_rep_dedup_matches_condensed(tree_prob):
    """Same information-set structure as the condensed consensus path:
    1 + 2*2 + 4*3 = 17 coupled delta representatives."""
    from pyhybridcontrol_tpu.ops.consensus_tree import (
        prepare_tree_consensus)

    model, tree = tree_prob
    c = CondensedMpc(model, tree.N, default_weights())
    tqp = prepare_tree_consensus(c, tree)
    swt = prepare_stagewise_tree(model, tree, default_weights())
    assert len(swt.binary_reps) == len(tqp.binary_reps) == 17


def test_tree_relaxation_nonanticipative(tree_prob):
    """Converged consensus relaxation agrees across every information
    set on the shared u/delta coordinates."""
    model, tree = tree_prob
    swt = prepare_stagewise_tree(model, tree, default_weights())
    q, l, u = assemble_stagewise_tree(swt, jnp.asarray([2.0, 0.0]))
    r = stagewise_tree_admm_solve(swt, q, l, u, iters=1500)
    assert float(r.r_prim_rel) < 1e-3
    V = np.asarray(r.x)                       # (S, N, b)
    g = np.asarray(tree.groups)
    for k in range(tree.N):
        for gid in np.unique(g[:, k]):
            mem = np.nonzero(g[:, k] == gid)[0]
            vals = V[mem, k, 0]
            assert vals.max() - vals.min() < 2e-3


@pytest.mark.slow
def test_tree_miqp_matches_condensed_consensus(tree_prob):
    """Full tree MIQP: the stagewise-frame optimum equals the condensed
    consensus optimum when both plans are evaluated in the condensed
    frame, and the first stage is genuinely shared."""
    from pyhybridcontrol_tpu.ops.consensus_tree import (
        assemble_tree, prepare_tree_consensus, solve_tree_miqp)

    model, tree = tree_prob
    x0 = jnp.asarray([2.0, 0.0], jnp.float32)
    spec = BnbSpec(capacity=256, wave_size=32, max_waves=48,
                   qp_iters=600, probe_iters=3000)
    c = CondensedMpc(model, tree.N, default_weights())
    tqp = prepare_tree_consensus(c, tree)
    tqp_p = prepare_tree_consensus(c, tree, rho=10.0)
    f, h = assemble_tree(tqp, x0)
    ref = solve_tree_miqp(tqp, f, h, spec, tqp_probe=tqp_p)

    swt = prepare_stagewise_tree(model, tree, default_weights())
    swt_p = prepare_stagewise_tree(model, tree, default_weights(),
                                   rho=10.0)
    q, l, u = assemble_stagewise_tree(swt, x0)
    res = solve_tree_miqp_stagewise(swt, q, l, u, spec, swt_probe=swt_p)
    assert bool(ref.found) and bool(res.found)

    S, N = tree.S, tree.N
    nv, b = swt.sw.nv, swt.sw.b
    xi = np.asarray(res.x).reshape(S, N, b)
    V_swt = xi[:, :, :nv].reshape(S, -1)
    V_ref = np.asarray(ref.x).reshape(S, -1)
    J_swt = _J_tree_condensed(c, tree, x0, V_swt)
    J_ref = _J_tree_condensed(c, tree, x0, V_ref)
    np.testing.assert_allclose(J_swt, J_ref, rtol=5e-3, atol=5e-3)
    u0 = xi[:, 0, 0]
    assert u0.max() - u0.min() < 2e-3
    # the decoupled certified bound is a valid lower bound in ITS frame:
    # re-solve with rel_gap to exercise the gap statement
    gapped = solve_tree_miqp_stagewise(
        swt, q, l, u,
        BnbSpec(capacity=256, wave_size=32, max_waves=48, qp_iters=600,
                probe_iters=3000, rel_gap=0.3),
        swt_probe=swt_p)
    bo = float(gapped.best_open_bound)
    if np.isfinite(bo) and bo < 1e29:
        assert bo <= float(res.obj) + 1e-3


@pytest.mark.slow
def test_controller_stagewise_tree(tree_prob):
    """Controller-level API: solver='stagewise' + set_scenario_tree is
    now supported (the round-3 restriction) and returns the same
    first-stage input as the condensed consensus controller."""
    model, tree = tree_prob
    x0 = jnp.asarray([2.0, 0.0], jnp.float32)
    spec = BnbSpec(capacity=256, wave_size=32, max_waves=48,
                   qp_iters=600, probe_iters=3000)
    out = {}
    for solver in ("bnb", "stagewise"):
        ctrl = MpcController(model, tree.N, weights=default_weights(),
                             bnb_spec=spec, qp_iters=600, solver=solver)
        ctrl.set_scenario_tree(tree, consensus=True)
        out[solver] = ctrl.feedback(x0)
    assert bool(out["bnb"].found) and bool(out["stagewise"].found)
    np.testing.assert_allclose(np.asarray(out["stagewise"].u),
                               np.asarray(out["bnb"].u), atol=2e-2)


def _tree_consistent_paths(rng, S, N, branch_steps, sd=0.1):
    """Promoted to the public API (round 5 — the bench's N=120 tree
    reproduced the i.i.d.-path probe-starvation failure verbatim):
    ops/scenario_tree.tree_consistent_paths is the implementation."""
    from pyhybridcontrol_tpu.ops.scenario_tree import (
        tree_consistent_paths)

    return tree_consistent_paths(rng, S, N, branch_steps, sd=sd)


@pytest.mark.slow
def test_tree_long_horizon_smoke():
    """The point of the composition: an N=60 scenario-tree MIQP — whose
    dense joint condensed H would be O((S·N·nv)²) — solves in the O(N)
    frame and returns a feasible, non-anticipative plan."""
    model = _omega_model()
    rng = np.random.default_rng(7)
    S, N = 4, 60
    paths = _tree_consistent_paths(rng, S, N, (1, 30))
    tree = ScenarioTree.from_branching(paths, branch_steps=(1, 30))
    swt = prepare_stagewise_tree(model, tree, default_weights())
    swt_p = prepare_stagewise_tree(model, tree, default_weights(),
                                   rho=10.0)
    q, l, u = assemble_stagewise_tree(swt, jnp.asarray([2.0, 0.0]))
    spec = BnbSpec(capacity=128, wave_size=16, max_waves=8,
                   qp_iters=400, probe_iters=1600, probe_patience=2)
    res = solve_tree_miqp_stagewise(swt, q, l, u, spec, swt_probe=swt_p)
    assert bool(res.found)
    xi = np.asarray(res.x).reshape(S, N, swt.sw.b)
    u0 = xi[:, 0, 0]
    assert u0.max() - u0.min() < 5e-3    # shared first stage


def test_tree_extra_rows_matches_joint_oracle():
    """Horizon-coupled extra rows x scenario trees (round 4 — the last
    stagewise-frame refusal, removed): a per-scenario input-budget row
    rides the shared bordered Woodbury factors batched over the
    scenario axis. Parity vs the fp64 enumeration oracle on the dense
    joint problem with the row block-replicated per scenario."""
    from pyhybridcontrol_tpu.ops.scenario_tree import (
        build_scenario_tree_qp)
    from pyhybridcontrol_tpu.ops.stagewise_tree import (
        assemble_stagewise_tree_ext)
    from pyhybridcontrol_tpu.solver.oracle import (
        solve_miqp_enumeration_oracle)

    model = _omega_model()
    rng = np.random.default_rng(7)
    S, N = 2, 4
    paths = rng.normal(0.0, 0.3, size=(S, N, 1))
    tree = ScenarioTree.from_branching(paths, branch_steps=(1,))
    w = default_weights()
    nv = model.info.nv
    A_v = np.zeros((1, N * nv))
    A_v[0, 0::nv] = 1.0                     # per-scenario sum of u
    b_e = np.array([-0.8])
    x0 = np.array([2.0, 0.0])

    c1 = CondensedMpc(model, N, w)
    joint = build_scenario_tree_qp(c1, tree)
    A_joint = np.zeros((S, S * N * nv))
    for s in range(S):
        A_joint[s, s * N * nv:(s + 1) * N * nv] = A_v[0]
    joint = joint.with_extra_constraints(A_joint, np.repeat(b_e, S))
    W = np.asarray(tree.omega_paths, np.float64).reshape(S * N, 1)
    fo, ho = joint.assemble_np(x0, W)
    orc = solve_miqp_enumeration_oracle(
        joint.H, fo, joint.G, ho, joint.lb, joint.ub,
        joint.binary_idx)
    assert orc.status == "optimal"

    swt = prepare_stagewise_tree(model, tree, w, extra=(A_v, b_e))
    swt_p = prepare_stagewise_tree(model, tree, w, rho=10.0,
                                   extra=(A_v, b_e))
    assert swt.sw.n_ext == 1
    q, l, u = assemble_stagewise_tree(swt, jnp.asarray(x0, jnp.float32))
    ue = assemble_stagewise_tree_ext(swt, jnp.asarray(x0, jnp.float32))
    assert ue.shape == (S, 1)
    spec = BnbSpec(capacity=256, wave_size=32, max_waves=48,
                   qp_iters=600, probe_iters=3000)
    res = solve_tree_miqp_stagewise(swt, q, l, u, spec, swt_probe=swt_p,
                                    ext_u=ue)
    assert bool(res.found)

    b = swt.sw.b
    xi = np.asarray(res.x).reshape(S, N, b)
    V = xi[:, :, :nv].reshape(-1).astype(np.float64)
    J_dev = float(0.5 * V @ joint.H @ V + fo @ V)
    np.testing.assert_allclose(J_dev, orc.obj, rtol=5e-3, atol=5e-3)
    # budget holds per scenario and binds for at least one
    sums = xi[:, :, 0].sum(axis=1)
    assert np.all(sums <= -0.8 + 2e-3)
    assert np.any(sums >= -0.8 - 5e-2)
    # first stage genuinely shared
    u0 = xi[:, 0, 0]
    assert u0.max() - u0.min() < 2e-3
