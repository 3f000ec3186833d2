"""Consensus-ADMM scenario-tree MIQP (ops/consensus_tree.py) vs the
dense joint build (SURVEY.md §5 scenario-tree scale-out; VERDICT
round-1 item 8). The conftest mesh is 8 virtual CPU devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.control.mpc import MpcController
from pyhybridcontrol_tpu.mld.info import MldInfo
from pyhybridcontrol_tpu.mld.model import MldModel
from pyhybridcontrol_tpu.models.double_integrator import (
    default_weights, switched_double_integrator)
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.ops.consensus_tree import (
    assemble_tree, prepare_tree_consensus, solve_tree_miqp,
    tree_admm_solve)
from pyhybridcontrol_tpu.ops.scenario_tree import ScenarioTree
from pyhybridcontrol_tpu.parallel import make_mesh
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


def test_rep_dedup(tree_prob):
    """Information-set binaries collapse to one representative: the
    S=4, N=6 tree (branch at 1 and 3) has 1+2·2+4·3 = 17 δ info sets
    vs 24 per-scenario binaries."""
    model, tree = tree_prob
    c = CondensedMpc(model, 6, default_weights())
    tqp = prepare_tree_consensus(c, tree)
    assert len(tqp.binary_reps) == 17
    # member→rep map points every coupled binary coord at its rep
    rep = np.asarray(tqp.rep_map)
    nV = tqp.nV
    for s in range(4):
        # step-0 δ shares one info set → one rep for all scenarios
        c0 = np.asarray(tqp.qp.binary_idx)[0]
        assert rep[s * nV + c0] == rep[c0]


def test_consensus_matches_dense_joint(tree_prob):
    """Same optimum and a genuinely shared first stage from both
    formulations, via the controller-level API."""
    model, tree = tree_prob
    x0 = jnp.asarray([2.0, 0.0], jnp.float32)
    spec = BnbSpec(capacity=256, wave_size=32, max_waves=48,
                   qp_iters=600, probe_iters=3000)
    out = {}
    for consensus in (False, True):
        ctrl = MpcController(model, 6, weights=default_weights(),
                             bnb_spec=spec, qp_iters=600)
        ctrl.set_scenario_tree(tree, consensus=consensus)
        out[consensus] = ctrl.feedback(x0)
    dense, cons = out[False], out[True]
    assert bool(dense.found) and bool(cons.found)
    np.testing.assert_allclose(float(cons.obj), float(dense.obj),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(cons.u), np.asarray(dense.u),
                               atol=2e-2)
    # non-anticipativity of the consensus plan itself
    V = np.asarray(cons.v_seq).reshape(tree.S, tree.N, -1)
    assert float(np.max(V[:, 0, 0]) - np.min(V[:, 0, 0])) < 1e-3


def test_consensus_relaxation_residual(tree_prob):
    """The consensus residual (|Ax − groupmean| on selector rows) is
    part of r_prim: an adversarially split tree cannot look feasible
    while scenarios disagree."""
    model, tree = tree_prob
    c = CondensedMpc(model, 6, default_weights())
    tqp = prepare_tree_consensus(c, tree)
    f, h = assemble_tree(tqp, jnp.asarray([2.0, 0.0], jnp.float32))
    lb = jnp.broadcast_to(tqp.qp.lb, (tree.S, tqp.nV))
    ub = jnp.broadcast_to(tqp.qp.ub, (tree.S, tqp.nV))
    r = tree_admm_solve(tqp, f, h, lb, ub, iters=1500)
    assert float(r.r_prim_rel) < 1e-3
    # converged ⇒ scenarios agree on every shared coordinate
    V = np.asarray(r.x)                       # (S, nV)
    g = np.asarray(tree.groups)
    nv = model.info.nv
    for k in range(tree.N):
        for gid in np.unique(g[:, k]):
            members = np.nonzero(g[:, k] == gid)[0]
            u_vals = V[members, k * nv]
            assert u_vals.max() - u_vals.min() < 2e-3


def test_consensus_sharded_mesh(tree_prob):
    """S=16 joint tree MIQP across the 8-device mesh: same result as
    the unsharded consensus solve (sharding is a layout, not a
    different algorithm)."""
    model, _ = tree_prob
    rng = np.random.default_rng(11)
    S, N = 16, 8
    paths = rng.normal(0.0, 0.25, size=(S, N, 1))
    tree = ScenarioTree.from_branching(paths, branch_steps=(1, 4))
    c = CondensedMpc(model, N, default_weights())
    tqp = prepare_tree_consensus(c, tree)
    tqp_probe = prepare_tree_consensus(c, tree, rho=10.0)
    f, h = assemble_tree(tqp, jnp.asarray([2.0, 0.0], jnp.float32))
    spec = BnbSpec(capacity=128, wave_size=16, max_waves=12,
                   qp_iters=600, probe_iters=1500, probe_patience=2)
    plain = solve_tree_miqp(tqp, f, h, spec, tqp_probe=tqp_probe)
    mesh = make_mesh([("scen", 8)])
    sharded = solve_tree_miqp(tqp, f, h, spec, scen_mesh=(mesh, "scen"),
                              tqp_probe=tqp_probe)
    assert bool(plain.found) and bool(sharded.found)
    np.testing.assert_allclose(float(sharded.obj), float(plain.obj),
                               rtol=5e-3, atol=5e-3)
