"""Condensation correctness (SURVEY.md §4.1): condensed operators vs
naive rollout, constraint equivalence, objective equivalence, move
blocking, soft constraints."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.condense import CondensedMpc, MpcWeights


@pytest.fixture(scope="module")
def setup():
    model = switched_double_integrator()
    N = 6
    c = CondensedMpc(model, N, default_weights())
    return model, N, c


def _np_rollout(model, x0, v_seq):
    """Naive float64 rollout of the MLD dynamics."""
    m = model.numpy_mats()
    info = model.info
    Bv = np.hstack([m.B1, m.B2, m.B3])
    xs = [np.asarray(x0, np.float64)]
    for k in range(v_seq.shape[0]):
        xs.append(m.A @ xs[-1] + Bv @ v_seq[k] + m.b5[:, 0])
    return np.stack(xs)


def test_prediction_operators_match_rollout(setup, rng):
    model, N, c = setup
    info = model.info
    x0 = rng.normal(size=2)
    V = rng.uniform(-1, 1, size=(N, info.nv))
    xs = _np_rollout(model, x0, V)
    X_pred = c.pred.Phi @ x0 + c.pred.Gv @ V.reshape(-1) + c.pred.Gc
    np.testing.assert_allclose(X_pred.reshape(N, 2), xs[1:], atol=1e-10)
    Xt_pred = c.pred.Phi_t @ x0 + c.pred.Gv_t @ V.reshape(-1) + c.pred.Gc_t
    np.testing.assert_allclose(Xt_pred.reshape(N, 2), xs[:-1], atol=1e-10)


def test_stacked_constraints_equal_stagewise(setup, rng):
    model, N, c = setup
    info = model.info
    m = model.numpy_mats()
    Fv = np.hstack([m.F1, m.F2, m.F3])
    x0 = rng.normal(size=2) * 0.5
    V = rng.uniform(-1, 1, size=(N, info.nv))
    xs = _np_rollout(model, x0, V)
    stage = np.concatenate(
        [m.E @ xs[k] + Fv @ V[k] - m.f5[:, 0] for k in range(N)])
    f, h = c.assemble_np(x0)
    cond = c.G @ V.reshape(-1) - h
    np.testing.assert_allclose(cond, stage, atol=1e-9)


def test_objective_equals_stage_sum(setup, rng):
    """½VᵀHV + fᵀV differences must equal stage-cost differences
    (the constant offset cancels between two V's)."""
    model, N, c = setup
    info = model.info
    w = default_weights()
    x0 = rng.normal(size=2)

    def stage_cost(V):
        xs = _np_rollout(model, x0, V)
        J = 0.0
        Qx = np.diag(np.asarray(w.Qx, np.float64))
        QxN = np.diag(np.asarray(w.QxN, np.float64))
        Ru = np.diag(np.atleast_1d(w.Ru))
        for k in range(N):
            xk1 = xs[k + 1]
            Q = QxN if k == N - 1 else Qx
            J += xk1 @ Q @ xk1
            u, d, z = V[k][:1], V[k][1:2], V[k][2:]
            J += u @ Ru @ u + np.asarray(w.qdelta) @ d
        return J

    def qp_obj(V):
        f, _ = c.assemble_np(x0)
        v = V.reshape(-1)
        return 0.5 * v @ c.H @ v + f @ v

    V1 = rng.uniform(-1, 1, size=(N, info.nv))
    V2 = rng.uniform(-1, 1, size=(N, info.nv))
    dJ = stage_cost(V1) - stage_cost(V2)
    dQ = qp_obj(V1) - qp_obj(V2)
    # reg term adds reg*|V|² noise (~1e-8), allow for it
    np.testing.assert_allclose(dQ, dJ, rtol=1e-6, atol=1e-5)


def test_rate_weight_changes_objective(rng):
    model = switched_double_integrator()
    N = 4
    w = MpcWeights(Qx=np.array([1.0, 0.1]), Ru=np.array([0.1]),
                   Rdu=np.array([2.0]))
    c = CondensedMpc(model, N, w)
    x0 = np.zeros(2)
    V = rng.uniform(-1, 1, size=(N, model.info.nv))
    u_prev = np.array([0.7])
    f, _ = c.assemble_np(x0, u_prev=u_prev)
    v = V.reshape(-1)
    got = 0.5 * v @ c.H @ v + f @ v
    # manual: base cost + Σ Δuᵀ Rdu Δu with u_{-1}=u_prev; offset terms
    # in u_prev cancel in differences
    c0 = CondensedMpc(model, N, MpcWeights(Qx=np.array([1.0, 0.1]),
                                           Ru=np.array([0.1])))
    f0, _ = c0.assemble_np(x0)
    base = 0.5 * v @ c0.H @ v + f0 @ v
    us = np.concatenate([u_prev, V[:, 0]])
    rate = 2.0 * np.sum(np.diff(us) ** 2)
    const = 2.0 * u_prev[0] ** 2   # (u_0−u_prev)² expands: u_prev² term
    np.testing.assert_allclose(got + const, base + rate, rtol=1e-6, atol=1e-8)


def test_move_blocking_map(setup):
    model, N, c = setup
    info = model.info
    groups = [0, 0, 0, 1, 1, 1]
    cb = c.with_move_blocking(groups)
    nu = info.nu
    # u blocked; δ and z stay per-step (blocking auxiliaries breaks
    # logic encodings — e.g. startup flags)
    assert cb.nV == 2 * nu + N * (info.ndelta + info.nz)
    assert len(cb.binary_idx) == N * info.ndelta   # δ binaries per-step
    Vb = np.arange(cb.nV, dtype=np.float64)
    full = (cb.T_full @ Vb).reshape(N, info.nv)
    np.testing.assert_allclose(full[0, :nu], full[2, :nu])
    np.testing.assert_allclose(full[3, :nu], full[5, :nu])
    assert not np.allclose(full[0, :nu], full[3, :nu])
    # δ and z entries remain per-step
    assert not np.allclose(full[0, nu:], full[1, nu:])
    # opt-in joint blocking still available
    cj = c.with_move_blocking(groups, block_deltas=True)
    assert len(cj.binary_idx) == 2


def test_move_blocking_objective_consistent(setup, rng):
    """Blocked QP objective == full QP objective at the lifted point."""
    model, N, c = setup
    groups = [0, 0, 1, 1, 2, 2]
    cb = c.with_move_blocking(groups)
    x0 = rng.normal(size=2)
    Vb = rng.uniform(-1, 1, size=cb.nV)
    V = cb.T_full @ Vb
    f, h = c.assemble_np(x0)
    fb, hb = cb.assemble_np(x0)
    np.testing.assert_allclose(0.5 * Vb @ cb.H @ Vb + fb @ Vb,
                               0.5 * V @ c.H @ V + f @ V, rtol=1e-9)
    np.testing.assert_allclose(cb.G @ Vb - hb, c.G @ V - h, atol=1e-10)


def test_soft_constraints_relax_infeasible(setup):
    model, N, c = setup
    # x0 outside the state box makes the hard problem infeasible at k=0
    x0 = np.array([12.0, 0.0])
    from pyhybridcontrol_tpu.solver.oracle import solve_qp_oracle
    f, h = c.assemble_np(x0)
    hard = solve_qp_oracle(c.H, f, c.G, h, c.lb, c.ub)
    assert hard.status == "infeasible"
    # soften the state-box rows (rows 6..9 of each step block)
    m = model.info.ncons
    soft_rows = [k * m + r for k in range(N) for r in (6, 7, 8, 9)]
    cs = c.with_soft_constraints(soft_rows, lin_pen=100.0, quad_pen=10.0)
    fs, hs = cs.assemble_np(x0)
    soft = solve_qp_oracle(cs.H, fs, cs.G, hs, cs.lb, cs.ub)
    assert soft.status == "optimal"
    # slacks active (x0 can't satisfy the box instantly)
    slack = soft.x[c.nV:]
    assert slack.max() > 0.5


def test_device_qp_assemble_matches_host(setup, rng):
    model, N, c = setup
    qp = c.device_qp()
    x0 = rng.normal(size=2).astype(np.float32)
    f_np, h_np = c.assemble_np(x0)
    f_d, h_d = qp.assemble(jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(f_d), f_np, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_d), h_np, rtol=2e-4, atol=2e-4)


def test_price_seq_linear_term(setup, rng):
    model, N, c = setup
    info = model.info
    x0 = np.zeros(2)
    prices = rng.normal(size=(N, info.nv))
    f0, _ = c.assemble_np(x0)
    fp, _ = c.assemble_np(x0, price_seq=prices)
    V = rng.uniform(-1, 1, size=N * info.nv)
    np.testing.assert_allclose(fp @ V - f0 @ V,
                               prices.reshape(-1) @ V, rtol=1e-9)
