"""Stagewise O(N) QP path vs condensed/oracle (SURVEY.md §5 long-horizon
treatment): same optimum, structured operators correct, scaling in N."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.ops.stagewise import (
    StagewiseQP, _apply_A, _apply_AT, _solve_K, assemble_stagewise,
    prepare_stagewise, stagewise_admm_solve)
from pyhybridcontrol_tpu.solver.oracle import solve_qp_oracle


@pytest.fixture(scope="module")
def sw_prob():
    model = switched_double_integrator()
    N = 8
    sw = prepare_stagewise(model, N, default_weights())
    return model, N, sw


def test_apply_A_transpose_consistency(sw_prob, rng):
    """⟨Aξ, w⟩ == ⟨ξ, Aᵀw⟩ for random vectors."""
    model, N, sw = sw_prob
    xi = jnp.asarray(rng.normal(size=(N, sw.b)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(N, sw.m_k)), jnp.float32)
    lhs = float(jnp.sum(_apply_A(sw, xi) * w))
    rhs = float(jnp.sum(xi * _apply_AT(sw, w)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_solve_K_inverts(sw_prob, rng):
    """K(K⁻¹ r) == r where K is rebuilt densely from the blocks."""
    model, N, sw = sw_prob
    r = jnp.asarray(rng.normal(size=(N, sw.b)), jnp.float32)
    x = _solve_K(sw, r)
    # rebuild K densely: P + σI + Aᵀdiag(ρ)A via the structured ops
    def K_apply(v):
        Av = _apply_A(sw, v)
        return (jnp.einsum("kij,kj->ki", sw.P_diag, v) + sw.sigma * v
                + _apply_AT(sw, sw.rho_rows * Av))
    np.testing.assert_allclose(np.asarray(K_apply(x)), np.asarray(r),
                               rtol=2e-3, atol=2e-3)


def _stagewise_obj_at(sw, q, xi):
    """Evaluate the stagewise objective at a point (numpy)."""
    Px = np.einsum("kij,kj->ki", np.asarray(sw.P_diag), xi)
    return 0.5 * np.sum(xi * Px) + np.sum(np.asarray(q) * xi)


def _oracle_point_to_xi(c, oracle_x, x0, N, nx):
    V = oracle_x.reshape(N, -1)
    X = (c.pred.Phi @ x0 + c.pred.Gv @ oracle_x + c.pred.Gc).reshape(N, nx)
    return np.concatenate([V, X], axis=1)


def test_stagewise_matches_oracle_relaxation(sw_prob):
    """Stagewise ADMM == fp64 oracle on the relaxed (binaries in [0,1])
    problem. The stagewise objective keeps the x0-dependent constant the
    condensed frame drops, so compare via the stagewise frame evaluated
    at the oracle point + first-input match."""
    model, N, sw = sw_prob
    c = CondensedMpc(model, N, default_weights())
    x0 = np.array([2.0, 0.0])
    fo, ho = c.assemble_np(x0)
    oracle = solve_qp_oracle(c.H, fo, c.G, ho, c.lb, c.ub)
    assert oracle.status == "optimal"

    q, l, u = assemble_stagewise(sw, jnp.asarray(x0, jnp.float32))
    res = stagewise_admm_solve(sw, q, l, u, iters=2000)
    assert float(res.r_prim_rel) < 1e-3
    xi_oracle = _oracle_point_to_xi(c, oracle.x, x0, N, model.info.nx)
    want = _stagewise_obj_at(sw, q, xi_oracle)
    np.testing.assert_allclose(float(res.obj), want, rtol=5e-3, atol=5e-3)
    v0_stage = np.asarray(res.x)[0, : sw.nv]
    v0_oracle = oracle.x[: model.info.nv]
    np.testing.assert_allclose(v0_stage, v0_oracle, atol=2e-2)


def test_stagewise_binary_box_fixing(sw_prob):
    """Fixing the per-stage binaries via lb/ub reproduces the condensed
    fixed-assignment solve (the B&B node operation)."""
    model, N, sw = sw_prob
    c = CondensedMpc(model, N, default_weights())
    x0 = np.array([2.0, 0.0])
    bits = np.array([1.0, 1.0, 0.0, 1.0, 0.0, 0.0, 1.0, 0.0])
    fo, ho = c.assemble_np(x0)
    lb = c.lb.copy(); ub = c.ub.copy()
    lb[c.binary_idx] = bits; ub[c.binary_idx] = bits
    oracle = solve_qp_oracle(c.H, fo, c.G, ho, lb, ub)
    assert oracle.status == "optimal"

    q, l, u = assemble_stagewise(sw, jnp.asarray(x0, jnp.float32))
    lb_xi = jnp.broadcast_to(sw.lb_xi, (N, sw.b)).copy()
    ub_xi = jnp.broadcast_to(sw.ub_xi, (N, sw.b)).copy()
    bi = sw.binary_idx_v[0]
    lb_xi = lb_xi.at[:, bi].set(jnp.asarray(bits, jnp.float32))
    ub_xi = ub_xi.at[:, bi].set(jnp.asarray(bits, jnp.float32))
    res = stagewise_admm_solve(sw, q, l, u, iters=2000,
                               lb_xi=lb_xi, ub_xi=ub_xi)
    assert float(res.r_prim_rel) < 1e-3
    xi_oracle = _oracle_point_to_xi(c, oracle.x, x0, N, model.info.nx)
    want = _stagewise_obj_at(sw, q, xi_oracle)
    np.testing.assert_allclose(float(res.obj), want, rtol=5e-3, atol=5e-3)


def test_stagewise_batched(sw_prob, rng):
    model, N, sw = sw_prob
    B = 4
    x0s = rng.normal(size=(B, 2)).astype(np.float32)
    qs, ls, us = jax.vmap(
        lambda x0: assemble_stagewise(sw, x0))(jnp.asarray(x0s))
    res = stagewise_admm_solve(sw, qs, ls, us, iters=500)
    assert res.obj.shape == (B,)
    solo = stagewise_admm_solve(
        sw, qs[1], ls[1], us[1], iters=500)
    np.testing.assert_allclose(float(res.obj[1]), float(solo.obj),
                               rtol=1e-4, atol=1e-4)


def test_stagewise_long_horizon_memory():
    """N=200 builds and solves — the condensed path would need a
    (200·4)² H plus (200·12)×800 G; stagewise stays O(N)."""
    model = switched_double_integrator()
    sw = prepare_stagewise(model, 200, default_weights())
    q, l, u = assemble_stagewise(
        sw, jnp.asarray([2.0, 0.0], jnp.float32))
    res = stagewise_admm_solve(sw, q, l, u, iters=300)
    assert np.isfinite(float(res.obj))
    # factors are O(N·b²)
    assert sw.Uinv.shape == (200, sw.b, sw.b)


# ---------------------------------------------------------------------------
# feature parity: Δu / Qy / soft constraints on the O(N) path
# (VERDICT round-1 item 5 — previously condensed-frame-only)
# ---------------------------------------------------------------------------


def _true_plan_cost(model, w, x0, v_seq, u_prev=None, soft=None):
    """fp64 user-cost of a plan, evaluated OUTSIDE both solver frames:
    simulate the dynamics, sum the per-class stage costs (incl. Δu, y
    and soft-violation penalties). The strongest parity check — any
    mis-built objective block in either frame shows up here."""
    from pyhybridcontrol_tpu.ops.condense import _sq, _vec

    m = model.numpy_mats()
    info = model.info
    N = v_seq.shape[0]
    Qx = _sq(w.Qx, info.nx)
    QxN = _sq(w.QxN, info.nx) if w.QxN is not None else Qx
    Ru = _sq(w.Ru, info.nu)
    Rdu = _sq(w.Rdu, info.nu) if w.Rdu is not None else None
    Qy = _sq(w.Qy, info.ny) if (w.Qy is not None) else None
    qy = _vec(w.qy, info.ny)
    qd = _vec(w.qdelta, info.ndelta)
    J = 0.0
    x = np.asarray(x0, np.float64)
    up = (np.asarray(u_prev, np.float64) if u_prev is not None
          else np.zeros(info.nu))
    Fv = np.hstack([m.F1, m.F2, m.F3])
    Dv = np.hstack([m.D1, m.D2, m.D3])
    Bv = np.hstack([m.B1, m.B2, m.B3])
    for k in range(N):
        v = np.asarray(v_seq[k], np.float64)
        u, d, z = (v[info.u_slice], v[info.delta_slice], v[info.z_slice])
        J += float(u @ Ru @ u + qd @ d)
        if Rdu is not None:
            J += float((u - up) @ Rdu @ (u - up))
        y = m.C @ x + Dv @ v + m.d5[:, 0]
        if Qy is not None:
            J += float(y @ Qy @ y)
        J += float(qy @ y)
        if soft is not None:
            rows, lin, quad = soft
            g = m.E @ x + Fv @ v - m.f5[:, 0]
            for r in rows:
                if r // info.ncons == k:
                    s = max(g[r % info.ncons], 0.0)
                    J += lin * s + quad * s * s
        x = m.A @ x + Bv @ v + m.b5[:, 0]
        Qk = QxN if k == N - 1 else Qx
        J += float(x @ Qk @ x)
        up = u
    return J


def _run_both(model, w, x0, N=12, soft=None, u_prev=None):
    from pyhybridcontrol_tpu.control.mpc import MpcController
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec

    spec = BnbSpec(capacity=512, wave_size=32, max_waves=64, qp_iters=400)
    out = {}
    for sol in ("bnb", "stagewise"):
        ctrl = MpcController(model, N, weights=w, solver=sol,
                             bnb_spec=spec, qp_iters=400)
        if soft is not None:
            ctrl.set_soft_constraints(*soft)
        out[sol] = ctrl.feedback(jnp.asarray(x0, jnp.float32),
                                 u_prev=u_prev)
    return out


@pytest.mark.parametrize("feat", ["rdu", "qy", "rdu_qy"])
def test_stagewise_rdu_qy_parity(feat):
    """Δu / y-output weights: stagewise (block-tridiagonal P) and
    condensed solve to the same plan and the same true fp64 cost."""
    model = switched_double_integrator()
    w = default_weights()
    if feat in ("rdu", "rdu_qy"):
        w.Rdu = np.array([0.5])
    if feat in ("qy", "rdu_qy"):
        w.Qy = np.array([0.4, 0.2])
        w.qy = np.array([0.1, -0.05])
    x0 = np.array([1.2, -0.6])
    up = np.array([0.3], np.float32)
    out = _run_both(model, w, x0, u_prev=up)
    a, b = out["bnb"], out["stagewise"]
    assert bool(a.found) and bool(b.found)
    Ja = _true_plan_cost(model, w, x0, np.asarray(a.v_seq), u_prev=up)
    Jb = _true_plan_cost(model, w, x0, np.asarray(b.v_seq), u_prev=up)
    np.testing.assert_allclose(Ja, Jb, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                               atol=2e-2)


def test_stagewise_soft_parity_binding():
    """Soft state-box rows with x0 OUTSIDE the box: the hard problem is
    infeasible, the soft one pays the violation. The stagewise prox
    formulation (no slack variables) must match the condensed slack
    formulation's plan and true cost."""
    model = switched_double_integrator(x_box=2.0)
    w = default_weights()
    x0 = np.array([2.5, 0.4])           # x1 > box → rows 6 bind hard
    nc = model.info.ncons
    N = 12
    rows = [k * nc + r for k in range(N) for r in (6, 7, 8, 9)]
    soft = (rows, 10.0, 5.0)
    out = _run_both(model, w, x0, N=N, soft=soft)
    a, b = out["bnb"], out["stagewise"]
    assert bool(a.found) and bool(b.found)
    Ja = _true_plan_cost(model, w, x0, np.asarray(a.v_seq),
                         soft=(rows, 10.0, 5.0))
    Jb = _true_plan_cost(model, w, x0, np.asarray(b.v_seq),
                         soft=(rows, 10.0, 5.0))
    np.testing.assert_allclose(Ja, Jb, rtol=5e-3, atol=5e-3)
    # the hard problem is genuinely infeasible at step 0
    hard = _run_both(model, w, x0, N=N)
    assert not bool(hard["stagewise"].found)


def test_stagewise_features_long_horizon():
    """N=60 with Δu + Qy + soft all on: the O(N) frame stays solvable
    and matches condensed (VERDICT: 'long-horizon problems are exactly
    where soft constraints and Δu penalties matter most')."""
    model = switched_double_integrator(x_box=3.0)
    w = default_weights()
    w.Rdu = np.array([0.3])
    w.Qy = np.array([0.2, 0.1])
    x0 = np.array([3.4, 0.0])
    nc = model.info.ncons
    N = 60
    rows = [k * nc + r for k in range(N) for r in (6, 7)]
    soft = (rows, 20.0, 2.0)
    up = np.array([0.0], np.float32)
    out = _run_both(model, w, x0, N=N, soft=soft, u_prev=up)
    a, b = out["bnb"], out["stagewise"]
    assert bool(a.found) and bool(b.found)
    Ja = _true_plan_cost(model, w, x0, np.asarray(a.v_seq), u_prev=up,
                         soft=(rows, 20.0, 2.0))
    Jb = _true_plan_cost(model, w, x0, np.asarray(b.v_seq), u_prev=up,
                         soft=(rows, 20.0, 2.0))
    np.testing.assert_allclose(Ja, Jb, rtol=1e-2, atol=1e-2)


# --- horizon-parallel (log-depth) sweeps + device factorization ----------

def test_solve_K_assoc_matches_sequential(sw_prob, rng):
    """Associative-scan sweeps reproduce the sequential block-LU solve
    (batched), so parallel_sweeps is a drop-in at any batch shape."""
    from pyhybridcontrol_tpu.ops.stagewise import _solve_K_assoc
    model, N, sw = sw_prob
    r = jnp.asarray(rng.normal(size=(5, N, sw.b)), jnp.float32)
    np.testing.assert_allclose(np.asarray(_solve_K_assoc(sw, r)),
                               np.asarray(_solve_K(sw, r)),
                               rtol=2e-4, atol=2e-4)


def test_block_lu_device_matches_host(sw_prob, rng):
    """Device lax.scan factorization == host fp64 block LU (fp32 tol),
    and its factors solve K r = t through both sweep variants."""
    from pyhybridcontrol_tpu.ops.stagewise import (
        _solve_K_assoc, block_lu_device)
    model, N, sw = sw_prob
    b = sw.b
    # rebuild K blocks densely from the host factors: U from Uinv, then
    # K_diag/K_off via the LU identities (avoids re-deriving the rows)
    Uinv = np.asarray(sw.Uinv, np.float64)
    L = np.asarray(sw.L, np.float64)
    C = np.asarray(sw.C, np.float64)
    U = np.linalg.inv(Uinv)
    off_T = np.einsum("kij,kjl->kil", U[:-1], C[:-1])     # K_{k,k+1}
    K_off = np.zeros((N, b, b))
    K_off[1:] = np.transpose(off_T, (0, 2, 1))
    K_diag = U.copy()
    K_diag[1:] += np.einsum("kij,kjl->kil", L[1:], off_T)
    Ld, Uinvd, Cd = block_lu_device(jnp.asarray(K_diag, jnp.float32),
                                    jnp.asarray(K_off, jnp.float32))
    np.testing.assert_allclose(np.asarray(Ld), L, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Uinvd), Uinv, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(Cd)[:-1], C[:-1], rtol=1e-4,
                               atol=1e-4)
    r = jnp.asarray(rng.normal(size=(N, sw.b)), jnp.float32)
    fac = (Ld, Uinvd, Cd)
    np.testing.assert_allclose(np.asarray(_solve_K_assoc(sw, r, fac)),
                               np.asarray(_solve_K(sw, r)),
                               rtol=5e-4, atol=5e-4)


def test_stagewise_parallel_sweeps_full_solve(sw_prob):
    """Full ADMM with parallel_sweeps=True converges to the same point
    as the sequential sweeps on a real assembled problem."""
    model, N, sw = sw_prob
    x0 = np.array([2.0, 0.0], np.float32)
    q, l, u = assemble_stagewise(sw, jnp.asarray(x0), None, None)
    a = stagewise_admm_solve(sw, q, l, u, iters=300)
    p = stagewise_admm_solve(sw, q, l, u, iters=300, parallel_sweeps=True)
    np.testing.assert_allclose(float(p.obj), float(a.obj), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(p.x), np.asarray(a.x),
                               rtol=1e-3, atol=1e-3)


def test_solve_K_assoc_horizon_sharded():
    """The log-depth sweeps compile and run with the HORIZON axis
    sharded over an 8-device mesh (sequence parallelism for the O(N)
    path — SURVEY.md §5 long-context row), matching the single-device
    sequential solve."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pyhybridcontrol_tpu.ops.stagewise import _solve_K_assoc
    from pyhybridcontrol_tpu.parallel import make_mesh
    model = switched_double_integrator()
    N = 64
    sw = prepare_stagewise(model, N, default_weights())
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.normal(size=(N, sw.b)), jnp.float32)
    ref = np.asarray(_solve_K(sw, r))
    mesh = make_mesh([("hor", 8)])
    shard3 = NamedSharding(mesh, P("hor", None, None))
    shard2 = NamedSharding(mesh, P("hor", None))
    fac = tuple(jax.device_put(f, shard3) for f in (sw.L, sw.Uinv, sw.C))
    r_sh = jax.device_put(r, shard2)
    out = jax.jit(
        lambda rr, ff: _solve_K_assoc(sw, rr, factors=ff))(r_sh, fac)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4,
                               atol=5e-4)


def test_stagewise_bnb_parallel_sweeps(sw_prob):
    """Full stagewise B&B MIQP with parallel_sweeps=True returns the
    same incumbent as the sequential sweeps (public-path threading:
    MpcController(sw_parallel=True) → solve_miqp_bnb_stagewise)."""
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec
    from pyhybridcontrol_tpu.solver.bnb_stagewise import (
        solve_miqp_bnb_stagewise)
    model, N, sw = sw_prob
    x0 = np.array([2.0, 0.0], np.float32)
    q, l, u = assemble_stagewise(sw, jnp.asarray(x0), None, None)
    spec = BnbSpec(capacity=128, wave_size=16, max_waves=32,
                   qp_iters=400)
    a = solve_miqp_bnb_stagewise(sw, q, l, u, spec)
    p = solve_miqp_bnb_stagewise(sw, q, l, u, spec, parallel_sweeps=True)
    assert bool(a.found) and bool(p.found)
    np.testing.assert_allclose(float(p.obj), float(a.obj), rtol=1e-3,
                               atol=1e-3)


# ---- move blocking + terminal sets (round 3; SURVEY.md §2a) -------------


def _blk_prob(N=8, groups=None, terminal=None):
    model = switched_double_integrator()
    groups = groups if groups is not None else [k // 2 for k in range(N)]
    sw = prepare_stagewise(model, N, default_weights(),
                           blocking=groups, terminal=terminal)
    return model, N, sw


def test_stagewise_blocking_operator_and_K(rng):
    """With blocking + terminal rows, the structured operators must stay
    mutually adjoint and the block LU must still invert K = P + sigmaI +
    A'diag(rho)A (the rows are per-stage now, so this exercises the
    per-stage K assembly)."""
    Et = np.vstack([np.eye(2), -np.eye(2)])
    ft = np.full(4, 0.5)
    model, N, sw = _blk_prob(terminal=(Et, ft))
    assert sw.m_k == sw.nx + sw.nc + sw.b + sw.n_blk + 4
    xi = jnp.asarray(rng.normal(size=(N, sw.b)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(N, sw.m_k)), jnp.float32)
    lhs = float(jnp.sum(_apply_A(sw, xi) * w))
    rhs = float(jnp.sum(xi * _apply_AT(sw, w)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)
    r = jnp.asarray(rng.normal(size=(N, sw.b)), jnp.float32)
    x = _solve_K(sw, r)

    def K_apply(v):
        Av = _apply_A(sw, v)
        return (jnp.einsum("kij,kj->ki", sw.P_diag, v) + sw.sigma * v
                + _apply_AT(sw, sw.rho_rows * Av))

    np.testing.assert_allclose(np.asarray(K_apply(x)), np.asarray(r),
                               rtol=2e-3, atol=2e-3)


def test_stagewise_blocking_miqp_parity_N60():
    """MIQP parity at N=60 under move blocking (VERDICT r2 item 7):
    stagewise equality-row blocking + leader-only branching vs the
    condensed decision-reshaping blocking — same plan, same true fp64
    cost. Blocking shrinks both searches to 12 branching binaries, so
    the full B&B stays CPU-cheap even at this horizon."""
    from pyhybridcontrol_tpu.control.mpc import MpcController
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec

    model = switched_double_integrator()
    w = default_weights()
    N = 60
    groups = [k // 5 for k in range(N)]
    x0 = np.array([1.2, -0.4])
    spec = BnbSpec(capacity=512, wave_size=32, max_waves=64, qp_iters=400)
    out = {}
    for sol in ("bnb", "stagewise"):
        ctrl = MpcController(model, N, weights=w, solver=sol,
                             bnb_spec=spec, qp_iters=400)
        ctrl.set_move_blocking(groups)
        out[sol] = ctrl.feedback(jnp.asarray(x0, jnp.float32))
    a, b = out["bnb"], out["stagewise"]
    assert bool(a.found) and bool(b.found)
    Ja = _true_plan_cost(model, w, x0, np.asarray(a.v_seq))
    Jb = _true_plan_cost(model, w, x0, np.asarray(b.v_seq))
    np.testing.assert_allclose(Ja, Jb, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                               atol=2e-2)
    # the stagewise plan honors the blocking ties
    vb = np.asarray(b.v_seq)
    for k in range(1, N):
        if groups[k] == groups[k - 1]:
            np.testing.assert_allclose(vb[k, 0], vb[k - 1, 0], atol=5e-3)


def test_stagewise_terminal_parity_condensed_N60():
    """Terminal-set rows at N=60, relaxed QP: stagewise last-stage rows
    vs the condensed terminal_E/terminal_f build. The set must BIND
    (checked), and the stagewise optimum must equal the stagewise-frame
    objective evaluated at the condensed solution point (the frames
    differ by an x0/N-dependent constant, so raw objectives are not
    comparable — see test_stagewise_matches_oracle_relaxation)."""
    from pyhybridcontrol_tpu.ops.admm import admm_solve, prepare_admm_mpc

    N = 60
    Et = np.vstack([np.eye(2), -np.eye(2)])
    ft = np.full(4, 0.05)                 # x_N in a tight box
    model = switched_double_integrator()
    sw = prepare_stagewise(model, N, default_weights(), terminal=(Et, ft))
    x0 = np.array([1.5, 0.0])
    q, l, u = assemble_stagewise(sw, jnp.asarray(x0, jnp.float32))
    res = stagewise_admm_solve(sw, q, l, u, iters=2000)
    assert float(res.r_prim_rel) < 1e-3
    xN = np.asarray(res.x)[-1, sw.nv:]
    assert np.all(np.abs(xN) <= 0.05 + 2e-3)   # terminal set enforced

    c = CondensedMpc(model, N, default_weights(),
                     terminal_E=Et, terminal_f=ft)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    f, h = qp.assemble(jnp.asarray(x0, jnp.float32))
    ref = admm_solve(admm, f, h, qp.lb, qp.ub, iters=2000)
    assert float(ref.r_prim_rel) < 1e-3
    xi_ref = _oracle_point_to_xi(c, np.asarray(ref.x, np.float64), x0,
                                 N, model.info.nx)
    want = _stagewise_obj_at(sw, q, xi_ref)
    np.testing.assert_allclose(float(res.obj), want, rtol=5e-3, atol=5e-3)


def test_stagewise_terminal_miqp_parity():
    """Terminal set through the controller MIQP path at N=12: both
    solvers return the same plan/cost and respect the terminal set."""
    from pyhybridcontrol_tpu.control.mpc import MpcController
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec

    model = switched_double_integrator()
    w = default_weights()
    N = 12
    Et = np.vstack([np.eye(2), -np.eye(2)])
    ft = np.full(4, 0.2)
    x0 = np.array([1.2, -0.6])
    spec = BnbSpec(capacity=512, wave_size=32, max_waves=64, qp_iters=400)
    out = {}
    for sol in ("bnb", "stagewise"):
        ctrl = MpcController(model, N, weights=w, solver=sol,
                             bnb_spec=spec, qp_iters=400)
        ctrl.set_terminal_constraint(Et, ft)
        out[sol] = ctrl.feedback(jnp.asarray(x0, jnp.float32))
    a, b = out["bnb"], out["stagewise"]
    assert bool(a.found) and bool(b.found)
    Ja = _true_plan_cost(model, w, x0, np.asarray(a.v_seq))
    Jb = _true_plan_cost(model, w, x0, np.asarray(b.v_seq))
    np.testing.assert_allclose(Ja, Jb, rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# horizon-coupled extra rows (round 4: rank-r bordered Woodbury solve)
# ---------------------------------------------------------------------------


def _budget_row(N, nv, cap):
    """Sum over stages of the first input coordinate <= cap."""
    A_v = np.zeros((1, N * nv))
    A_v[0, 0::nv] = 1.0
    return A_v, np.array([cap])


def test_stagewise_extra_rows_qp_parity():
    """Relaxed QP with a BINDING input-budget row: the bordered
    Woodbury x-update (ops/stagewise.py::_solve_K_bordered) reproduces
    the fp64 oracle on the condensed frame (objective at the oracle
    point; frames differ by an x0-dependent constant), the budget
    binds exactly, and the Falk dual bound stays valid."""
    from pyhybridcontrol_tpu.ops.stagewise import (
        assemble_stagewise_ext, stagewise_dual_bound)

    model = switched_double_integrator()
    w = default_weights()
    N = 8
    A_v, b_e = _budget_row(N, model.info.nv, -1.2)
    x0 = np.array([2.0, 0.0])

    c = CondensedMpc(model, N, w).with_extra_constraints(A_v, b_e)
    fo, ho = c.assemble_np(x0)
    oracle = solve_qp_oracle(c.H, fo, c.G, ho, c.lb, c.ub)
    assert oracle.status == "optimal"

    sw = prepare_stagewise(model, N, w, extra=(A_v, b_e))
    assert sw.n_ext == 1
    q, l, u = assemble_stagewise(sw, jnp.asarray(x0, jnp.float32))
    ue = assemble_stagewise_ext(sw, jnp.asarray(x0, jnp.float32))
    res = stagewise_admm_solve(sw, q, l, u, iters=4000, ext_u=ue)
    assert float(res.r_prim_rel) < 1e-3

    xi_o = _oracle_point_to_xi(c, oracle.x, x0, N, model.info.nx)
    want = _stagewise_obj_at(sw, q, xi_o)
    np.testing.assert_allclose(float(res.obj), want, rtol=5e-3,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.x)[:, 0].sum(), -1.2,
                               atol=2e-3)                # row binds
    bound = stagewise_dual_bound(sw, q, l, u, res, ext_u=ue)
    assert float(bound) <= float(res.obj) + 1e-3         # valid bound
    # the bordered solve composes with the associative parallel sweeps
    res_p = stagewise_admm_solve(sw, q, l, u, iters=4000, ext_u=ue,
                                 parallel_sweeps=True)
    np.testing.assert_allclose(float(res_p.obj), float(res.obj),
                               rtol=1e-4, atol=1e-4)


def test_stagewise_extra_rows_miqp_parity():
    """MIQP with the budget row through the controller: stagewise B&B
    (cold extra-row duals per node, bordered probes) matches the fp64
    enumeration oracle on the condensed frame; an impossible budget
    returns found=False."""
    from pyhybridcontrol_tpu.control.mpc import MpcController
    from pyhybridcontrol_tpu.solver.oracle import (
        solve_miqp_enumeration_oracle)

    model = switched_double_integrator()
    w = default_weights()
    N = 6
    A_v, b_e = _budget_row(N, model.info.nv, -1.0)
    x0 = np.array([2.0, 0.0])

    c = CondensedMpc(model, N, w).with_extra_constraints(A_v, b_e)
    fo, ho = c.assemble_np(x0)
    oracle = solve_miqp_enumeration_oracle(c.H, fo, c.G, ho, c.lb,
                                           c.ub, c.binary_idx)
    assert oracle.status == "optimal"

    ctrl = (MpcController(model, N, w, solver="stagewise")
            .set_extra_constraints(A_v, b_e).build())
    out = ctrl.feedback(jnp.asarray(x0, jnp.float32))
    assert bool(out.found)
    sw = ctrl._sw
    q, _, _ = assemble_stagewise(sw, jnp.asarray(x0, jnp.float32))
    xi_o = _oracle_point_to_xi(c, oracle.x, x0, N, model.info.nx)
    want = _stagewise_obj_at(sw, q, xi_o)
    np.testing.assert_allclose(float(out.obj), want, rtol=5e-3,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.v_seq)[:, 0].sum(), -1.0,
                               atol=2e-3)

    ctrl2 = (MpcController(model, N, w, solver="stagewise")
             .set_extra_constraints(A_v, np.array([-1e3])).build())
    out2 = ctrl2.feedback(jnp.asarray(x0, jnp.float32))
    assert not bool(out2.found)


# extra rows x scenario trees: covered in tests/test_stagewise_tree.py
# (test_tree_extra_rows_matches_joint_oracle — per-scenario row
# semantics, shared bordered factors batched over the scenario axis)


def test_stagewise_extra_rows_long_horizon_qp():
    """The bordered Woodbury path at long N (the regime the stagewise
    frame exists for): N=40 relaxed QP with two coupled budget rows
    matches the fp64 oracle, and the prefactored KiU/Cw keep the
    per-iteration cost O(N·b·r) (no dense N·b matrices anywhere)."""
    from pyhybridcontrol_tpu.ops.stagewise import (
        assemble_stagewise_ext, stagewise_dual_bound)

    model = switched_double_integrator()
    w = default_weights()
    N = 40
    nv = model.info.nv
    A_v = np.zeros((2, N * nv))
    A_v[0, 0::nv] = 1.0                   # total input budget
    A_v[1, (N // 2) * nv::nv] = 1.0       # second-half budget
    b_e = np.array([-2.0, -0.4])
    x0 = np.array([2.0, 0.0])

    c = CondensedMpc(model, N, w).with_extra_constraints(A_v, b_e)
    fo, ho = c.assemble_np(x0)
    oracle = solve_qp_oracle(c.H, fo, c.G, ho, c.lb, c.ub)
    assert oracle.status == "optimal"

    sw = prepare_stagewise(model, N, w, extra=(A_v, b_e))
    assert sw.n_ext == 2 and sw.KiU.shape == (N, sw.b, 2)
    q, l, u = assemble_stagewise(sw, jnp.asarray(x0, jnp.float32))
    ue = assemble_stagewise_ext(sw, jnp.asarray(x0, jnp.float32))
    res = stagewise_admm_solve(sw, q, l, u, iters=6000, ext_u=ue)
    assert float(res.r_prim_rel) < 1e-3
    xi_o = _oracle_point_to_xi(c, oracle.x, x0, N, model.info.nx)
    want = _stagewise_obj_at(sw, q, xi_o)
    np.testing.assert_allclose(float(res.obj), want, rtol=5e-3,
                               atol=5e-3)
    bound = stagewise_dual_bound(sw, q, l, u, res, ext_u=ue)
    assert float(bound) <= float(res.obj) + 1e-3
