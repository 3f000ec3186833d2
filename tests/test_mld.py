import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.mld import (
    MldInfo, MldModel, MldTemplate, PwaRegion, PwaSystem, pwa_to_mld)
from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator)


def test_info_partitions():
    info = MldInfo(nx=3, nu=2, ndelta=1, nz=2, x_types=("c", "c", "b"),
                   u_types=("c", "b"))
    assert info.nxc == 2 and info.nxb == 1
    assert info.nuc == 1 and info.nub == 1
    assert info.nv == 5
    assert info.nv_binary == 2
    np.testing.assert_array_equal(info.v_binary_mask,
                                  [False, True, True, False, False])


def test_info_validation_errors():
    with pytest.raises(ValueError):
        MldInfo(nx=2, x_types=("c",))
    with pytest.raises(ValueError):
        MldInfo(nx=1, x_types=("q",))


def test_model_infer_and_defaults():
    m = MldModel.from_matrices(A=np.eye(2), B1=np.ones((2, 1)))
    assert m.info.nx == 2 and m.info.nu == 1
    assert m.mats.B2.shape == (2, 0)
    assert m.mats.b5.shape == (2, 1)


def test_model_shape_mismatch_raises():
    with pytest.raises(ValueError):
        MldModel.from_matrices(A=np.eye(2), B1=np.ones((3, 1)))


def test_step_vs_hand_dynamics(rng):
    # SURVEY.md §4.1: MLD step vs hand-written dynamics
    A = rng.normal(size=(3, 3))
    B1 = rng.normal(size=(3, 2))
    B2 = rng.normal(size=(3, 1))
    B3 = rng.normal(size=(3, 2))
    B4 = rng.normal(size=(3, 1))
    b5 = rng.normal(size=(3,))
    m = MldModel.from_matrices(A=A, B1=B1, B2=B2, B3=B3, B4=B4, b5=b5)
    x = rng.normal(size=3)
    u = rng.normal(size=2)
    d = np.array([1.0])
    z = rng.normal(size=2)
    w = rng.normal(size=1)
    want = A @ x + B1 @ u + B2 @ d + B3 @ z + B4 @ w + b5
    got = m.step(jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
                 jnp.asarray(d, jnp.float32), jnp.asarray(z, jnp.float32),
                 jnp.asarray(w, jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_step_batched_vmap(rng):
    m = switched_double_integrator()
    xs = jnp.asarray(rng.normal(size=(7, 2)), jnp.float32)
    us = jnp.asarray(rng.normal(size=(7, 1)), jnp.float32)
    out = jax.vmap(lambda x, u: m.step(x, u))(xs, us)
    assert out.shape == (7, 2)
    one = m.step(xs[3], us[3])
    np.testing.assert_allclose(out[3], one, rtol=1e-6)


def test_lsim_matches_manual_loop(rng):
    m = switched_double_integrator()
    info = m.info
    T = 5
    x0 = jnp.asarray([1.0, -0.5])
    v_seq = jnp.asarray(rng.uniform(-1, 1, size=(T, info.nv)), jnp.float32)
    xs, ys = m.lsim(x0, v_seq)
    x = x0
    for k in range(T):
        u, d, z = info.split_v(v_seq[k])
        x = m.step(x, u, d, z)
        np.testing.assert_allclose(xs[k + 1], x, rtol=1e-5, atol=1e-6)


def test_constraint_residual_feasibility():
    m = switched_double_integrator(u_max=1.0)
    x = jnp.zeros(2)
    # feasible: δ=1, z=u
    r = m.constraint_residual(x, u=jnp.asarray([0.5]), delta=jnp.asarray([1.0]),
                              z=jnp.asarray([0.5]))
    assert np.max(np.asarray(r)) <= 1e-6
    # infeasible: δ=0 but z≠0
    r = m.constraint_residual(x, u=jnp.asarray([0.5]), delta=jnp.asarray([0.0]),
                              z=jnp.asarray([0.5]))
    assert np.max(np.asarray(r)) > 0.1


def test_template_materialize_and_cache():
    def build(Ts):
        return dict(A=np.array([[1.0, Ts], [0.0, 1.0]]),
                    B1=np.array([[0.5 * Ts**2], [Ts]]))

    tmpl = MldTemplate(build, required=("Ts",))
    m1 = tmpl.materialize(Ts=0.5)
    m2 = tmpl.materialize(Ts=0.5)
    m3 = tmpl.materialize(Ts=1.0)
    assert m1 is m2          # cached
    assert m1 is not m3
    np.testing.assert_allclose(np.asarray(m3.mats.A)[0, 1], 1.0)
    with pytest.raises(ValueError):
        tmpl.materialize()


# ---- PWA → MLD (SURVEY.md §4.1: big-M encodings exact on boundaries) ----

def _two_region_pwa():
    # spring with stiffness that changes sign region: x1 >= 0 vs x1 < 0
    A1 = np.array([[1.0, 0.1], [-0.5, 1.0]])
    A2 = np.array([[1.0, 0.1], [-0.1, 1.0]])
    B = np.array([[0.0], [0.1]])
    c1 = np.array([0.0, 0.0])
    c2 = np.array([0.0, 0.02])
    r1 = PwaRegion(A=A1, B=B, c=c1, S=np.array([[-1.0, 0.0]]),
                   R=np.zeros((1, 1)), T=np.array([0.0]))      # x1 ≥ 0
    r2 = PwaRegion(A=A2, B=B, c=c2, S=np.array([[1.0, 0.0]]),
                   R=np.zeros((1, 1)), T=np.array([-1e-9]))    # x1 < 0
    return PwaSystem(regions=[r1, r2],
                     x_lb=np.array([-2.0, -2.0]), x_ub=np.array([2.0, 2.0]),
                     u_lb=np.array([-1.0]), u_ub=np.array([1.0]))


def test_pwa_to_mld_dims():
    sys = _two_region_pwa()
    m = pwa_to_mld(sys)
    assert m.info.ndelta == 2
    assert m.info.nz == 4
    assert m.info.nx == 2 and m.info.nu == 1


def test_pwa_mld_equivalence_random_points(rng):
    """For random (x,u) in the box, the unique feasible (δ,z) must give
    x⁺ equal to the exact PWA successor."""
    sys = _two_region_pwa()
    m = pwa_to_mld(sys)
    for _ in range(30):
        x = rng.uniform(-1.9, 1.9, size=2)
        u = rng.uniform(-0.9, 0.9, size=1)
        if abs(x[0]) < 1e-6:
            continue
        want = sys.simulate_step(x, u)
        # construct the encoding's (δ, z) for the active region
        active = 0 if x[0] >= 0 else 1
        delta = np.zeros(2)
        delta[active] = 1.0
        z = np.zeros(4)
        reg = sys.regions[active]
        z[active * 2:(active + 1) * 2] = reg.A @ x + reg.B @ u + reg.c
        r = m.constraint_residual(
            jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
            jnp.asarray(delta, jnp.float32), jnp.asarray(z, jnp.float32))
        assert np.max(np.asarray(r)) <= 1e-4, "feasible point rejected"
        got = m.step(jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
                     jnp.asarray(delta, jnp.float32), jnp.asarray(z, jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pwa_mld_rejects_wrong_region(rng):
    sys = _two_region_pwa()
    m = pwa_to_mld(sys)
    x = np.array([1.0, 0.0])      # region 1 active
    u = np.array([0.0])
    delta = np.array([0.0, 1.0])  # claim region 2
    reg = sys.regions[1]
    z = np.zeros(4)
    z[2:] = reg.A @ x + reg.B @ u + reg.c
    r = m.constraint_residual(
        jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
        jnp.asarray(delta, jnp.float32), jnp.asarray(z, jnp.float32))
    assert np.max(np.asarray(r)) > 1e-3, "wrong-region point accepted"


def test_from_sympy_template():
    """Reference workflow parity: sympy expression matrices → lambdify →
    numeric materialization (SURVEY.md §3.1)."""
    sympy = pytest.importorskip("sympy")
    import sympy as sp

    from pyhybridcontrol_tpu.mld.symbolic import from_sympy

    Ts, tau = sp.symbols("Ts tau")
    tmpl = from_sympy({
        "A": sp.Matrix([[1, Ts], [0, 1 - Ts / tau]]),
        "B1": sp.Matrix([[0], [Ts / tau]]),
    })
    m = tmpl.materialize(Ts=0.25, tau=2.0)
    np.testing.assert_allclose(np.asarray(m.mats.A),
                               [[1.0, 0.25], [0.0, 0.875]], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.mats.B1),
                               [[0.0], [0.125]], rtol=1e-6)
    with pytest.raises(ValueError):
        tmpl.materialize(Ts=0.25)      # missing tau


# ---- PWA → MLD hull (disaggregated) formulation -------------------------

def test_pwa_hull_equivalence_random_points(rng):
    """Hull encoding exactness: at integral δ the copies reconstruct
    (x, u) and the dynamics row gives the exact PWA successor."""
    sys = _two_region_pwa()
    m = pwa_to_mld(sys, formulation="hull")
    assert m.info.ndelta == 2 and m.info.nz == 2 * 3
    for _ in range(30):
        x = rng.uniform(-1.9, 1.9, size=2)
        u = rng.uniform(-0.9, 0.9, size=1)
        if abs(x[0]) < 1e-6:
            continue
        want = sys.simulate_step(x, u)
        active = 0 if x[0] >= 0 else 1
        delta = np.zeros(2)
        delta[active] = 1.0
        z = np.zeros(6)                       # copies (v^x, v^u) per region
        z[active * 3: active * 3 + 2] = x
        z[active * 3 + 2] = u[0]
        r = m.constraint_residual(
            jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
            jnp.asarray(delta, jnp.float32), jnp.asarray(z, jnp.float32))
        assert np.max(np.asarray(r)) <= 1e-4, "feasible point rejected"
        got = m.step(jnp.asarray(x, jnp.float32),
                     jnp.asarray(u, jnp.float32),
                     jnp.asarray(delta, jnp.float32),
                     jnp.asarray(z, jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pwa_hull_rejects_wrong_region(rng):
    sys = _two_region_pwa()
    m = pwa_to_mld(sys, formulation="hull")
    x = np.array([1.0, 0.0])      # region 1 active
    u = np.array([0.0])
    delta = np.array([0.0, 1.0])  # claim region 2
    z = np.zeros(6)
    z[3:5] = x
    z[5] = u[0]
    r = m.constraint_residual(
        jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
        jnp.asarray(delta, jnp.float32), jnp.asarray(z, jnp.float32))
    assert np.max(np.asarray(r)) > 1e-3, "wrong-region point accepted"


def test_pwa_hull_leaf_matches_bigm_leaf():
    """The two formulations encode the SAME MIQP: at any consistent
    fixed binary pattern the leaf QP optima must agree (fp64)."""
    import scipy.optimize as sopt

    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc

    x0 = np.array([1.5, 0.0])
    w = pwa_weights()
    N = 4
    bits = np.tile([1.0, 1.0, 0.0], N)    # actuator on, region 1

    def leaf(model):
        c = CondensedMpc(model, N, w)
        fo, ho = c.assemble_np(x0)
        lb = np.array(c.lb); ub = np.array(c.ub)
        lb[c.binary_idx] = ub[c.binary_idx] = bits
        n = c.H.shape[0]
        r = sopt.minimize(
            lambda V: 0.5 * V @ c.H @ V + fo @ V, np.zeros(n),
            jac=lambda V: c.H @ V + fo,
            constraints=[sopt.LinearConstraint(c.G, -np.inf, ho)],
            bounds=sopt.Bounds(lb, ub), method="SLSQP",
            options=dict(maxiter=800, ftol=1e-12))
        assert r.status == 0, r.message
        return r.fun

    ob = leaf(pwa_spring_mld(on_off=True, formulation="bigm"))
    oh = leaf(pwa_spring_mld(on_off=True, formulation="hull"))
    np.testing.assert_allclose(ob, oh, rtol=1e-6, atol=1e-6)


# ---- PWA with >2 regions (deadzone spring) -------------------------------
#
# The 2-region families above never exercise the SOS1 indicator rows
# (Σδ=1 over R>2) or the hull disaggregation with more than two copies;
# a 3-region deadzone spring does: stiff restoring force for |x1| ≥ d,
# free drift inside the deadzone (continuous across both boundaries).

def _three_region_pwa(d: float = 0.5):
    A_stiff = np.array([[1.0, 0.1], [-0.4, 1.0]])
    A_free = np.array([[1.0, 0.1], [0.0, 1.0]])
    B = np.array([[0.0], [0.1]])
    R0 = np.zeros((1, 1))
    R2 = np.zeros((2, 1))
    r_neg = PwaRegion(A=A_stiff, B=B, c=np.array([0.0, -0.4 * d]),
                      S=np.array([[1.0, 0.0]]), R=R0,
                      T=np.array([-d]))                     # x1 ≤ −d
    r_mid = PwaRegion(A=A_free, B=B, c=np.zeros(2),
                      S=np.array([[1.0, 0.0], [-1.0, 0.0]]), R=R2,
                      T=np.array([d, d]))                   # |x1| ≤ d
    r_pos = PwaRegion(A=A_stiff, B=B, c=np.array([0.0, 0.4 * d]),
                      S=np.array([[-1.0, 0.0]]), R=R0,
                      T=np.array([-d]))                     # x1 ≥ d
    return PwaSystem(regions=[r_neg, r_mid, r_pos],
                     x_lb=np.array([-2.0, -2.0]),
                     x_ub=np.array([2.0, 2.0]),
                     u_lb=np.array([-1.0]), u_ub=np.array([1.0]))


def _three_region_active(x, d=0.5):
    return 0 if x[0] <= -d else (2 if x[0] >= d else 1)


@pytest.mark.parametrize("formulation", ["bigm", "hull"])
def test_pwa_three_region_equivalence(rng, formulation):
    sys = _three_region_pwa()
    m = pwa_to_mld(sys, formulation=formulation)
    assert m.info.ndelta == 3
    assert m.info.nz == (9 if formulation == "hull" else 6)
    checked = 0
    for _ in range(60):
        x = rng.uniform(-1.9, 1.9, size=2)
        u = rng.uniform(-0.9, 0.9, size=1)
        if min(abs(x[0] - 0.5), abs(x[0] + 0.5)) < 1e-3:
            continue                      # off the guard boundaries
        checked += 1
        want = sys.simulate_step(x, u)
        active = _three_region_active(x)
        delta = np.zeros(3)
        delta[active] = 1.0
        if formulation == "hull":
            z = np.zeros(9)               # copies (v^x, v^u) per region
            z[active * 3: active * 3 + 2] = x
            z[active * 3 + 2] = u[0]
        else:
            z = np.zeros(6)               # z_i = δ_i · (A_i x + B_i u + c_i)
            z[active * 2: (active + 1) * 2] = want
        r = m.constraint_residual(
            jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
            jnp.asarray(delta, jnp.float32), jnp.asarray(z, jnp.float32))
        assert np.max(np.asarray(r)) <= 1e-4, "feasible point rejected"
        got = m.step(jnp.asarray(x, jnp.float32),
                     jnp.asarray(u, jnp.float32),
                     jnp.asarray(delta, jnp.float32),
                     jnp.asarray(z, jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # claiming any OTHER region at this (x,u,z-for-active) must fail
        wrong = np.zeros(3)
        wrong[(active + 1) % 3] = 1.0
        rw = m.constraint_residual(
            jnp.asarray(x, jnp.float32), jnp.asarray(u, jnp.float32),
            jnp.asarray(wrong, jnp.float32), jnp.asarray(z, jnp.float32))
        assert np.max(np.asarray(rw)) > 1e-3, "wrong-region point accepted"
    assert checked >= 40


def test_pwa_three_region_miqp_parity():
    """End-to-end MIQP parity on the 3-region model (hull + bigm):
    condensed device enumeration must match the fp64 oracle, and both
    formulations must agree on the optimum (same underlying MIQP)."""
    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc, MpcWeights
    from pyhybridcontrol_tpu.solver import (
        solve_miqp_enumerate_device, solve_miqp_enumeration_oracle)

    sys = _three_region_pwa()
    w = MpcWeights(Qx=np.array([4.0, 0.4]), QxN=np.array([8.0, 0.8]),
                   Ru=np.array([0.1]))
    x0 = np.array([1.2, 0.0], np.float32)
    objs = {}
    for formulation in ("hull", "bigm"):
        m = pwa_to_mld(sys, formulation=formulation)
        c = CondensedMpc(m, 2, w)    # 2^6 patterns keep the fp64
        # oracle enumeration fast; 3-region logic still couples steps
        qp, spec = c.device_qp(), prepare_admm_mpc(c)
        f, h = qp.assemble(jnp.asarray(x0))
        _, obj, _, _ = solve_miqp_enumerate_device(spec, qp, f, h,
                                                   iters=1500)
        fo, ho = c.assemble_np(x0)
        oracle = solve_miqp_enumeration_oracle(
            c.H, fo, c.G, ho, c.lb, c.ub, c.binary_idx)
        assert abs(float(obj) - oracle.obj) < 2e-3, formulation
        objs[formulation] = oracle.obj
    np.testing.assert_allclose(objs["hull"], objs["bigm"],
                               rtol=1e-5, atol=1e-5)
