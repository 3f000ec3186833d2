"""Binary-state MLD support (SURVEY.md §2a MLD form:
x ∈ ℝ^nxc × {0,1}^nxb — VERDICT round-1 item 6).

The condensed path enforces predicted-state integrality via auxiliary
branching binaries tied to the state expression by equality rows
(ops/condense.py); the stagewise path rejects loudly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.mld.info import MldInfo
from pyhybridcontrol_tpu.mld.model import MldModel
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc, MpcWeights
from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb
from pyhybridcontrol_tpu.solver.oracle import solve_miqp_enumeration_oracle


def binary_state_model():
    """x⁺ = 0.7x + 0.6u with x ∈ {0,1}, u ∈ [0,1] continuous: state
    integrality genuinely binds (from x=0, x⁺=0.6u is fractional for
    any u ∈ (0, 1])."""
    info = MldInfo(nx=1, nu=1, ncons=2, x_types=("b",))
    return MldModel.from_matrices(
        info,
        A=[[0.7]], B1=[[0.6]],
        E=np.zeros((2, 1)), F1=[[1.0], [-1.0]], f5=[[1.0], [0.0]])


def weights():
    # reward x near 0.9: the relaxation wants fractional states
    return MpcWeights(Qx=np.array([[1.0]]), x_ref=np.array([0.9]),
                      Ru=np.array([[1e-3]]))


def test_condensed_adds_state_aux_binaries():
    m = binary_state_model()
    N = 4
    c = CondensedMpc(m, N, weights())
    assert c.n_state_aux == N          # one aux per predicted step
    assert c.nV == N * m.info.nv + N
    # aux binaries are branching variables with [0,1] boxes
    assert c.binary_mask[-N:].all()
    np.testing.assert_allclose(c.lb[-N:], 0.0)
    np.testing.assert_allclose(c.ub[-N:], 1.0)
    # tie rows got the equality rho boost
    assert len(c.z_rows) >= 2 * N


def test_binary_state_solve_matches_oracle():
    m = binary_state_model()
    N = 4
    c = CondensedMpc(m, N, weights())
    x0 = np.array([0.0])
    f, h = c.assemble_np(x0)
    oracle = solve_miqp_enumeration_oracle(
        c.H, f, c.G, h, c.lb, c.ub, c.binary_idx)
    assert oracle.status == "optimal"
    # enforced states are integral: from x0=0 only x≡0 is reachable
    A, B1 = 0.7, 0.6
    x = 0.0
    for k in range(N):
        u_k = oracle.x[k * m.info.nv]
        x = A * x + B1 * u_k
        assert abs(x - round(x)) < 1e-6
        assert round(x) in (0.0, 1.0)

    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    fd, hd = qp.assemble(jnp.asarray(x0, jnp.float32))
    res = solve_miqp_bnb(admm, qp, fd, hd,
                         BnbSpec(capacity=256, wave_size=32,
                                 qp_iters=300, max_waves=24))
    assert bool(res.found)
    assert abs(float(res.obj) - oracle.obj) < 2e-3 * max(1, abs(oracle.obj))


def test_relaxed_would_violate_integrality():
    """Sanity: without enforcement the optimum is fractional — i.e. the
    aux machinery is load-bearing, not vacuous."""
    m_rel = MldModel.from_matrices(
        MldInfo(nx=1, nu=1, ncons=2, x_types=("c",)),
        A=[[0.7]], B1=[[0.6]],
        E=np.zeros((2, 1)), F1=[[1.0], [-1.0]], f5=[[1.0], [0.0]])
    c = CondensedMpc(m_rel, 4, weights())
    assert c.n_state_aux == 0
    f, h = c.assemble_np(np.array([0.0]))
    r = solve_miqp_enumeration_oracle(c.H, f, c.G, h, c.lb, c.ub,
                                      c.binary_idx)
    xs, x = [], 0.0
    for k in range(4):
        x = 0.7 * x + 0.6 * r.x[k * m_rel.info.nv]
        xs.append(x)
    assert max(abs(v - round(v)) for v in xs) > 0.05


def test_binary_state_with_move_blocking():
    """Aux columns pass 1:1 through the blocking map."""
    m = binary_state_model()
    N = 4
    c = CondensedMpc(m, N, weights()).with_move_blocking([0, 0, 1, 1])
    x0 = np.array([0.0])
    f, h = c.assemble_np(x0)
    r = solve_miqp_enumeration_oracle(c.H, f, c.G, h, c.lb, c.ub,
                                      c.binary_idx)
    assert r.status == "optimal"
    v_seq = (c.T_full @ r.x).reshape(N, m.info.nv)
    x = 0.0
    for k in range(N):
        x = 0.7 * x + 0.6 * v_seq[k, 0]
        assert abs(x - round(x)) < 1e-6


def test_stagewise_rejects_binary_states():
    from pyhybridcontrol_tpu.ops.stagewise import prepare_stagewise

    with pytest.raises(ValueError, match="binary states"):
        prepare_stagewise(binary_state_model(), 4, weights())
