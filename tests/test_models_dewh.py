"""DEWH / unit-commitment / micro-grid model tests (BASELINE config 3 +
micro-grid layer)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.control.mpc import MpcController
from pyhybridcontrol_tpu.mld.compose import aggregate_mld, joint_v_layout
from pyhybridcontrol_tpu.models.dewh import (
    DewhParams, dewh_energy_price_seq, dewh_model, dewh_weights,
    min_up_down_rows)
from pyhybridcontrol_tpu.models.grid import (
    GridParams, default_tou_profile, micro_grid_mld)
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.solver.bnb import BnbSpec


def test_dewh_dynamics_physical():
    m = dewh_model()
    p = DewhParams()
    x = jnp.asarray([60.0, 0.0])
    # heater off, no draw: temperature decays toward ambient
    x1 = m.step(x, u=jnp.asarray([0.0]), delta=jnp.asarray([0.0]),
                omega=jnp.asarray([0.0]))
    assert float(x1[0]) < 60.0
    assert float(x1[0]) > 55.0
    # heater on heats
    x2 = m.step(x, u=jnp.asarray([1.0]), delta=jnp.asarray([1.0]),
                omega=jnp.asarray([0.0]))
    assert float(x2[0]) > float(x1[0])
    # draw cools
    x3 = m.step(x, u=jnp.asarray([0.0]), delta=jnp.asarray([0.0]),
                omega=jnp.asarray([1.0]))
    assert float(x3[0]) < float(x1[0])
    # m state remembers u
    assert float(x2[1]) == 1.0 and float(x1[1]) == 0.0


def test_dewh_startup_logic():
    m = dewh_model()
    x_off = jnp.asarray([60.0, 0.0])   # was off
    x_on = jnp.asarray([60.0, 1.0])    # was on
    u1 = jnp.asarray([1.0])
    u0 = jnp.asarray([0.0])
    ds1 = jnp.asarray([1.0])
    ds0 = jnp.asarray([0.0])
    w = jnp.asarray([0.0])

    def feas(x, u, d):
        r = m.constraint_residual(x, u, d, None, w)
        return float(np.max(np.asarray(r))) <= 1e-6

    assert feas(x_off, u1, ds1)        # turning on from off = startup
    assert not feas(x_off, u1, ds0)    # must flag startup
    assert feas(x_on, u1, ds0)         # staying on: no startup
    assert not feas(x_on, u1, ds1)     # cannot claim startup
    assert feas(x_off, u0, ds0)


def test_dewh_mpc_closed_loop_comfort():
    """DEWH MPC keeps temperature near setpoint under draws."""
    p = DewhParams()
    model = dewh_model(p)
    ctrl = MpcController(model, N=8, weights=dewh_weights(T_set=60.0),
                         solver="bnb",
                         bnb_spec=BnbSpec(capacity=128, wave_size=16,
                                          qp_iters=400))
    # comfort band is soft (a hard T ≥ T_min is infeasible under draws)
    nc = model.info.ncons
    ctrl.set_soft_constraints([k * nc + r for k in range(8) for r in (0, 1)],
                              lin_pen=5.0, quad_pen=1.0)
    ctrl.build()
    rng = np.random.default_rng(0)
    T = 12
    # moderate draws (~0.5-unit showers, 25% of steps): sustainable load
    # for a 2.25 °C/step heater against 6 °C/draw losses
    draws = (0.5 * (rng.uniform(0, 1, size=(T + 8, 1)) < 0.25)
             ).astype(np.float32)
    prices = dewh_energy_price_seq(np.full(T + 8, 0.15), p,
                                   nv=model.info.nv).astype(np.float32)
    x = jnp.asarray([55.0, 0.0])
    temps = [55.0]
    from pyhybridcontrol_tpu.loop import closed_loop, make_mpc_step
    step = make_mpc_step(model, ctrl.device_qp, ctrl.admm, method="bnb",
                         bnb_spec=ctrl.bnb_spec)
    res = closed_loop(model, step, x, T,
                      omega_traj=jnp.asarray(draws),
                      price_traj=jnp.asarray(prices))
    temps = np.asarray(res.xs)[:, 0]
    assert bool(res.found.all())
    assert temps.min() > 45.0, f"temperature crashed: {temps}"
    assert temps.max() < 76.0
    # heater actually cycles
    us = np.asarray(res.vs)[:, 0]
    assert us.max() > 0.5


def test_min_up_down_rows():
    A_v, b = min_up_down_rows(N=6, nv=2, min_up=3, min_down=2)
    assert A_v.shape[1] == 12
    assert len(b) == A_v.shape[0] > 0
    # a startup at k=0 with u off at k=1 violates a min-up row
    V = np.zeros((6, 2))
    V[0] = [1.0, 1.0]      # u on, startup flagged
    V[1] = [0.0, 0.0]      # off again — violates min_up=3
    viol = A_v @ V.reshape(-1) - b
    assert viol.max() > 0.5
    # keeping it on 3 steps satisfies all rows
    V[1] = [1.0, 0.0]
    V[2] = [1.0, 0.0]
    viol = A_v @ V.reshape(-1) - b
    assert viol.max() <= 1e-9


def test_unit_commitment_condensed():
    """min-up rows in the condensed MIQP force ≥3-step heater runs."""
    p = DewhParams()
    model = dewh_model(p)
    N = 6
    c = CondensedMpc(model, N, dewh_weights(T_set=60.0))
    A_v, b = min_up_down_rows(N, model.info.nv, min_up=3)
    c2 = c.with_extra_constraints(A_v, b)
    assert c2.G.shape[0] == c.G.shape[0] + A_v.shape[0]
    from pyhybridcontrol_tpu.solver.oracle import (
        solve_miqp_enumeration_oracle)
    x0 = np.array([52.0, 0.0])
    f, h = c2.assemble_np(x0)
    r = solve_miqp_enumeration_oracle(c2.H, f, c2.G, h, c2.lb, c2.ub,
                                      c2.binary_idx)
    assert r.status == "optimal"
    # dewh has a binary state (u_prev), so the condensed MIQP appends
    # N state-integrality aux binaries after the N·nv stage variables
    us = r.x[:N * model.info.nv].reshape(N, model.info.nv)[:, 0]
    # every ON-run within the horizon lasts ≥ 3 steps (or runs to the end)
    runs = []
    run = 0
    for u in np.round(us):
        if u > 0.5:
            run += 1
        elif run:
            runs.append(run)
            run = 0
    assert all(r >= 3 for r in runs), f"u sequence {us}"


def test_aggregate_mld_and_layout():
    p = [DewhParams(), DewhParams(P_h=2000.0)]
    joint = micro_grid_mld(p, GridParams(P_max=3500.0))
    info = joint.info
    assert info.nx == 4 and info.nu == 2 and info.ndelta == 2
    assert info.u_types == ("b", "b")
    lay = joint_v_layout([dewh_model(pi).info for pi in p])
    assert list(lay[0]["u"]) == [0] and list(lay[1]["u"]) == [1]
    assert list(lay[0]["delta"]) == [2] and list(lay[1]["delta"]) == [3]
    # coupling: both heaters on violates 3500 W limit
    x = jnp.asarray([60.0, 0, 60.0, 0])
    r = joint.constraint_residual(
        x, u=jnp.asarray([1.0, 1.0]), delta=jnp.asarray([1.0, 1.0]),
        omega=jnp.asarray([0.0, 0.0]))
    assert float(np.max(np.asarray(r))) > 0.5     # infeasible
    r2 = joint.constraint_residual(
        x, u=jnp.asarray([1.0, 0.0]), delta=jnp.asarray([1.0, 0.0]),
        omega=jnp.asarray([0.0, 0.0]))
    assert float(np.max(np.asarray(r2))) <= 1e-5  # one heater ok


def test_micro_grid_coordinator_respects_coupling():
    from pyhybridcontrol_tpu.agents.micro_grid import MicroGridCoordinator
    params = [DewhParams(), DewhParams(), DewhParams()]
    mg = MicroGridCoordinator(
        params, GridParams(P_max=4000.0, tou_prices=default_tou_profile()),
        N=4, solver="bnb",
        bnb_spec=BnbSpec(capacity=128, wave_size=16, qp_iters=150))
    mg.reset([np.array([50.0, 0.0])] * 3)   # all cold → all want heat
    for _ in range(3):
        sol = mg.sim_step(omega_k=np.zeros(3))
        # ≤ 1 heater of 3kW fits under 4kW
        assert sol.total_power <= 4000.0 + 1e-6
    df = mg.agents[0].history(Ts=900.0)
    assert len(df) == 3
    assert "x0" in df.columns
