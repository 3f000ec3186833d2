"""Battery storage MLD (asymmetric-efficiency product logic) +
price-arbitrage closed loop."""

import jax.numpy as jnp
import numpy as np

from pyhybridcontrol_tpu.control.mpc import MpcController
from pyhybridcontrol_tpu.loop import closed_loop, make_mpc_step
from pyhybridcontrol_tpu.models.battery import (
    BatteryParams, battery_model, battery_price_seq, battery_weights)
from pyhybridcontrol_tpu.solver.bnb import BnbSpec


def test_battery_dynamics_asymmetric_efficiency():
    p = BatteryParams()
    m = battery_model(p)
    soc = jnp.asarray([0.5])
    P = 3.0
    # charging at +P for one step
    up = jnp.asarray([P]); d1 = jnp.asarray([1.0]); z1 = jnp.asarray([P])
    s1 = float(m.step(soc, up, d1, z1)[0])
    gain = s1 - 0.5
    # discharging at −P
    un = jnp.asarray([-P]); d0 = jnp.asarray([0.0]); z0 = jnp.asarray([0.0])
    s2 = float(m.step(soc, un, d0, z0)[0])
    loss = 0.5 - s2
    # physics: charge gain = η_c·P·Ts/E; discharge loss = P·Ts/(η_d·E)
    want_gain = p.eta_c * P * p.Ts_h / p.E_cap
    want_loss = P * p.Ts_h / (p.eta_d * p.E_cap)
    np.testing.assert_allclose(gain, want_gain, rtol=1e-5)
    np.testing.assert_allclose(loss, want_loss, rtol=1e-5)
    assert loss > gain            # round-trip inefficiency


def test_battery_sign_logic():
    m = battery_model()
    soc = jnp.asarray([0.5])

    def feas(P, d, z):
        r = m.constraint_residual(soc, jnp.asarray([P]), jnp.asarray([d]),
                                  jnp.asarray([z]))
        return float(np.max(np.asarray(r))) <= 1e-3

    assert feas(2.0, 1.0, 2.0)        # charging, consistent
    assert feas(-2.0, 0.0, 0.0)       # discharging, consistent
    assert not feas(2.0, 0.0, 0.0)    # p>0 with discharge mode
    assert not feas(-2.0, 1.0, -2.0)  # p<0 with charge mode


def test_battery_price_arbitrage():
    """Expensive→cheap tariff: sell immediately at the high price, then
    re-buy cheaply toward the SoC setpoint. (The reverse scenario —
    "charge now, sell later" — is the classic receding-horizon
    end-effect trap: with no terminal energy value the sale recedes
    forever, which the controller correctly exploits.)"""
    p = BatteryParams()
    model = battery_model(p)
    N, T = 6, 10
    ctrl = MpcController(model, N, battery_weights(soc_ref=0.5, q_soc=0.5),
                         solver="bnb",
                         bnb_spec=BnbSpec(capacity=128, wave_size=16,
                                          qp_iters=300))
    ctrl.build()
    step = make_mpc_step(model, ctrl.device_qp, ctrl.admm, method="bnb",
                         bnb_spec=ctrl.bnb_spec, repair=ctrl.repair)
    prices = np.concatenate([np.full(4, 0.45), np.full(T + N - 4, 0.05)])
    pseq = battery_price_seq(prices, p, nv=model.info.nv).astype(np.float32)
    res = closed_loop(model, step, jnp.asarray([0.8]), T,
                      price_traj=jnp.asarray(pseq))
    assert bool(np.asarray(res.found).all())
    ps = np.asarray(res.vs)[:, 0]
    soc = np.asarray(res.xs)[:, 0]
    assert ps[:4].sum() < -2.0, ps        # sells during the peak
    assert soc[4] < 0.6                   # meaningfully discharged
    assert soc.max() <= 0.9 + 1e-3 and soc.min() >= 0.1 - 1e-3


def test_battery_feedback_oracle_parity():
    """One battery MIQP feedback vs the exact fp64 enumeration oracle
    (the mode/product logic exercises all four z rows + the sign pair)."""
    from pyhybridcontrol_tpu.solver.oracle import (
        solve_miqp_enumeration_oracle)

    p = BatteryParams()
    model = battery_model(p)
    N = 6
    ctrl = MpcController(model, N, battery_weights(soc_ref=0.5, q_soc=2.0),
                         solver="bnb",
                         bnb_spec=BnbSpec(capacity=128, wave_size=16,
                                          qp_iters=400))
    ctrl.build()
    pseq = battery_price_seq(np.full(N, 0.05), p,
                             nv=model.info.nv).astype(np.float32)
    sol = ctrl.feedback(jnp.asarray([0.26]), price_seq=pseq)
    assert bool(sol.found)
    c = ctrl.condensed
    fo, ho = c.assemble_np(np.array([0.26]),
                           price_seq=np.asarray(pseq, np.float64))
    r = solve_miqp_enumeration_oracle(c.H, fo, c.G, ho, c.lb, c.ub,
                                      c.binary_idx)
    assert r.status == "optimal"
    assert float(sol.obj) <= r.obj + 0.05 * max(1.0, abs(r.obj))
    assert float(sol.obj) >= r.obj - 5e-3
