"""Golden closed-loop trajectories for BASELINE configs 2 and 3
(SURVEY.md §4.4 — config 1's golden lives in test_closed_loop.py).
Goldens are COMMITTED; a missing file FAILS the suite (a silently
regenerated golden would bless the current behavior — regression tests
must not self-certify). Regenerate deliberately with
``PHC_REGEN_GOLDENS=1 pytest tests/test_goldens.py``."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.loop import closed_loop, make_mpc_step
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.solver.bnb import BnbSpec
from pyhybridcontrol_tpu.solver.repair import prepare_repair

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _check_or_create(name, res):
    path = os.path.join(GOLD_DIR, name)
    xs = np.asarray(res.xs)
    cost = float(np.sum(np.asarray(res.objs)))
    if not os.path.exists(path):
        if os.environ.get("PHC_REGEN_GOLDENS"):
            os.makedirs(GOLD_DIR, exist_ok=True)
            np.savez(path, xs=xs, vs=np.asarray(res.vs), total_cost=cost)
            pytest.skip(f"golden {name} regenerated (PHC_REGEN_GOLDENS)")
        pytest.fail(
            f"golden file {name} is missing — goldens are committed "
            f"artifacts; set PHC_REGEN_GOLDENS=1 to regenerate "
            f"deliberately")
    g = np.load(path)
    np.testing.assert_allclose(xs, g["xs"], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(cost, float(g["total_cost"]), rtol=2e-3,
                               atol=2e-3)


def test_golden_config2_pwa():
    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)

    model = pwa_spring_mld(on_off=True)
    w = pwa_weights()
    c = CondensedMpc(model, 8, w)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    rspec = prepare_repair(model, w)
    step = make_mpc_step(model, qp, admm, method="bnb",
                         bnb_spec=BnbSpec(capacity=512, wave_size=64,
                                          qp_iters=300, max_waves=16,
                                          gap=1e-3),
                         repair=(rspec, "plain"))
    res = closed_loop(model, step, jnp.asarray([1.5, 0.0]), T=6)
    assert bool(np.asarray(res.found).all())
    _check_or_create("pwa_actuator_N8_T6.npz", res)


def test_golden_config3_thermal_uc():
    from pyhybridcontrol_tpu.models.dewh import (
        DewhParams, dewh_energy_price_seq, dewh_model, dewh_weights,
        min_up_down_rows)

    p = DewhParams()
    model = dewh_model(p)
    N, T = 12, 8
    c = CondensedMpc(model, N, dewh_weights())
    A_v, b = min_up_down_rows(N, model.info.nv, min_up=2)
    c = c.with_extra_constraints(A_v, b)
    c = c.with_move_blocking([k // 2 for k in range(N)])
    nc = model.info.ncons
    c = c.with_soft_constraints(
        [k * nc + r for k in range(N) for r in (0, 1)],
        lin_pen=5.0, quad_pen=1.0)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    step = make_mpc_step(model, qp, admm, method="bnb",
                         bnb_spec=BnbSpec(capacity=256, wave_size=32,
                                          qp_iters=300, max_waves=24,
                                          gap=1e-3))
    rng = np.random.default_rng(7)
    draws = (0.5 * (rng.uniform(0, 1, (T + N, 1)) < 0.25)).astype(np.float32)
    prices = dewh_energy_price_seq(np.full(T + N, 0.15), p,
                                   nv=model.info.nv).astype(np.float32)
    res = closed_loop(model, step, jnp.asarray([55.0, 0.0]), T,
                      omega_traj=jnp.asarray(draws),
                      price_traj=jnp.asarray(prices))
    assert bool(np.asarray(res.found).all())
    _check_or_create("thermal_uc_N12_T8.npz", res)


def test_golden_config2_pwa_hull():
    """The hull (disaggregated) formulation is config 2's production
    encoding — its closed loop gets its own golden."""
    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)

    model = pwa_spring_mld(on_off=True, formulation="hull")
    w = pwa_weights()
    c = CondensedMpc(model, 8, w)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    rspec = prepare_repair(model, w)
    step = make_mpc_step(model, qp, admm, method="bnb",
                         bnb_spec=BnbSpec(capacity=512, wave_size=64,
                                          qp_iters=300, probe_iters=1500,
                                          max_waves=16, gap=1e-3),
                         repair=(rspec, "plain"),
                         admm_probe=prepare_admm_mpc(c, rho=10.0))
    res = closed_loop(model, step, jnp.asarray([1.5, 0.0]), T=6)
    assert bool(np.asarray(res.found).all())
    _check_or_create("pwa_hull_N8_T6.npz", res)


@pytest.mark.slow
def test_golden_dewh_loop():
    """Golden for the config-4b closed-LOOP study (bench.py): a small
    CPU replica of the 1024-scenario DEWH fleet loop — pooled engine
    inside the scan, carried-plan warm starts — pinned to a committed
    trajectory."""
    from pyhybridcontrol_tpu.loop.closed_loop import (
        closed_loop_batch, make_mpc_step_batch)
    from pyhybridcontrol_tpu.models.dewh import (
        DewhParams, dewh_energy_price_seq, dewh_model, dewh_weights)

    p = DewhParams()
    m = dewh_model(p)
    c = CondensedMpc(m, 12, dewh_weights())
    nc = m.info.ncons
    c = c.with_soft_constraints(
        [k * nc + r for k in range(12) for r in (0, 1)],
        lin_pen=5.0, quad_pen=1.0)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    probe = prepare_admm_mpc(c, rho=10.0)
    B, T = 8, 4
    rng = np.random.default_rng(11)
    draws = (0.5 * (rng.uniform(0, 1, (B, T + 12, 1)) < 0.25)
             ).astype(np.float32)
    prices = dewh_energy_price_seq(
        np.full(T + 12, 0.15), p, nv=m.info.nv).astype(np.float32)
    x0s = np.tile(np.array([55.0, 0.0], np.float32), (B, 1))
    x0s[:, 0] += rng.uniform(-3, 3, B).astype(np.float32)
    step = make_mpc_step_batch(
        m, qp, admm,
        bnb_spec=BnbSpec(capacity=256, wave_size=64, max_waves=256,
                         qp_iters=150, probe_patience=3),
        pool_slots=32 * B, admm_probe=probe)
    res = closed_loop_batch(m, step, jnp.asarray(x0s), T,
                            omega_trajs=jnp.asarray(draws),
                            price_traj=jnp.asarray(prices))
    assert bool(np.all(np.asarray(res.found)))
    _check_or_create("dewh_loop_B8_N12_T4.npz", res)
