"""Decentralized (dual-decomposition) micro-grid vs centralized
aggregate solve (SURVEY.md §3.5 decomposed variants)."""

import numpy as np
import pytest

from pyhybridcontrol_tpu.agents.decentralized import DecentralizedMicroGrid
from pyhybridcontrol_tpu.models.dewh import DewhParams
from pyhybridcontrol_tpu.models.grid import GridParams, default_tou_profile
from pyhybridcontrol_tpu.solver.bnb import BnbSpec


def test_decentralized_respects_coupling():
    M = 4
    params = [DewhParams() for _ in range(M)]
    grid = GridParams(P_max=6000.0,          # 2 of 4 heaters at a time
                      tou_prices=default_tou_profile())
    dmg = DecentralizedMicroGrid(
        params, grid, N=4,
        bnb_spec=BnbSpec(capacity=64, wave_size=8, qp_iters=150,
                         max_waves=16),
        dual_rounds=4)
    # all cold → all want heat → congestion price must ration
    dmg.reset([np.array([50.0 + 0.2 * i, 0.0]) for i in range(M)])
    rng = np.random.default_rng(0)
    for k in range(3):
        sol = dmg.sim_step(omega_k=(rng.uniform(0, 1, M) < 0.2) * 0.3)
        assert sol.agg_power <= grid.P_max + 1e-6
        assert sol.found
    # heaters actually ran (comfort pressure)
    assert float(np.asarray(dmg.x)[:, 0].min()) > 40.0


def test_congestion_price_rises_under_scarcity():
    M = 3
    params = [DewhParams() for _ in range(M)]
    grid = GridParams(P_max=3000.0)          # only 1 of 3
    dmg = DecentralizedMicroGrid(
        params, grid, N=4,
        bnb_spec=BnbSpec(capacity=64, wave_size=8, qp_iters=150,
                         max_waves=16),
        dual_rounds=6, dual_step=5e-4)
    dmg.reset([np.array([50.0, 0.0])] * M)   # identical cold agents
    sol = dmg.feedback()
    # demand 3x capacity → positive congestion price somewhere
    assert sol.lam.max() > 0.0
    assert sol.agg_power <= grid.P_max + 1e-6
