"""Micro-grid coordination study (SURVEY.md §3.5): M DEWH agents under a
shared TOU tariff with an aggregate grid power limit — one centralized
MIQP per step, inputs distributed to agents.

Run:  python examples/micro_grid_study.py [--cpu] [--agents 3]
"""

import argparse
import os
import sys

# allow running straight from a source checkout
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--agents", type=int, default=3)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from pyhybridcontrol_tpu.agents.micro_grid import MicroGridCoordinator
    from pyhybridcontrol_tpu.models.dewh import DewhParams
    from pyhybridcontrol_tpu.models.grid import (
        GridParams, default_tou_profile)
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec

    M = args.agents
    params = [DewhParams() for _ in range(M)]
    grid = GridParams(P_max=(M - 1) * 3000.0,   # one heater must wait
                      tou_prices=default_tou_profile())
    mg = MicroGridCoordinator(
        params, grid, N=4, solver="bnb",
        bnb_spec=BnbSpec(capacity=256, wave_size=32, qp_iters=200))
    mg.reset([np.array([52.0 + i, 0.0]) for i in range(M)])

    rng = np.random.default_rng(0)
    print(f"{M} agents, P_max {grid.P_max/1000:.0f} kW "
          f"({M}×3 kW heaters — coupling binds)")
    print("k : total_kW  " + "  ".join(f"T{i}(u{i})" for i in range(M)))
    for k in range(args.steps):
        draws = (rng.uniform(0, 1, M) < 0.2) * 0.5
        sol = mg.sim_step(omega_k=draws)
        temps = [float(a.x[0]) for a in mg.agents]
        us = [int(float(pa.u[0])) for pa in sol.per_agent]
        row = "  ".join(f"{t:5.1f}({u})" for t, u in zip(temps, us))
        print(f"{k:2d}: {sol.total_power/1000:7.1f}   {row}")

    df = mg.agents[0].history(Ts=params[0].Ts)
    print("\nagent 0 history (pandas):")
    print(df[[c for c in df.columns if c in
              ("x0", "u0", "delta0", "omega0")]].describe().loc[
                  ["mean", "min", "max"]])


if __name__ == "__main__":
    main()
