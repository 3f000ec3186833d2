"""Formulation study: big-M vs hull (disaggregated) PWA→MLD encodings
on the config-2 plant (PWA spring + on/off actuator).

The two encodings describe the SAME MIQP, but their QP relaxations
differ radically: big-M relaxes to a structurally loose bound (root
bound 0 while the optimum is ~62), so branch-and-bound cannot prune
and ships whatever incumbent the heuristics found; the hull encoding
is locally ideal (each step's relaxation is the convex hull of the
region disjunction), so bounds engage, incumbents improve, and the
solver reports a CERTIFIED optimality gap. (mld/pwa.py; measured on
the N=20 instance: big-M incumbent 82.78 with infinite gap, hull
incumbent 61.90 with ~7% certified gap at the same wave budget.)

Run:  python examples/pwa_formulation_study.py [--cpu] [--N 12]
"""

import argparse
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--N", type=int, default=12)
    ap.add_argument("--waves", type=int, default=12)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)
    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb
    from pyhybridcontrol_tpu.solver.repair import (
        prepare_repair, root_repair_incumbent)
    from pyhybridcontrol_tpu.utils.profiling import wall_timer

    x0 = jnp.asarray([1.5, 0.0])
    w = pwa_weights()
    results = {}
    for form in ("bigm", "hull"):
        model = pwa_spring_mld(on_off=True, formulation=form)
        c = CondensedMpc(model, args.N, w)
        qp, admm = c.device_qp(), prepare_admm_mpc(c)
        probe = prepare_admm_mpc(c, rho=10.0)
        rspec = prepare_repair(model, w)
        f, h = qp.assemble(x0)
        seed = root_repair_incumbent(admm, qp, rspec, x0, f, h,
                                     qp_iters=400)
        spec = BnbSpec(capacity=1024, wave_size=64,
                       max_waves=args.waves, qp_iters=200,
                       probe_iters=1000, gap=1e-3)
        with wall_timer(form, sync=None) as t:
            r = solve_miqp_bnb(admm, qp, f, h, spec,
                               init_incumbent=seed, admm_probe=probe)
            r.obj.block_until_ready()
        obj = float(r.obj)
        bo = float(r.best_open_bound)
        gap = ((obj - bo) / max(1.0, abs(obj))
               if np.isfinite(bo) and bo < obj else 0.0)
        results[form] = obj
        print(f"{form:5s}: incumbent {obj:10.4f}   certified gap "
              f"{'inf' if gap > 1e6 else f'{100 * gap:6.2f}%'}   "
              f"nodes {int(r.nodes_solved):5d}   "
              f"{t['seconds']:.1f}s  (nv={c.H.shape[0]}, "
              f"m={c.G.shape[0]})")
    better = results["bigm"] - results["hull"]
    print(f"hull incumbent better by {better:.4f} "
          f"({100 * better / abs(results['bigm']):.1f}% of big-M)")
    print(f"hull <= bigm: {results['hull'] <= results['bigm'] + 1e-6}")


if __name__ == "__main__":
    main()
