"""Closed-loop study: switched double integrator (BASELINE config 1).

Regulates x = [position, velocity] to the origin with a binary gear
choice per step (MIQP feedback). Mirrors the reference's example-script
workflow: build model → controller → simulate → inspect log.

Run:  python examples/double_integrator_study.py [--cpu] [--plot]
"""

import argparse
import os
import sys

# allow running straight from a source checkout
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)

import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--plot", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.control.mpc import MpcController
    from pyhybridcontrol_tpu.loop import closed_loop, make_mpc_step
    from pyhybridcontrol_tpu.models.double_integrator import (
        default_weights, switched_double_integrator)
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec
    from pyhybridcontrol_tpu.utils.profiling import wall_timer

    model = switched_double_integrator()
    ctrl = MpcController(
        model, N=10, weights=default_weights(), solver="bnb",
        bnb_spec=BnbSpec(capacity=256, wave_size=32, qp_iters=200))
    ctrl.build()
    step = make_mpc_step(model, ctrl.device_qp, ctrl.admm, method="bnb",
                         bnb_spec=ctrl.bnb_spec, repair=ctrl.repair)

    x0 = jnp.asarray([3.0, 1.0])
    with wall_timer("closed loop", sync=None) as t:
        res = closed_loop(model, step, x0, args.steps)
        res.objs.block_until_ready()

    xs = np.asarray(res.xs)
    vs = np.asarray(res.vs)
    print(f"T={args.steps} steps, {t['seconds']*1e3/args.steps:.2f} "
          f"ms/control step")
    print(f"|x_T| = {np.linalg.norm(xs[-1]):.4f} (from {np.linalg.norm(np.asarray(x0)):.2f})")
    print(f"gear usage: {vs[:, 1].mean()*100:.0f}% high-gear steps")
    print(f"all steps solved: {bool(np.asarray(res.found).all())}")
    print("k :  pos     vel     u      gear")
    for k in range(0, args.steps, max(1, args.steps // 10)):
        print(f"{k:2d}: {xs[k,0]:7.3f} {xs[k,1]:7.3f} "
              f"{vs[k,0]:6.3f} {vs[k,1]:5.1f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(3, 1, sharex=True, figsize=(7, 7))
        axes[0].plot(xs[:, 0], label="position")
        axes[0].plot(xs[:, 1], label="velocity")
        axes[0].legend(); axes[0].set_ylabel("state")
        axes[1].step(range(len(vs)), vs[:, 0])
        axes[1].set_ylabel("u")
        axes[2].step(range(len(vs)), vs[:, 1])
        axes[2].set_ylabel("gear δ"); axes[2].set_xlabel("k")
        fig.savefig("double_integrator_study.png", dpi=120)
        print("wrote double_integrator_study.png")


if __name__ == "__main__":
    sys.exit(main())
