"""Weak-scaling harness for the sharded B&B (BASELINE config 5 /
SURVEY.md §6: ≥80% efficiency to 2 hosts).

Measures nodes/s of the pool-sharded B&B at pool sizes 1, 2, 4, …
with per-device pool capacity and wave size HELD CONSTANT (weak
scaling), plus the scenario-DP axis at fixed per-device batch.

On this single-chip environment the mesh is 8 virtual CPU devices —
the numbers validate the *machinery* (collectives inside the wave
loop, efficiency accounting); absolute throughput and the real ≥2-host
measurement need pod hardware (run this same script there: it uses
whatever devices JAX exposes).

Run: python scripts/weak_scaling.py [--devices 8] [--platform cpu|auto]
(default cpu: virtual-device validation; use --platform auto on pods)
"""

import argparse
import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--qp-iters", type=int, default=200)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "auto"])
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.devices}").strip()
    import jax

    if args.platform == "cpu":
        # must happen BEFORE any backend init (jax.devices() initializes
        # every backend — see .claude/skills/verify/SKILL.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)
    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.parallel import make_mesh, solve_miqp_bnb_sharded
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec

    from pyhybridcontrol_tpu.solver.repair import (
        prepare_repair, root_repair_incumbent)

    ndev_avail = len(jax.devices())
    # PWA model: weak relaxations → genuinely deep search trees, so the
    # pool actually fills and node throughput is the binding quantity
    model = pwa_spring_mld(on_off=True)
    w = pwa_weights()
    c = CondensedMpc(model, 10, w)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    x0 = np.array([1.5, 0.0], np.float32)
    f, h = qp.assemble(jnp.asarray(x0))
    # repair-seed the incumbent (coupled PWA binaries defeat probe
    # rounding — without a seed the wave-capped run finds nothing and
    # pruning never engages, which is the unrealistic regime)
    rspec = prepare_repair(model, w)
    seed = (root_repair_incumbent(admm, qp, rspec, jnp.asarray(x0), f, h,
                                  qp_iters=args.qp_iters)
            if rspec is not None else None)

    results = {}
    base_rate = None
    P = 1
    while P <= ndev_avail:
        mesh = make_mesh([("pool", P)])
        # weak scaling: constant per-device capacity & wave size
        spec = BnbSpec(capacity=256, wave_size=16 * P, max_waves=30,
                       qp_iters=args.qp_iters, warm_start=True)
        r = solve_miqp_bnb_sharded(admm, qp, f, h, spec, mesh,
                                   init_incumbent=seed)
        r.obj.block_until_ready()
        t0 = time.perf_counter()
        reps = 3
        nodes = 0
        for _ in range(reps):
            r = solve_miqp_bnb_sharded(admm, qp, f, h, spec, mesh,
                                       init_incumbent=seed)
            r.obj.block_until_ready()
            nodes += int(r.nodes_solved)
        dt = (time.perf_counter() - t0) / reps
        rate = nodes / reps / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * P)
        results[P] = dict(nodes_per_s=round(rate, 1),
                          efficiency=round(eff, 3),
                          found=bool(r.found), obj=float(r.obj),
                          waves=int(r.waves))
        print(f"pool={P}: {rate:10.1f} nodes/s  "
              f"weak-efficiency {eff*100:5.1f}%  "
              f"obj {float(r.obj):.4f}  waves {int(r.waves)}")
        P *= 2

    with open(os.path.join(_repo, "WEAK_SCALING.json"), "w") as fp:
        json.dump({"devices": str(jax.devices()[0]),
                   "results": results}, fp, indent=2)
    objs = [v["obj"] for v in results.values() if v["found"]]
    if objs:
        spread = max(objs) - min(objs)
        print(f"incumbent spread across pool sizes: {spread:.4f}")


if __name__ == "__main__":
    main()
