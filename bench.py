"""Benchmark harness (BASELINE.md): prints ONE JSON line with the
north-star metric — relaxed-QP solves/s/chip at horizon N=20
(target ≥ 10,000; BASELINE.json).

Also measures B&B nodes/s and per-control-step wall time, written to
BENCH_DETAILS.json (the driver records only the stdout JSON line).

Run on the real TPU chip: python bench.py
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pyhybridcontrol_tpu.models.double_integrator import (
        switched_double_integrator, default_weights)
    from pyhybridcontrol_tpu.ops.admm import admm_solve, prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb

    dev = jax.devices()[0]
    details = {"device": str(dev), "backend": jax.default_backend()}

    # ---- primary: relaxed-QP solves/s/chip at N=20 ----------------------
    N = 20
    model = switched_double_integrator()
    c = CondensedMpc(model, N, default_weights())
    qp = c.device_qp()
    admm = prepare_admm_mpc(c)
    ITERS = 100
    B = 4096
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))

    @jax.jit
    def batch_relax(x0s):
        fs, hs = jax.vmap(qp.assemble)(x0s)
        lb = jnp.broadcast_to(qp.lb, (B, qp.n))
        ub = jnp.broadcast_to(qp.ub, (B, qp.n))
        res = admm_solve(admm, fs, hs, lb, ub, iters=ITERS)
        return res.obj, res.r_prim

    obj, rp = batch_relax(x0s)          # compile
    obj.block_until_ready()
    t0 = time.perf_counter()
    REPS = 10
    for _ in range(REPS):
        obj, rp = batch_relax(x0s)
    obj.block_until_ready()
    dt = time.perf_counter() - t0
    solves_per_s = B * REPS / dt
    details["qp_solves_per_s"] = solves_per_s
    details["qp_iters"] = ITERS
    details["qp_batch"] = B
    details["qp_n"] = int(qp.n)
    details["qp_m"] = int(qp.m)
    details["qp_feasible_frac"] = float(np.mean(np.asarray(rp) < 1e-3))

    # ---- secondary: B&B nodes/s and per-step wall time at N=20 ----------
    spec = BnbSpec(capacity=512, wave_size=64, max_waves=64, qp_iters=ITERS)
    x0 = jnp.asarray(np.array([2.0, 0.0], np.float32))

    @jax.jit
    def feedback(x0):
        f, h = qp.assemble(x0)
        return solve_miqp_bnb(admm, qp, f, h, spec)

    r = feedback(x0)
    r.obj.block_until_ready()
    t0 = time.perf_counter()
    BREPS = 5
    nodes = 0
    for _ in range(BREPS):
        r = feedback(x0)
        r.obj.block_until_ready()
        nodes += int(r.nodes_solved)
    dt_b = time.perf_counter() - t0
    details["bnb_nodes_per_s"] = nodes / dt_b
    details["bnb_step_wall_s"] = dt_b / BREPS
    details["bnb_found"] = bool(r.found)
    details["bnb_nodes_per_solve"] = int(r.nodes_solved)
    details["bnb_waves"] = int(r.waves)

    with open(os.path.join(os.path.dirname(__file__) or ".",
                           "BENCH_DETAILS.json"), "w") as fp:
        json.dump(details, fp, indent=2)

    print(json.dumps({
        "metric": "relaxed-QP solves/s/chip @ N=20 (100-iter ADMM)",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 10000.0, 3),
    }))


if __name__ == "__main__":
    main()
