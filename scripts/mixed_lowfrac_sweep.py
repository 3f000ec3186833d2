"""Sweep the in-kernel mixed-precision split point (ops/pallas_admm.py
``low_frac``) on the primary-metric workload: what fraction of the 100
ADMM iterations can run on the manual bf16 3-pass matmuls before the
final full-precision (6-pass) phase stops recovering the objective?

Run ONE low_frac per process (CLAUDE.md: two jitted variants in one
process skew timings 10-20%):

    python scripts/mixed_lowfrac_sweep.py 0.8
    python scripts/mixed_lowfrac_sweep.py 0.9

Prints one JSON line: solves/s (marginal-differencing harness, median
of 3 — bench.py's primary methodology) plus the max relative objective
delta vs the full-precision kernel in the same process (parity gate:
adopt only if ≤1e-4).
"""

import json
import os
import sys

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main():
    low_frac = float(sys.argv[1]) if len(sys.argv) > 1 else 0.8
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/tpu_hybrid_mpc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from bench import _timeit_marginal
    from pyhybridcontrol_tpu.models.double_integrator import (
        default_weights, switched_double_integrator)
    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.ops.pallas_admm import (
        admm_solve_pallas, pallas_for)

    N, ITERS, B = 20, 100, 4096
    model = switched_double_integrator()
    c20 = CondensedMpc(model, N, default_weights())
    qp20 = c20.device_qp()
    admm20 = prepare_admm_mpc(c20)
    pq20 = pallas_for(admm20)
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))

    def make(lf):
        @jax.jit
        def batch_relax(x0s):
            fs, hs = jax.vmap(qp20.assemble)(x0s)
            lb = jnp.broadcast_to(qp20.lb, (B, qp20.n))
            ub = jnp.broadcast_to(qp20.ub, (B, qp20.n))
            res = admm_solve_pallas(pq20, fs, hs, lb, ub, iters=ITERS,
                                    low_frac=lf)
            return res.obj, res.r_prim_rel

        return batch_relax

    mixed = make(low_frac)
    dt = _timeit_marginal(mixed, x0s)
    obj_m, _ = mixed(x0s)
    # parity vs the full-precision kernel (compiled second so the timed
    # program above owns the process-warm slot)
    obj_f, _ = make(0.0)(x0s)
    par = float(np.max(np.abs(np.asarray(obj_m) - np.asarray(obj_f))
                       / np.maximum(1.0, np.abs(np.asarray(obj_f)))))
    print(json.dumps({
        "low_frac": low_frac, "backend": jax.default_backend(),
        "solves_per_s": round(B / dt, 1),
        "parity_max_rel_obj_delta": par,
    }))


if __name__ == "__main__":
    main()
