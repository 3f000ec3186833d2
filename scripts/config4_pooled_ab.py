"""A/B: config-4 batched-MIQP throughput — vmapped per-instance B&B vs
the pooled multi-instance driver (solver/bnb_pooled.py).

Run each arm in its OWN process (CLAUDE.md: two jitted variants in one
process skew timings 10-20%):

    python scripts/config4_pooled_ab.py vmapped
    python scripts/config4_pooled_ab.py pooled [wave_size] [pool_slots]
    python scripts/config4_pooled_ab.py pooled_gated [wave_size] [pool_slots]

``pooled_gated`` = pooled + probe_patience=3 (round-3: the pooled
driver now honors probe gating — VERDICT r2 item 5); compare obj_sum
across arms for identical per-instance incumbents.

Prints one JSON line with miqp/s, nodes/s, found_frac and a per-instance
objective checksum (sum of incumbent objectives) so the two arms can be
checked for search parity.
"""

import json
import os
import sys
import time

import numpy as np

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "pooled"
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_hybrid_mpc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from pyhybridcontrol_tpu.models.double_integrator import (
        default_weights, switched_double_integrator)
    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb

    model = switched_double_integrator()
    c = CondensedMpc(model, 10, default_weights())
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    probe = prepare_admm_mpc(c, rho=10.0)

    B = 1024
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    f, h = jax.vmap(qp.assemble)(x0s)

    if arm == "vmapped":
        spec = BnbSpec(capacity=64, wave_size=16, max_waves=32,
                       qp_iters=100)
        run = jax.jit(jax.vmap(
            lambda f_, h_: solve_miqp_bnb(admm, qp, f_, h_, spec,
                                          admm_probe=probe)))
        args = (f, h)
    else:
        from pyhybridcontrol_tpu.solver.bnb_pooled import (
            solve_miqp_bnb_pooled)

        # the pooled driver sizes its pool from pool_slots, not
        # spec.capacity — capacity only needs to satisfy the
        # wave_size <= capacity construction check
        spec = BnbSpec(capacity=W, wave_size=W,
                       max_waves=4096, qp_iters=100,
                       probe_patience=3 if arm == "pooled_gated" else 0)

        def run(f_, h_):
            return solve_miqp_bnb_pooled(admm, qp, f_, h_, spec,
                                         pool_slots=P or 32 * B,
                                         admm_probe=probe)
        args = (f, h)

    r = run(*args)
    jax.block_until_ready(r)
    best = 1e30
    reps = 3
    for _ in range(reps):
        t0 = time.perf_counter()
        r = run(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    nodes = int(np.sum(np.asarray(r.nodes_solved)))
    out = dict(arm=arm, wave_size=16 if arm == "vmapped" else W,
               batch=B, best_s=round(best, 4),
               miqp_per_s=round(B / best, 1),
               nodes=nodes, nodes_per_s=round(nodes / best, 1),
               found_frac=float(np.mean(np.asarray(r.found))),
               obj_sum=float(np.sum(np.asarray(r.obj))),
               waves=int(np.max(np.asarray(r.waves))))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
