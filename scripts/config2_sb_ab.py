"""A/B: batched root strong branching (BnbSpec.sb_iters) on the
certified-gap operating points of configs 2 and 3 — does one
kernel-grain batch of 2·nb candidate-child solves at the root buy a
measurably smaller tree to the same certified gap? (VERDICT r3 item 3:
the TPU-native tree-shrinker.)

Run each arm in its OWN process (CLAUDE.md: two jitted variants in one
process skew timings 10-20%):

    python scripts/config2_sb_ab.py config2 0       # baseline
    python scripts/config2_sb_ab.py config2 200     # sb_iters=200
    python scripts/config2_sb_ab.py config3 0
    python scripts/config2_sb_ab.py config3 200

Round-4 extra arms (both certified-sound — search order / root
convergence only, bounds and pruning unchanged):

    --dt=1e-2     BnbSpec.depth_tiebreak (diving on bound plateaus)
    --root=3200   BnbSpec.root_iters (pre-converged root relaxation)
    --W=64        wave_size (config2 arm; tree-size vs wave-count trade)
    --cap=8192    pool capacity (config2 arm; 2048 overflows this tree)

Round-5 arms (VERDICT r4 item 2 — chip-trustworthy certificates):

    --dd          prepare the ADMM specs with dd_cert=True: Falk-bound
                  and infeasibility-cert reductions run double-float
                  compensated (utils/dd.py); SB candidate solves take
                  the XLA cert-grade path (solver/bnb.py solve_cert)
    --fix         BnbSpec.sb_fix=True (certificate fixing + root-bound
                  lift — the arms gated off after the round-4 chip
                  negative result; re-test WITH --dd)
    --dive=16     BnbSpec.dive_slots (guaranteed diving lane — the
                  probe-starvation fix for the root x sb order)

Prints one JSON line with waves/nodes/ms to the rel_gap stop plus the
incumbent objective and certified gap, so arms can be compared for both
tree size AND search parity (objectives must agree to ~1e-3 rel).
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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args[0] if args else "config2"
    sb = int(args[1]) if len(args) > 1 else 0
    reps = int(args[2]) if len(args) > 2 else 3
    dt_tb = 0.0
    root_it = 0
    wave_w = 128
    cap = 2048
    dd = "--dd" in sys.argv
    sb_fix = "--fix" in sys.argv
    dive = 0
    for a in sys.argv[1:]:
        if a.startswith("--dt="):
            dt_tb = float(a[5:])
        elif a.startswith("--root="):
            root_it = int(a[7:])
        elif a.startswith("--W="):
            wave_w = int(a[4:])
        elif a.startswith("--cap="):
            cap = int(a[6:])
        elif a.startswith("--dive="):
            dive = int(a[7:])
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_hybrid_mpc_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb

    if which == "config2":
        from pyhybridcontrol_tpu.models.pwa_examples import (
            pwa_spring_mld, pwa_weights)
        from pyhybridcontrol_tpu.solver.repair import (
            prepare_repair, root_repair_incumbent)

        mpwa = pwa_spring_mld(on_off=True, formulation="hull")
        cpw = CondensedMpc(mpwa, 20, pwa_weights())
        qpw, admw = cpw.device_qp(), prepare_admm_mpc(cpw, dd_cert=dd)
        admw_p = prepare_admm_mpc(cpw, rho=10.0, dd_cert=dd)
        rspec = prepare_repair(mpwa, pwa_weights())
        spec = BnbSpec(capacity=cap, wave_size=wave_w,
                       # equal node budget across arms: ceil keeps at
                       # least one wave even when --W > 128 (ADVICE r4:
                       # 64*(128//W) truncates to 0 there)
                       max_waves=max(1, -(-64 * 128 // wave_w)),
                       qp_iters=200, probe_iters=600, gap=1e-3,
                       probe_patience=3, rel_gap=0.02, sb_iters=sb,
                       sb_fix=sb_fix, dive_slots=dive,
                       depth_tiebreak=dt_tb, root_iters=root_it)

        @jax.jit
        def run(x0):
            f_, h_ = qpw.assemble(x0)
            seed = root_repair_incumbent(admw, qpw, rspec, x0, f_, h_,
                                         qp_iters=400)
            return solve_miqp_bnb(admw, qpw, f_, h_, spec,
                                  init_incumbent=seed, admm_probe=admw_p)

        x0 = jnp.asarray([1.5, 0.0])
    elif which == "config3":
        from pyhybridcontrol_tpu.models.dewh import (
            dewh_model, dewh_weights, min_up_down_rows, DewhParams)

        p3 = DewhParams()
        m3 = dewh_model(p3)
        c3 = CondensedMpc(m3, 24, dewh_weights())
        A_v, bex = min_up_down_rows(24, m3.info.nv, min_up=2)
        c3 = c3.with_extra_constraints(A_v, bex)
        c3 = c3.with_move_blocking([k // 2 for k in range(24)])
        nc3 = m3.info.ncons
        c3 = c3.with_soft_constraints(
            [k * nc3 + r for k in range(24) for r in (0, 1)],
            lin_pen=5.0, quad_pen=1.0)
        qpw, admw = c3.device_qp(), prepare_admm_mpc(c3, dd_cert=dd)
        admw_p = prepare_admm_mpc(c3, rho=10.0, dd_cert=dd)
        spec = BnbSpec(capacity=512, wave_size=64, max_waves=32,
                       qp_iters=200, gap=1e-3, rel_gap=0.02, sb_iters=sb,
                       sb_fix=sb_fix, dive_slots=dive,
                       depth_tiebreak=dt_tb, root_iters=root_it)

        @jax.jit
        def run(x0):
            f_, h_ = qpw.assemble(x0)
            return solve_miqp_bnb(admw, qpw, f_, h_, spec,
                                  admm_probe=admw_p)

        x0 = jnp.asarray([55.0, 0.0])
    else:
        raise SystemExit(f"unknown instance {which!r}")

    r = jax.block_until_ready(run(x0))        # compile + warm
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        r = jax.block_until_ready(run(x0))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    obj, bo = float(r.obj), float(r.best_open_bound)
    print(json.dumps({
        "instance": which, "sb_iters": sb,
        "dd_cert": dd, "sb_fix": sb_fix, "dive_slots": dive,
        "depth_tiebreak": dt_tb, "root_iters": root_it,
        "wave_size": wave_w, "capacity": cap,
        "backend": jax.default_backend(),
        "ms": round(1e3 * best, 2), "reps": reps,
        "waves": int(r.waves), "nodes": int(r.nodes_solved),
        "objective": round(obj, 5), "found": bool(r.found),
        "certified_rel_gap": (round((obj - bo) / max(1.0, abs(obj)), 5)
                              if np.isfinite(bo) and bo < obj else 0.0),
    }))


if __name__ == "__main__":
    main()
