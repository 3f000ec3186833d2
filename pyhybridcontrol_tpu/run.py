"""CLI runner:  python -m pyhybridcontrol_tpu.run --config <name>
[--steps T] [--batch B] [--log out.jsonl] [--checkpoint ckpt.bin]
[--solver bnb|enumerate] [--cpu]

Runs one BASELINE benchmark config end-to-end (closed loop or batched
solve), prints per-run metrics, optionally writes structured logs and a
final checkpoint (SURVEY.md §5 config/flag system).
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pyhybridcontrol_tpu.run")
    ap.add_argument("--config", required=True)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--solver", default="bnb",
                    choices=["bnb", "enumerate"])
    ap.add_argument("--log", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend (8 virtual devices)")
    args = ap.parse_args(argv)

    if args.cpu:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.configs import get_config
    from pyhybridcontrol_tpu.control.mpc import MpcController
    from pyhybridcontrol_tpu.io.logging import StructuredLog
    from pyhybridcontrol_tpu.loop import closed_loop, make_mpc_step
    from pyhybridcontrol_tpu.models.dewh import min_up_down_rows

    cfg = get_config(args.config)
    T = args.steps or cfg.T
    B = args.batch or cfg.batch
    model, ckw = cfg.build()

    ctrl = MpcController(model, cfg.N, solver=args.solver, bnb_spec=cfg.bnb,
                         qp_iters=cfg.bnb.qp_iters, **ckw)
    if cfg.soft_rows:
        ctrl.set_soft_constraints(list(cfg.soft_rows), lin_pen=5.0,
                                  quad_pen=1.0)
    if cfg.move_blocking:
        ctrl.set_move_blocking(list(cfg.move_blocking))
    if cfg.name == "thermal_uc":
        A_v, b = min_up_down_rows(cfg.N, model.info.nv, min_up=2)
        if len(b):
            ctrl.set_extra_constraints(A_v, b)
    ctrl.build()

    step = make_mpc_step(model, ctrl.device_qp, ctrl.admm,
                         method=args.solver, bnb_spec=cfg.bnb,
                         qp_iters=cfg.bnb.qp_iters, repair=ctrl.repair)

    rng = np.random.default_rng(0)
    nx = model.info.nx
    if cfg.name.startswith("thermal"):
        x0 = np.tile([55.0, 0.0], nx // 2)[:nx]
    else:
        x0 = rng.uniform(-2, 2, size=nx)
    x0 = jnp.asarray(x0, jnp.float32)

    t0 = time.perf_counter()
    if B > 1:
        x0s = jnp.asarray(rng.uniform(-2, 2, size=(B, nx)).astype(np.float32))
        run = jax.jit(jax.vmap(lambda x: closed_loop(model, step, x, T)))
        res = run(x0s)
        res.objs.block_until_ready()
        wall = time.perf_counter() - t0
        n_solves = B * T
        print(json.dumps({
            "config": cfg.name, "batch": B, "steps": T,
            "wall_s": round(wall, 3),
            "miqp_solves_per_s": round(n_solves / wall, 1),
            "found_frac": float(np.mean(np.asarray(res.found))),
        }))
    else:
        res = closed_loop(model, step, x0, T)
        res.objs.block_until_ready()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "config": cfg.name, "steps": T, "wall_s": round(wall, 3),
            "ms_per_control_step": round(1e3 * wall / T, 2),
            "found_frac": float(np.mean(np.asarray(res.found))),
            "total_cost": float(np.sum(np.asarray(res.objs))),
            "mean_nodes": float(np.mean(np.asarray(res.nodes))),
        }))

    if args.log:
        log = StructuredLog(args.log, run_name=cfg.name)
        if B == 1:
            log.log_closed_loop(res)
        log.close()
    if args.checkpoint:
        from pyhybridcontrol_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, res, step=T,
                        metadata={"config": cfg.name})


if __name__ == "__main__":
    main()
