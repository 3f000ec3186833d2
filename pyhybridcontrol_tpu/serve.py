"""Real-time controller serving loop:

    python -m pyhybridcontrol_tpu.serve --config double_integrator

Reads one JSON request per line on stdin, writes one JSON response per
line on stdout — the minimal production-embedding surface (wrap it in a
socket/gRPC front of your choice; the controller itself is a single
resident device program, so per-request latency is the feedback solve
measured in bench: ~1 ms at N=10 after warmup).

Request:  {"x": [..nx..], "omega": [[..]] (N,nω) opt, "price": [[..]] opt}
Response: {"u": [..], "delta": [..], "obj": f, "found": b, "ms": f}
A 2-D "x" ([[..nx..] × B]) solves the whole batch as ONE device
program (``MpcController.feedback_batch``) and returns list-valued
"u"/"delta"/"obj"/"found" — the aggregation path for many plants
behind one controller process.
Send {"cmd": "ping"} for a health check, {"cmd": "quit"} to stop.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="pyhybridcontrol_tpu.serve")
    ap.add_argument("--config", required=True)
    ap.add_argument("--solver", default="bnb",
                    choices=["bnb", "enumerate", "stagewise"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.configs import get_config
    from pyhybridcontrol_tpu.control.mpc import MpcController

    cfg = get_config(args.config)
    model, ckw = cfg.build()
    ctrl = MpcController(model, cfg.N, solver=args.solver,
                         bnb_spec=cfg.bnb, qp_iters=cfg.bnb.qp_iters, **ckw)
    if cfg.soft_rows:
        ctrl.set_soft_constraints(list(cfg.soft_rows), lin_pen=5.0,
                                  quad_pen=1.0)
    ctrl.build()
    # warmup compile so the first real request is fast
    ctrl.feedback(jnp.zeros(model.info.nx))
    print(json.dumps({"ready": True, "config": cfg.name,
                      "nx": model.info.nx, "nu": model.info.nu,
                      "N": cfg.N}), flush=True)

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            print(json.dumps({"error": f"bad json: {e}"}), flush=True)
            continue
        if req.get("cmd") == "quit":
            break
        if req.get("cmd") == "ping":
            print(json.dumps({"pong": True}), flush=True)
            continue
        try:
            x = jnp.asarray(np.asarray(req["x"], np.float32))
            W = (np.asarray(req["omega"], np.float32)
                 if req.get("omega") is not None else None)
            Pq = (np.asarray(req["price"], np.float32)
                  if req.get("price") is not None else None)
            up = (np.asarray(req["u_prev"], np.float32)
                  if req.get("u_prev") is not None else None)
            t0 = time.perf_counter()
            if x.ndim == 2:          # batched request: one device program
                sol = ctrl.feedback_batch(x, omega_forecasts=W,
                                          price_seq=Pq, u_prevs=up)
                ms = 1e3 * (time.perf_counter() - t0)
                print(json.dumps({
                    "u": np.asarray(sol.u).tolist(),
                    "delta": np.asarray(sol.delta).tolist(),
                    "obj": np.asarray(sol.obj).tolist(),
                    "found": np.asarray(sol.found).tolist(),
                    "batch": int(x.shape[0]),
                    "ms": round(ms, 3),
                }), flush=True)
                continue
            sol = ctrl.feedback(x, omega_forecast=W, price_seq=Pq,
                                u_prev=up)
            ms = 1e3 * (time.perf_counter() - t0)
            print(json.dumps({
                "u": np.asarray(sol.u).tolist(),
                "delta": np.asarray(sol.delta).tolist(),
                "obj": float(sol.obj),
                "found": bool(sol.found),
                "ms": round(ms, 3),
            }), flush=True)
        except Exception as e:  # keep serving on bad requests
            print(json.dumps({"error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
