"""Multi-process (multi-host code path) smoke test — SURVEY.md §4.5:
two processes on one host over loopback DCN via
``jax.distributed.initialize``, each with 2 virtual CPU devices, running
the pool-sharded B&B over the 4-device global mesh. The incumbent
all-reduce and child all_to_all cross the process boundary exactly as
they would cross hosts on a pod.

Run (spawns both workers):      python scripts/multihost_smoke.py
Run one worker (internal use):  python scripts/multihost_smoke.py \
                                    --process-id K --num-processes 2
Exit code 0 iff the distributed incumbent matches the single-process
reference within tolerance on every worker.
"""

import argparse
import os
import subprocess
import sys

PORT = 12355
LOCAL_DEVICES = 2


def worker(process_id: int, num_processes: int) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.models.double_integrator import (
        default_weights, switched_double_integrator)
    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.parallel import make_mesh, solve_miqp_bnb_sharded
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb

    assert jax.process_count() == num_processes
    ndev = len(jax.devices())
    assert ndev == num_processes * LOCAL_DEVICES, ndev

    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    qp = c.device_qp()
    admm = prepare_admm_mpc(c)
    x0 = np.array([2.0, 0.0], np.float32)
    f, h = qp.assemble(jnp.asarray(x0))

    ref = solve_miqp_bnb(admm, qp, f, h,
                         BnbSpec(capacity=256, wave_size=16, qp_iters=400))

    mesh = make_mesh([("pool", ndev)])
    r = solve_miqp_bnb_sharded(
        admm, qp, f, h,
        BnbSpec(capacity=64, wave_size=ndev * 4, qp_iters=400), mesh)
    obj = float(np.asarray(jax.device_get(r.obj)))
    ok = bool(np.asarray(jax.device_get(r.found))) and (
        abs(obj - float(ref.obj)) <= 1e-3 * max(1.0, abs(float(ref.obj))))
    print(f"[proc {process_id}] sharded obj={obj:.5f} "
          f"ref={float(ref.obj):.5f} ok={ok}", flush=True)
    jax.distributed.shutdown()
    return 0 if ok else 1


def launcher(num_processes: int = 2, timeout: int = 300) -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for k in range(num_processes):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(k), "--num-processes", str(num_processes)],
            cwd=repo, env=env,
        ))
    rc = 0
    for p in procs:
        try:
            rc |= p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    print("multihost smoke:", "PASS" if rc == 0 else "FAIL")
    return rc


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(launcher(args.num_processes))
    sys.exit(worker(args.process_id, args.num_processes))
