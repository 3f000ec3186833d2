"""S=64, N=20 joint scenario-tree MIQP across the device mesh
(SURVEY.md §5 scenario-tree scale-out; VERDICT round-1 item 8 "done"
criterion). Writes TREE_SCALEOUT.json.

The dense joint build at S=64, N=20 would hold a (64·20·4)² ≈ 26M-entry
H plus a KKT inverse — and grows quadratically with S. The consensus
formulation (ops/consensus_tree.py) holds ONE single-scenario KKT
(80², shared by all scenarios) plus per-scenario iterates sharded over
the `scen` mesh axis; S is a batch dimension, so HBM grows linearly
and the tree can exceed one chip.

Probe note: fully-fixed consensus leaves are the degenerate implied-
equality case over 64 coupled scenarios — at ρ=1 they certify at
~8000 ADMM iterations; the stiff-ρ probe prep (ρ=10, see solver/bnb
CondensedBackend.admm_probe) collapses that to ~1000-1500 (measured
3.5e-4 at 1000).

Run: python scripts/tree_scaleout.py [--devices 8] [--scenarios 64]
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
    ap.add_argument("--scenarios", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--waves", type=int, default=6)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "auto"])
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{args.devices}").strip()
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.mld.info import MldInfo
    from pyhybridcontrol_tpu.mld.model import MldModel
    from pyhybridcontrol_tpu.models.double_integrator import (
        default_weights, switched_double_integrator)
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.ops.consensus_tree import (
        assemble_tree, prepare_tree_consensus, solve_tree_miqp,
        tree_admm_solve)
    from pyhybridcontrol_tpu.ops.scenario_tree import ScenarioTree
    from pyhybridcontrol_tpu.parallel import make_mesh
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec

    base = switched_double_integrator()
    m = base.numpy_mats()
    model = MldModel.from_matrices(
        MldInfo(nx=2, nu=1, ndelta=1, nz=1, nomega=1, ny=2,
                ncons=base.info.ncons),
        A=m.A, B1=m.B1, B3=m.B3, B4=np.array([[0.0], [1.0]]),
        C=m.C, E=m.E, F1=m.F1, F2=m.F2, F3=m.F3, f5=m.f5)

    S, N = args.scenarios, args.horizon
    rng = np.random.default_rng(3)
    paths = rng.normal(0.0, 0.25, size=(S, N, 1))
    levels = int(np.log2(S) / 2) if S >= 16 else 1
    steps = tuple(1 + 4 * i for i in range(max(1, int(np.round(
        np.log(S) / np.log(round(S ** (1.0 / max(1, levels)))))))))
    # simplest robust choice: branch factor 4 at steps 1,5,9 for S=64
    if S == 64:
        steps = (1, 5, 9)
    tree = ScenarioTree.from_branching(paths, branch_steps=steps)
    c = CondensedMpc(model, N, default_weights())
    tqp = prepare_tree_consensus(c, tree)
    tqp_probe = prepare_tree_consensus(c, tree, rho=10.0)
    x0 = jnp.asarray([2.0, 0.0], jnp.float32)
    f, h = assemble_tree(tqp, x0)
    mesh = make_mesh([("scen", len(jax.devices()))])

    # root relaxation (bound) + the sharded B&B
    lb = jnp.broadcast_to(tqp.qp.lb, (S, tqp.nV))
    ub = jnp.broadcast_to(tqp.qp.ub, (S, tqp.nV))
    r0 = tree_admm_solve(tqp, f, h, lb, ub, iters=1500,
                         scen_mesh=(mesh, "scen"))
    bound = float(r0.obj)
    print(f"root relaxation: obj={bound:.4f} "
          f"r={float(r0.r_prim_rel):.1e} "
          f"reps={len(tqp.binary_reps)} of {S * N}")

    spec = BnbSpec(capacity=128, wave_size=8, max_waves=args.waves,
                   qp_iters=600, probe_iters=1500, probe_patience=1,
                   root_iters=1500)
    t0 = time.perf_counter()
    r = solve_tree_miqp(tqp, f, h, spec, scen_mesh=(mesh, "scen"),
                        tqp_probe=tqp_probe)
    r.obj.block_until_ready()
    wall = time.perf_counter() - t0
    V = np.asarray(r.x).reshape(S, N, -1)
    u0 = V[:, 0, 0]
    spread = float(u0.max() - u0.min())
    gap = (float(r.obj) - bound) / max(1.0, abs(bound))
    out = dict(S=S, N=N, devices=len(jax.devices()),
               reps=len(tqp.binary_reps),
               found=bool(r.found), obj=float(r.obj),
               root_bound=bound, rel_gap_to_root=round(gap, 4),
               nodes=int(r.nodes_solved), waves=int(r.waves),
               u0_spread=spread, wall_s=round(wall, 1))
    print(json.dumps(out))
    with open(os.path.join(_repo, "TREE_SCALEOUT.json"), "w") as fp:
        json.dump(out, fp, indent=2)
    if not bool(r.found):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
