"""Pool-sharded branch-and-bound over a device mesh (SURVEY.md §2b
``dist/collective``; BASELINE config 5).

Each device owns a shard of the node pool for ONE MIQP and runs the same
wave loop as the single-chip engine (solver/bnb.py ``_bnb_loop``) with
three collectives riding the mesh axis:

  * incumbent: all-reduce-min of (obj, solution) each wave — ``pmin`` +
    an all-gather of the tiny solution vector (ICI within a slice, DCN
    across hosts — same code, JAX SPMD).
  * load balance: the child-1 batch of every wave is scattered
    round-robin across devices with ``all_to_all``, so work spreads
    geometrically from the root device instead of staying put.
  * termination: OR-reduce of "any node active".

The wave loop is lock-step SPMD: every device runs the same number of
waves (the while cond consumes the OR-reduced flag), so collectives
inside the loop always match up.

Determinism: same seeds/inputs ⇒ identical incumbents and pruning
decisions run-to-run (tested vs the single-device engine, §4.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pyhybridcontrol_tpu.ops.admm import BoxQP
from pyhybridcontrol_tpu.ops.condense import DeviceQP
from pyhybridcontrol_tpu.solver.bnb import (BnbResult, BnbSpec,
    CondensedBackend, _bnb_loop)


def solve_miqp_bnb_sharded(admm: BoxQP, qp: DeviceQP, f, h,
                           spec: BnbSpec, mesh: Mesh,
                           axis: str = "pool",
                           init_incumbent=None,
                           admm_probe=None) -> BnbResult:
    """Solve one MIQP with its B&B pool sharded over ``mesh[axis]``.

    ``spec.capacity``/``wave_size`` are per-device. Problem data
    (admm, qp, f, h) is replicated, as is the optional
    ``init_incumbent`` (obj, V, ok) heuristic seed (e.g. rollout
    repair). Returns a replicated BnbResult whose nodes_solved/waves
    are the global totals.
    """
    ndev = mesh.shape[axis]

    def reduce_incumbent(inc_obj, inc_x, inc_found):
        objs = jax.lax.all_gather(inc_obj, axis)          # (ndev,)
        xs = jax.lax.all_gather(inc_x, axis)              # (ndev, n)
        founds = jax.lax.all_gather(inc_found, axis)
        k = jnp.argmin(objs)
        return objs[k], xs[k], jnp.any(founds)

    def exchange_children(c1):
        # Round-robin scatter: device d keeps child i where i % ndev maps
        # to it after all_to_all. W must be divisible by ndev.
        def scatter(arr):
            Wl = arr.shape[0]
            x = arr.reshape((Wl // ndev, ndev) + arr.shape[1:])
            x = jnp.moveaxis(x, 1, 0)                     # (ndev, W/ndev, …)
            x = jax.lax.all_to_all(x, axis, 0, 0, tiled=False)
            return x.reshape((Wl,) + arr.shape[1:])
        return {k: scatter(v) for k, v in c1.items()}

    def global_any_active(alive):
        return jnp.any(jax.lax.all_gather(alive, axis))

    def reduce_min(x):
        # rel_gap termination reads the GLOBAL best open bound so every
        # device exits the lock-step while_loop on the same wave.
        return jnp.min(jax.lax.all_gather(x, axis))

    def shard_body(f_, h_, seed):
        dev = jax.lax.axis_index(axis)
        res = _bnb_loop(
            CondensedBackend(admm, qp, admm_probe), f_, h_, spec,
            root_active=True,   # mask below: only device 0 starts the root
            exchange_children=exchange_children,
            reduce_incumbent=reduce_incumbent,
            global_any_active=global_any_active,
            root_device_pred=(dev == 0),
            init_incumbent=seed,
            reduce_min=reduce_min,
        )
        # aggregate counters
        nodes = jax.lax.psum(res.nodes_solved, axis)
        overflow = jnp.any(jax.lax.all_gather(res.overflow, axis))
        best_open = jnp.min(jax.lax.all_gather(res.best_open_bound, axis))
        return BnbResult(x=res.x, obj=res.obj, found=res.found,
                         waves=res.waves, nodes_solved=nodes,
                         overflow=overflow, best_open_bound=best_open)

    if spec.wave_size % ndev != 0:
        raise ValueError("wave_size must be divisible by the pool axis size")

    seed_specs = (None if init_incumbent is None
                  else tuple(P() for _ in init_incumbent))
    fn = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(), seed_specs),
        out_specs=BnbResult(x=P(), obj=P(), found=P(), waves=P(),
                            nodes_solved=P(), overflow=P(),
                            best_open_bound=P()),
        check_vma=False,
    )
    return fn(f, h, init_incumbent)
