"""Scenario-DP sharding of the FULL closed loop (config 4→5 bridge):
a batch of closed-loop simulations sharded over the `scen` mesh axis
must equal the unsharded batch."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pyhybridcontrol_tpu.loop import closed_loop, make_mpc_step
from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.parallel import make_mesh
from pyhybridcontrol_tpu.solver.bnb import BnbSpec


def test_sharded_closed_loop_batch():
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    # shift_warm off: the carried-plan seed amplifies fp reduction-order
    # noise into additional (equal-cost) tie-break divergence across
    # partitionings, on top of the certified-bound prune flips noted
    # below
    step = make_mpc_step(model, qp, admm, method="bnb",
                         bnb_spec=BnbSpec(capacity=64, wave_size=8,
                                          qp_iters=200, max_waves=24),
                         shift_warm=False)
    B, T = 16, 4
    rng = np.random.default_rng(5)
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    run = jax.jit(jax.vmap(lambda x: closed_loop(model, step, x, T)))

    plain = run(x0s)

    mesh = make_mesh([("scen", 8)])
    x0s_sharded = jax.device_put(x0s, NamedSharding(mesh, P("scen")))
    sharded = run(x0s_sharded)
    # States agree only up to within-gap solution equivalence: certified
    # dual-bound pruning (solver/bnb.py) is a threshold crossing of an
    # fp32 matmul result, and sharded vs unsharded compilations partition
    # those matmuls differently — a node at the prune boundary can flip,
    # yielding a different incumbent that is still within BnbSpec.gap of
    # optimal. Objectives are the guaranteed-equal quantity (below).
    np.testing.assert_allclose(np.asarray(sharded.xs), np.asarray(plain.xs),
                               rtol=1e-2, atol=5e-3)
    # Only step 0 solves the SAME MIQP in both runs (same x0); later
    # steps evaluate at already-diverged states, so their objectives
    # differ by O(state diff), not by gap.
    np.testing.assert_allclose(np.asarray(sharded.objs[:, 0]),
                               np.asarray(plain.objs[:, 0]),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sharded.objs),
                               np.asarray(plain.objs), rtol=2e-2, atol=1e-2)
    # and the outputs actually live sharded on the mesh
    shard_devs = {d for s in sharded.xs.addressable_shards
                  for d in [s.device]}
    assert len(shard_devs) == 8
