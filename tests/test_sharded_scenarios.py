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
    # shift_warm off: this test pins bit-level agreement between
    # sharded and unsharded compilations of the SAME search; the
    # carried-plan seed amplifies fp reduction-order noise into
    # different (equal-cost) tie-breaks across partitionings
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
    np.testing.assert_allclose(np.asarray(sharded.xs), np.asarray(plain.xs),
                               rtol=1e-5, atol=1e-5)
    # objective values see different matmul partitionings when sharded —
    # fp32 reduction-order noise only
    np.testing.assert_allclose(np.asarray(sharded.objs),
                               np.asarray(plain.objs), rtol=1e-3, atol=1e-3)
    # and the outputs actually live sharded on the mesh
    shard_devs = {d for s in sharded.xs.addressable_shards
                  for d in [s.device]}
    assert len(shard_devs) == 8
