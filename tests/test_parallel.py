"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4.5):
pool-sharded B&B must reproduce the single-device incumbent; scenario
sharding must match unsharded results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.admm import admm_solve, prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.parallel import (
    make_mesh, scenario_sharding, solve_miqp_bnb_sharded)
from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb


@pytest.fixture(scope="module")
def ctrl():
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    return model, c, c.device_qp(), prepare_admm_mpc(c)


def test_pool_sharded_bnb_matches_single(ctrl):
    model, c, qp, admm = ctrl
    assert len(jax.devices()) >= 4
    mesh = make_mesh([("pool", 4)])
    x0 = np.array([2.0, 0.0], np.float32)
    f, h = qp.assemble(jnp.asarray(x0))
    spec_single = BnbSpec(capacity=256, wave_size=16, qp_iters=600)
    spec_shard = BnbSpec(capacity=64, wave_size=16, qp_iters=600)
    r1 = solve_miqp_bnb(admm, qp, f, h, spec_single)
    r2 = solve_miqp_bnb_sharded(admm, qp, f, h, spec_shard, mesh)
    assert bool(r2.found)
    np.testing.assert_allclose(float(r2.obj), float(r1.obj),
                               rtol=1e-3, atol=1e-3)


def test_pool_sharded_bnb_deterministic(ctrl):
    model, c, qp, admm = ctrl
    mesh = make_mesh([("pool", 2)])
    x0 = np.array([-1.5, 1.0], np.float32)
    f, h = qp.assemble(jnp.asarray(x0))
    spec = BnbSpec(capacity=64, wave_size=8, qp_iters=400)
    r1 = solve_miqp_bnb_sharded(admm, qp, f, h, spec, mesh)
    r2 = solve_miqp_bnb_sharded(admm, qp, f, h, spec, mesh)
    assert float(r1.obj) == float(r2.obj)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_pool_sharded_infeasible(ctrl):
    model, c, qp, admm = ctrl
    mesh = make_mesh([("pool", 2)])
    f, h = qp.assemble(jnp.asarray(np.array([50.0, 0.0], np.float32)))
    r = solve_miqp_bnb_sharded(
        admm, qp, f, h, BnbSpec(capacity=32, wave_size=8, qp_iters=150), mesh)
    assert not bool(r.found)


def test_scenario_sharded_admm_batch(ctrl):
    """DP axis: a sharded batch of QP solves equals the unsharded batch."""
    model, c, qp, admm = ctrl
    mesh = make_mesh([("scen", 8)])
    B = 32
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    fs, hs = jax.vmap(qp.assemble)(x0s)
    lb = jnp.broadcast_to(qp.lb, (B, qp.n))
    ub = jnp.broadcast_to(qp.ub, (B, qp.n))

    def solve(f, h, lb, ub):
        return admm_solve(admm, f, h, lb, ub, iters=100).obj

    plain = jax.jit(solve)(fs, hs, lb, ub)

    shard = scenario_sharding(mesh)
    fs_s = jax.device_put(fs, shard)
    hs_s = jax.device_put(hs, shard)
    lb_s = jax.device_put(lb, shard)
    ub_s = jax.device_put(ub, shard)
    sharded = jax.jit(solve)(fs_s, hs_s, lb_s, ub_s)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_pool_sharded_with_repair_seed(ctrl):
    """Sharded B&B accepts the repair incumbent seed (config-5 path for
    hard MIQPs)."""
    from pyhybridcontrol_tpu.models.double_integrator import (
        default_weights as dw)
    from pyhybridcontrol_tpu.solver.repair import (
        prepare_repair, root_repair_incumbent)

    model, c, qp, admm = ctrl
    mesh = make_mesh([("pool", 2)])
    x0 = np.array([2.0, 0.0], np.float32)
    f, h = qp.assemble(jnp.asarray(x0))
    rspec = prepare_repair(model, dw())
    seed = root_repair_incumbent(admm, qp, rspec, jnp.asarray(x0), f, h,
                                 qp_iters=400)
    r = solve_miqp_bnb_sharded(
        admm, qp, f, h, BnbSpec(capacity=64, wave_size=8, qp_iters=400),
        mesh, init_incumbent=seed)
    assert bool(r.found)
    r0 = solve_miqp_bnb(admm, qp, f, h,
                        BnbSpec(capacity=256, wave_size=16, qp_iters=400))
    np.testing.assert_allclose(float(r.obj), float(r0.obj), rtol=1e-3,
                               atol=1e-3)
