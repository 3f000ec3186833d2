"""Pallas ADMM kernel vs the XLA path (interpret mode on CPU; the real
TPU run is compared in bench experiments — HIGHEST-precision dots keep
them within fp32 noise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.admm import admm_solve, prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.ops.pallas_admm import (
    admm_solve_pallas, prepare_pallas)


def test_pallas_matches_xla_interpret(rng):
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    qp = c.device_qp()
    spec = prepare_admm_mpc(c)
    pq = prepare_pallas(spec)
    B = 128
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    fs, hs = jax.vmap(qp.assemble)(x0s)
    lb = jnp.broadcast_to(qp.lb, (B, qp.n))
    ub = jnp.broadcast_to(qp.ub, (B, qp.n))
    ref = admm_solve(spec, fs, hs, lb, ub, iters=60)
    pal = admm_solve_pallas(pq, fs, hs, lb, ub, iters=60, interpret=True)
    np.testing.assert_allclose(np.asarray(pal.obj), np.asarray(ref.obj),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(ref.x),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal.r_prim),
                               np.asarray(ref.r_prim), atol=1e-4)


def test_pallas_padding_shapes():
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    spec = prepare_admm_mpc(c)
    pq = prepare_pallas(spec)
    assert pq.n_pad % 128 == 0 and pq.m_pad % 128 == 0
    assert pq.KinvT.shape == (pq.n_pad, pq.n_pad)
    assert pq.A.shape == (pq.m_pad, pq.n_pad)


def test_profiling_utils():
    from pyhybridcontrol_tpu.utils.profiling import bnb_stats, wall_timer

    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb

    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    f, h = qp.assemble(jnp.asarray([2.0, 0.0]))
    with wall_timer("solve", sync=None) as t:
        r = solve_miqp_bnb(admm, qp, f, h,
                           BnbSpec(capacity=64, wave_size=8, qp_iters=200))
        r.obj.block_until_ready()
    assert t["seconds"] > 0
    stats = bnb_stats(r)
    assert stats["found"] and stats["nodes_solved"] > 0
    assert np.isfinite(stats["obj"])
