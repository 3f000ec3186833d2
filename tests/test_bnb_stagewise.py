"""Long-horizon MIQP: B&B over the stagewise O(N) backend must find the
same binary sequence as the condensed engines."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.ops.stagewise import (
    assemble_stagewise, prepare_stagewise)
from pyhybridcontrol_tpu.solver.bnb import BnbSpec
from pyhybridcontrol_tpu.solver.bnb_stagewise import solve_miqp_bnb_stagewise
from pyhybridcontrol_tpu.solver.enumerate import solve_miqp_enumerate_device


def test_stagewise_bnb_matches_condensed_enumeration():
    model = switched_double_integrator()
    N = 8
    sw = prepare_stagewise(model, N, default_weights())
    x0 = jnp.asarray([2.0, 0.0])
    q, l, u = assemble_stagewise(sw, x0)
    r = solve_miqp_bnb_stagewise(
        sw, q, l, u, BnbSpec(capacity=256, wave_size=16, qp_iters=600,
                             max_waves=48))
    assert bool(r.found)
    xi = np.asarray(r.x).reshape(N, sw.b)
    bits_sw = np.round(xi[:, sw.binary_idx_v[0]])

    c = CondensedMpc(model, N, default_weights())
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    f, h = qp.assemble(x0)
    _, obj, bits, _ = solve_miqp_enumerate_device(admm, qp, f, h, iters=600)
    np.testing.assert_array_equal(bits_sw, np.asarray(bits))
    # and the first input agrees
    u0_sw = xi[0, 0]
    # condensed optimum's u0 via its own solve
    from pyhybridcontrol_tpu.solver.enumerate import _enumerate_solve, _all_assignments
    xV, _, _, _ = _enumerate_solve(admm, qp, f, h,
                                   jnp.asarray(_all_assignments(qp.n_binary)),
                                   iters=600)
    u0_cond = float(np.asarray(qp.full_v(xV))[0, 0])
    np.testing.assert_allclose(u0_sw, u0_cond, atol=3e-2)


def test_stagewise_bnb_long_horizon_runs():
    """N=60: condensed H would be (180)² per instance with (720)-row G —
    stagewise stays O(N) and the MIQP still solves."""
    model = switched_double_integrator()
    N = 60
    sw = prepare_stagewise(model, N, default_weights())
    q, l, u = assemble_stagewise(sw, jnp.asarray([2.0, 0.0]))
    r = solve_miqp_bnb_stagewise(
        sw, q, l, u, BnbSpec(capacity=128, wave_size=8, qp_iters=400,
                             max_waves=12))
    assert bool(r.found)
    xi = np.asarray(r.x).reshape(N, sw.b)
    b = xi[:, sw.binary_idx_v[0]]
    assert np.abs(b - np.round(b)).max() < 1e-2


def test_stagewise_hull_model_matches_condensed():
    """The hull (disaggregated) PWA encoding is stage-local, so the
    O(N) stagewise backend must handle it unchanged and agree with the
    condensed B&B on the same instance."""
    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)
    from pyhybridcontrol_tpu.solver.bnb import solve_miqp_bnb
    from pyhybridcontrol_tpu.solver.repair import (
        prepare_repair, root_repair_incumbent)

    model = pwa_spring_mld(on_off=True, formulation="hull")
    w = pwa_weights()
    N = 6
    x0 = jnp.asarray([1.5, 0.0])
    spec = BnbSpec(capacity=512, wave_size=32, qp_iters=400,
                   probe_iters=2000, max_waves=32, gap=1e-3)

    sw = prepare_stagewise(model, N, w)
    q, l, u = assemble_stagewise(sw, x0)
    r_sw = solve_miqp_bnb_stagewise(sw, q, l, u, spec)

    c = CondensedMpc(model, N, w)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    probe = prepare_admm_mpc(c, rho=10.0)
    f, h = qp.assemble(x0)
    rs = prepare_repair(model, w)
    seed = root_repair_incumbent(admm, qp, rs, x0, f, h, qp_iters=400)
    r_c = solve_miqp_bnb(admm, qp, f, h, spec, init_incumbent=seed,
                         admm_probe=probe)

    assert bool(r_sw.found) and bool(r_c.found)
    # stagewise objective lives in a shifted frame (constant offset) —
    # compare the decisions: first input and binary sequence
    xi = np.asarray(r_sw.x).reshape(N, sw.b)
    bits_sw = np.round(xi[:, list(sw.binary_idx_v)])
    v_c = np.asarray(qp.full_v(jnp.asarray(r_c.x)))
    bits_c = np.round(v_c[:, list(sw.binary_idx_v)])
    np.testing.assert_array_equal(bits_sw, bits_c)
    np.testing.assert_allclose(xi[0, 0], v_c[0, 0], atol=3e-2)
