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
