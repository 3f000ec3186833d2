"""Greedy rollout-repair heuristic (solver/repair.py): repaired
sequences are feasible by construction; B&B seeded with the repair
solves the PWA config-2 problem that unseeded probing cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.models.pwa_examples import (
    pwa_spring_mld, pwa_weights)
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb
from pyhybridcontrol_tpu.solver.repair import (
    prepare_repair, repair_sequence, root_repair_incumbent)


def test_repair_produces_feasible_sequence():
    model = switched_double_integrator()
    w = default_weights()
    rspec = prepare_repair(model, w)
    assert rspec is not None and rspec.nbs == 1
    N = 8
    x0 = jnp.asarray([2.0, 0.0])
    u_ref = jnp.zeros((N, len(rspec.cont_idx)), jnp.float32)
    v_seq, ok = repair_sequence(rspec, x0, u_ref, qp_iters=100)
    assert bool(ok)
    # stage feasibility along the induced trajectory
    x = x0
    for k in range(N):
        u, d, z = model.info.split_v(v_seq[k])
        r = model.constraint_residual(x, u, d, z)
        assert float(jnp.max(r)) < 5e-3, f"step {k}"
        x = model.step(x, u, d, z)
    # binaries are integral
    b = np.asarray(v_seq)[:, np.asarray(rspec.bin_idx)]
    assert np.abs(b - np.round(b)).max() < 1e-5


def test_root_repair_incumbent_upper_bounds_optimum():
    model = switched_double_integrator()
    w = default_weights()
    c = CondensedMpc(model, 8, w)
    qp, admm = c.device_qp(), prepare_admm_mpc(c)
    rspec = prepare_repair(model, w)
    x0 = jnp.asarray([2.0, 0.0])
    f, h = qp.assemble(x0)
    obj, V, ok = root_repair_incumbent(admm, qp, rspec, x0, f, h,
                                       qp_iters=400)
    assert bool(ok)
    from pyhybridcontrol_tpu.solver.enumerate import (
        solve_miqp_enumerate_device)

    _, obj_true, _, _ = solve_miqp_enumerate_device(admm, qp, f, h,
                                                    iters=600)
    assert float(obj) >= float(obj_true) - 5e-3     # valid upper bound
    # greedy quality is heuristic; B&B refinement from the seed is
    # covered by test_pwa_bnb_with_repair_finds_incumbent
    assert np.isfinite(float(obj))


def test_pwa_bnb_with_repair_finds_incumbent():
    """The motivating case: 60 coupled binaries — probe-rounding finds
    nothing, repair does."""
    mpwa = pwa_spring_mld(on_off=True)
    w = pwa_weights()
    cpw = CondensedMpc(mpwa, 12, w)
    qpw, admw = cpw.device_qp(), prepare_admm_mpc(cpw)
    rspec = prepare_repair(mpwa, w)
    assert rspec is not None and rspec.nbs == 3
    x0 = jnp.asarray([1.5, 0.0])
    f, h = qpw.assemble(x0)
    seed = root_repair_incumbent(admw, qpw, rspec, x0, f, h, qp_iters=400)
    assert bool(seed[2]), "repair failed on PWA"
    spec = BnbSpec(capacity=512, wave_size=64, max_waves=12, qp_iters=200,
                   gap=1e-3)
    r = solve_miqp_bnb(admw, qpw, f, h, spec, init_incumbent=seed)
    assert bool(r.found)
    assert float(r.obj) <= float(seed[0]) + 1e-4   # B&B only improves


def test_repair_none_for_heavy_binary_models():
    model = switched_double_integrator()
    assert prepare_repair(model, default_weights(),
                          max_step_binaries=0) is None
