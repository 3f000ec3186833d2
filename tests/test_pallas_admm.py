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
    # truncated iterations: the kernel's sigma=0 iteration takes a
    # slightly different path than the XLA sigma=1e-6 one (same fixed
    # point), so mid-flight iterates agree only to path noise
    ref = admm_solve(spec, fs, hs, lb, ub, iters=60)
    pal = admm_solve_pallas(pq, fs, hs, lb, ub, iters=60, interpret=True)
    np.testing.assert_allclose(np.asarray(pal.obj), np.asarray(ref.obj),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(ref.x),
                               rtol=1e-2, atol=2e-2)
    # converged: both paths land on the same QP solution
    ref = admm_solve(spec, fs, hs, lb, ub, iters=400)
    pal = admm_solve_pallas(pq, fs, hs, lb, ub, iters=400, interpret=True)
    np.testing.assert_allclose(np.asarray(pal.obj), np.asarray(ref.obj),
                               rtol=2e-4, atol=2e-4)
    # x agrees to fp32 noise along near-flat directions; obj (the B&B
    # bound) is the tight quantity
    np.testing.assert_allclose(np.asarray(pal.x), np.asarray(ref.x),
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pal.r_prim),
                               np.asarray(ref.r_prim), atol=1e-3)


def test_pallas_padding_shapes():
    # batch-last layout: structural dims pad to the 8-sublane grain only
    # (the batch rides the 128-lane axis), so padding waste is <=7%
    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    spec = prepare_admm_mpc(c)
    pq = prepare_pallas(spec)
    assert pq.n_pad % 8 == 0 and pq.m_pad % 8 == 0
    assert pq.n_pad - spec.n < 8 and pq.m_pad - spec.m_ineq < 8
    assert pq.AGT.shape == (pq.n_pad, pq.m_pad)
    assert pq.M.shape == (pq.m_pad + pq.n_pad, pq.n_pad)


def test_pallas_warm_start_interpret(rng):
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
    cold = admm_solve_pallas(pq, fs, hs, lb, ub, iters=120, interpret=True)
    r1 = admm_solve_pallas(pq, fs, hs, lb, ub, iters=60, interpret=True)
    warm = admm_solve_pallas(pq, fs, hs, lb, ub, iters=60,
                             warm=(r1.x, r1.z, r1.y), interpret=True)
    # 60 warm + 60 = 120 cold exactly (sigma=0 iteration has no x carry)
    np.testing.assert_allclose(np.asarray(warm.obj), np.asarray(cold.obj),
                               rtol=1e-5, atol=1e-5)


def test_pallas_infeasibility_certificate(rng):
    """Instance 0 gets contradictory rows (x0 ≤ 1 ∧ x0 ≥ 2); the kernel's
    in-kernel OSQP dual certificate must fire on it and stay quiet on the
    feasible instances, matching the XLA path."""
    from pyhybridcontrol_tpu.ops.admm import prepare_admm

    n = 8
    H = np.eye(n)
    G = np.vstack([np.eye(n)[:1], -np.eye(n)[:1]])
    spec = prepare_admm(G, H)
    pq = prepare_pallas(spec)
    B = 128
    fs = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    hs = jnp.broadcast_to(jnp.asarray([1.0, 2.0], jnp.float32), (B, 2))
    hs = hs.at[0].set(jnp.asarray([1.0, -2.0]))   # x0 ≤ 1 ∧ x0 ≥ 2
    lb = jnp.full((B, n), -10.0, jnp.float32)
    ub = jnp.full((B, n), 10.0, jnp.float32)
    res = admm_solve_pallas(pq, fs, hs, lb, ub, iters=400, interpret=True)
    ref = admm_solve(spec, fs, hs, lb, ub, iters=400)
    cert = np.asarray(res.infeas_cert)
    assert cert[0], "certificate missed a true infeasibility"
    assert not cert[1:].any()
    np.testing.assert_array_equal(cert, np.asarray(ref.infeas_cert))


def test_shared_spec_two_jitted_programs(rng, monkeypatch):
    """THE round-2 driver-bench killer (VERDICT r2): two different
    @jax.jit programs sharing ONE prepared BoxQP. The first program's
    lazy kernel dispatch used to cache that trace's constants; the
    second program then crashed with UnexpectedTracerError. Must now
    run — prepare_pallas builds concrete arrays under
    ensure_compile_time_eval and the derived data lives on the spec."""
    from pyhybridcontrol_tpu.ops.admm import prepare_admm
    from pyhybridcontrol_tpu.ops.pallas_admm import admm_solve_auto

    monkeypatch.setenv("PHC_PALLAS_FORCE", "interpret")
    n, m = 6, 4
    L = rng.normal(size=(n, n))
    H = L @ L.T + n * np.eye(n)
    G = rng.normal(size=(m, n))
    spec = prepare_admm(G, H)         # ONE prepared problem, shared
    assert spec.pallas_mode == "interpret"
    B = 128
    q = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    h = jnp.ones((B, m), jnp.float32)
    lb, ub = -jnp.ones((B, n)), jnp.ones((B, n))

    @jax.jit
    def prog1(q):
        return admm_solve_auto(spec, q, h, lb, ub, iters=200).obj

    @jax.jit
    def prog2(q):          # different program (iters) — second trace
        return admm_solve_auto(spec, q, h, lb, ub, iters=300).obj

    o1 = prog1(q)
    o2 = prog2(q)          # round 2: UnexpectedTracerError here
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-4, atol=1e-4)


def test_feedback_then_feedback_batch_shared_controller(monkeypatch):
    """Controller-level shape of the same bug: MpcController.feedback
    (one jitted program) followed by feedback_batch (a second program,
    pooled engine) on the SAME controller — both route kernel-eligible
    wave batches through one prepared admm spec."""
    monkeypatch.setenv("PHC_PALLAS_FORCE", "interpret")
    from pyhybridcontrol_tpu.control.mpc import MpcController
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec

    model = switched_double_integrator()
    ctl = MpcController(model, 6, default_weights(),
                        bnb_spec=BnbSpec(capacity=256, wave_size=128,
                                         max_waves=12, qp_iters=60))
    r1 = ctl.feedback(jnp.asarray([2.0, 0.0]))
    assert bool(r1.found)
    x0s = jnp.asarray([[2.0, 0.0], [-1.0, 0.5]], jnp.float32)
    rb = ctl.feedback_batch(x0s, engine="pooled", pooled_wave=128,
                            pool_slots=512)   # round 2: crash here
    assert bool(np.asarray(rb.found)[0])
    np.testing.assert_allclose(float(np.asarray(rb.obj)[0]),
                               float(r1.obj), rtol=1e-3, atol=1e-3)


def test_pallas_mode_fixed_at_prepare(rng, monkeypatch):
    """Dispatch policy is a property of the PREPARED spec, not of the
    environment at trace time: specs prepared under different
    PHC_PALLAS_FORCE values keep their own behavior even after the env
    changes (round-2 read the env per trace — two traces of one
    function could silently run different programs)."""
    import pyhybridcontrol_tpu.ops.pallas_admm as pa
    from pyhybridcontrol_tpu.ops.admm import prepare_admm

    n, m = 6, 4
    L = rng.normal(size=(n, n))
    H = L @ L.T + n * np.eye(n)
    G = rng.normal(size=(m, n))
    monkeypatch.setenv("PHC_PALLAS_FORCE", "interpret")
    spec_k = prepare_admm(G, H)
    monkeypatch.setenv("PHC_PALLAS_FORCE", "off")
    spec_off = prepare_admm(G, H)
    monkeypatch.delenv("PHC_PALLAS_FORCE")
    assert spec_k.pallas_mode == "interpret"
    assert spec_off.pallas_mode == "off"

    calls = []
    real = pa.admm_solve_pallas
    monkeypatch.setattr(pa, "admm_solve_pallas",
                        lambda *a, **kw: calls.append(1) or real(*a, **kw))
    B = 128
    q = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    h = jnp.ones((B, m), jnp.float32)
    lb, ub = -jnp.ones((B, n)), jnp.ones((B, n))
    r_off = pa.admm_solve_auto(spec_off, q, h, lb, ub, iters=150)
    assert not calls, "pallas_mode='off' spec must stay on the XLA path"
    r_k = pa.admm_solve_auto(spec_k, q, h, lb, ub, iters=150)
    assert calls, "pallas_mode='interpret' spec must use the kernel"
    np.testing.assert_allclose(np.asarray(r_k.obj), np.asarray(r_off.obj),
                               rtol=1e-3, atol=1e-3)
    # explicit kwarg beats the env
    with pytest.raises(ValueError):
        prepare_admm(G, H, pallas_mode="bogus")


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


def test_bnb_waves_through_kernel(rng, monkeypatch):
    """B&B with kernel-eligible wave batches (W=128, concrete prepared
    specs) must return the same incumbent as the XLA wave path —
    PHC_PALLAS_FORCE=interpret exercises the true kernel-in-while_loop
    program on CPU (the dispatch that the TPU bench takes by default;
    solver/bnb.py routes CondensedBackend solves via admm_solve_auto)."""
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb

    model = switched_double_integrator()
    c = CondensedMpc(model, 8, default_weights())
    qp = c.device_qp()
    spec = BnbSpec(capacity=256, wave_size=128, max_waves=24, qp_iters=60)
    f, h = qp.assemble(jnp.asarray([2.0, 0.0]))

    admm_x = prepare_admm_mpc(c)
    r_xla = solve_miqp_bnb(admm_x, qp, f, h, spec,
                           admm_probe=prepare_admm_mpc(c, rho=10.0))

    monkeypatch.setenv("PHC_PALLAS_FORCE", "interpret")
    # fresh identities: the jit-closure cache is keyed on the prepared
    # objects, so these re-trace with the env override active
    admm_k = prepare_admm_mpc(c)
    r_k = solve_miqp_bnb(admm_k, qp, f, h, spec,
                         admm_probe=prepare_admm_mpc(c, rho=10.0))
    assert bool(r_k.found) and bool(r_xla.found)
    np.testing.assert_allclose(float(r_k.obj), float(r_xla.obj),
                               rtol=1e-3, atol=1e-3)


def test_pooled_bnb_through_kernel(rng, monkeypatch):
    """Pooled multi-instance B&B (the config-4 engine) with kernel-grain
    waves: per-instance incumbents must match the XLA wave path."""
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec
    from pyhybridcontrol_tpu.solver.bnb_pooled import solve_miqp_bnb_pooled

    model = switched_double_integrator()
    c = CondensedMpc(model, 6, default_weights())
    qp = c.device_qp()
    spec = BnbSpec(capacity=1024, wave_size=128, max_waves=48, qp_iters=60)
    B = 8
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    f, h = jax.vmap(qp.assemble)(x0s)

    admm_x = prepare_admm_mpc(c)
    r_xla = solve_miqp_bnb_pooled(admm_x, qp, f, h, spec, pool_slots=1024,
                                  admm_probe=prepare_admm_mpc(c, rho=10.0))

    monkeypatch.setenv("PHC_PALLAS_FORCE", "interpret")
    admm_k = prepare_admm_mpc(c)
    r_k = solve_miqp_bnb_pooled(admm_k, qp, f, h, spec, pool_slots=1024,
                                admm_probe=prepare_admm_mpc(c, rho=10.0))
    assert np.asarray(r_k.found).all() and np.asarray(r_xla.found).all()
    np.testing.assert_allclose(np.asarray(r_k.obj), np.asarray(r_xla.obj),
                               rtol=1e-3, atol=1e-3)


def test_fused_wave_matches_sequential(rng, monkeypatch):
    """The fused relax+probe kernel (admm_wave_pallas) must reproduce
    the sequential composition (relax -> rounded probe bounds ->
    two-phase stiff/base probe) to solver tolerance, including the
    in-kernel probe-bound derivation."""
    from pyhybridcontrol_tpu.ops.admm import admm_solve
    from pyhybridcontrol_tpu.ops.pallas_admm import (
        admm_wave_pallas, admm_wave_auto, pallas_for)

    model = switched_double_integrator()
    c = CondensedMpc(model, 8, default_weights())
    qp = c.device_qp()
    spec = prepare_admm_mpc(c)
    spec_p = prepare_admm_mpc(c, rho=10.0)
    B = 128
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    fs, hs = jax.vmap(qp.assemble)(x0s)
    lb = jnp.broadcast_to(qp.lb, (B, qp.n))
    ub = jnp.broadcast_to(qp.ub, (B, qp.n))
    bidx = np.asarray(qp.binary_idx)

    relax_k, probe_k = admm_wave_pallas(
        pallas_for(spec), pallas_for(spec_p), qp.binary_idx,
        fs, hs, lb, ub, iters=300, probe_iters=400, interpret=True)

    # sequential XLA reference (identical math by construction)
    ref = admm_solve(spec, fs, hs, lb, ub, iters=300)
    xb = np.clip(np.asarray(ref.x)[:, bidx], 0.0, 1.0)
    pv = jnp.asarray(np.round(xb))
    lbp = lb.at[:, jnp.asarray(bidx)].set(pv)
    ubp = ub.at[:, jnp.asarray(bidx)].set(pv)
    r1 = admm_solve(spec_p, fs, hs, lbp, ubp, iters=200,
                    warm=(ref.x, ref.z, ref.y))
    pref = admm_solve(spec, fs, hs, lbp, ubp, iters=200,
                      warm=(r1.x, r1.z, r1.y))

    np.testing.assert_allclose(np.asarray(relax_k.obj),
                               np.asarray(ref.obj), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(probe_k.obj),
                               np.asarray(pref.obj), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(probe_k.x),
                               np.asarray(pref.x), rtol=1e-2, atol=2e-2)

    # the auto entry's XLA fallback agrees with its kernel path
    monkeypatch.setenv("PHC_PALLAS_FORCE", "interpret")
    spec_k = prepare_admm_mpc(c)
    spec_kp = prepare_admm_mpc(c, rho=10.0)
    rk, pk, lbk, ubk = admm_wave_auto(spec_k, spec_kp, qp.binary_idx,
                                      fs, hs, qp.lb, qp.ub,
                                      iters=300, probe_iters=400)
    np.testing.assert_allclose(np.asarray(pk.obj), np.asarray(pref.obj),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_array_equal(np.asarray(lbk[:, bidx]),
                                  np.asarray(pv)[..., :])


def test_mixed_precision_kernel_parity(small_prob=None):
    """In-kernel bf16 3-pass mixed precision (round 4, low_frac): the
    80/20 schedule's converged objective matches the full-HIGHEST
    kernel to solver tolerance (ADMM is self-correcting; the tail
    restores accuracy). Interpret mode on CPU — same kernel program
    the chip runs."""
    from pyhybridcontrol_tpu.models.double_integrator import (
        switched_double_integrator, default_weights)
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.ops.pallas_admm import (
        admm_solve_pallas, pallas_for)

    model = switched_double_integrator()
    c = CondensedMpc(model, 12, default_weights())
    qp, spec = c.device_qp(), prepare_admm_mpc(c)
    pq = pallas_for(spec)
    rng = np.random.default_rng(3)
    B = 128
    x0s = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    f, h = jax.vmap(qp.assemble)(x0s)
    lb = jnp.broadcast_to(qp.lb, (B, qp.n))
    ub = jnp.broadcast_to(qp.ub, (B, qp.n))
    r_full = admm_solve_pallas(pq, f, h, lb, ub, iters=120,
                               interpret=True)
    r_mix = admm_solve_pallas(pq, f, h, lb, ub, iters=120,
                              interpret=True, low_frac=0.8)
    np.testing.assert_allclose(np.asarray(r_mix.obj),
                               np.asarray(r_full.obj),
                               rtol=2e-3, atol=2e-3)
    # low_frac=1.0 — the bench HEADLINE configuration (no 6-pass tail):
    # the hi/lo-split 3-pass arithmetic alone must track the HIGHEST
    # kernel to solver tolerance (chip sweep measured ≤9e-6 rel obj;
    # this is the interpret-mode twin of bench.py's parity gate)
    r_all3 = admm_solve_pallas(pq, f, h, lb, ub, iters=120,
                               interpret=True, low_frac=1.0)
    np.testing.assert_allclose(np.asarray(r_all3.obj),
                               np.asarray(r_full.obj),
                               rtol=2e-3, atol=2e-3)
