"""Pallas TPU kernel for the batched ADMM QP solver (SURVEY.md §2b
``kernels/qp_admm`` — the speed-of-light path; ops/admm.py is the
always-working XLA fallback, SURVEY.md §7 "hard parts").

Round-2 redesign. The round-1 kernel kept iterates VMEM-resident but ran
batch-leading matmuls on lane-padded operands (n=60→128, m̄=260→384):
~3.3× padded MXU work × 6-pass HIGHEST — it LOST to XLA (−26%,
docs/PERFORMANCE.md). Three structural changes make this one win:

1. **Transposed (batch-last) layout.** All iterate arrays are (rows, B):
   the batch rides the 128-lane axis with zero padding; the small
   structural dims (n, m) sit in sublanes (pad to 8, ≤7% waste) or the
   contraction axis. Padded MXU work drops ~2.2× below even the XLA
   batch-leading form.

2. **σ = 0 variable elimination.** With box rows in Â, P̂ + Âᵀρ Â ≻ 0,
   so the OSQP σ-prox is unnecessary and the x-carry drops out of the
   iteration entirely. Precompute M = Â K₀⁻¹ (host fp64); each
   iteration is TWO matmuls instead of three:

       t  = Â_Gᵀ w_G + d_box ∘ w_box − q̂          (n, B)
       zt = M t        (= Â x̃, both blocks at once) (m̄, B)

   and x̃ itself is free: the box block of zt is d_box ∘ x̃.

3. **Box rows leave the MXU.** The box block of Â is diag(E_box·D), so
   its products are VPU elementwise; matmuls touch only the m G-rows.

Everything stays in VMEM for all ``iters`` iterations per batch tile
(grid over B), at full HIGHEST (fp32-equivalent 6-pass) precision —
accuracy is identical to ops/admm.py; only the data movement and padding
change. Residuals, objective, and the OSQP dual infeasibility
certificate are computed IN the kernel (the round-1 kernel lacked the
certificate), so the result is a drop-in ``AdmmResult``.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from pyhybridcontrol_tpu.ops.admm import AdmmResult, BoxQP

BIG = 1e30

# Mosaic's default scoped-VMEM budget is 16 MiB; the N=20-scale kernel
# at tile 128 schedules 16.05 MiB of stack when XLA places it inside a
# lax.cond branch (measured: the round-3 driver bench's config-2b
# section OOMed by 48.5 KiB at compile). v5e VMEM is far larger — a
# 2x budget keeps scheduling feasible with headroom without changing
# the kernel.
_VMEM_LIMIT = 32 * 1024 * 1024


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    cp = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams")
    return cp(vmem_limit_bytes=_VMEM_LIMIT)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasQP:
    """Padded, device-resident problem data for the Pallas kernel.

    Derived from a prepared :class:`BoxQP` (host-side, once). Uses its
    own σ=0 KKT inverse — the fixed point is the same QP solution; σ is
    only the prox weight and P̂ + Âᵀρ Â is already positive definite
    thanks to the box rows."""

    base: BoxQP                 # unpadded spec (scalings, rho, precision)
    AGT: jnp.ndarray            # (nr, mGp)  Â_Gᵀ zero-padded
    M: jnp.ndarray              # (mGp+nr, nr)  [Â_G; diag(d_box)] K₀⁻¹
    P: jnp.ndarray              # (nr, nr)  P̂ padded (dual residual/obj)
    dbox: jnp.ndarray           # (nr, 1)  box diagonal E_box·D (0 in pad)
    dbox_inv: jnp.ndarray       # (nr, 1)  1/d_box (1 in padding)
    rhoG: jnp.ndarray           # (mGp, 1) per-row ρ (1 in padding)
    rhoG_inv: jnp.ndarray       # (mGp, 1)
    rhoB: jnp.ndarray           # (nr, 1)
    rhoB_inv: jnp.ndarray       # (nr, 1)
    EG_inv: jnp.ndarray         # (mGp, 1) 1/E over G rows (1 in padding)
    EB_inv: jnp.ndarray         # (nr, 1)  1/E over box rows
    Dc_inv: jnp.ndarray         # (nr, 1)  1/(D·c) (dual residual unscale)
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))

    @property
    def n(self) -> int:
        return self.base.n

    @property
    def m_ineq(self) -> int:
        return self.base.m_ineq


def prepare_pallas(spec: BoxQP) -> PallasQP:
    """Pad + refactor a prepared BoxQP for the kernel (host fp64, once).

    Trace-safe by construction: the device arrays are created under
    ``jax.ensure_compile_time_eval()``, so even when this runs lazily
    INSIDE a jit trace (the B&B wave loop's first dispatch) the result
    holds CONCRETE arrays that any number of later jitted programs may
    close over. Round 2 skipped this and cached trace-local constants —
    the second jitted program sharing a prepared spec then crashed with
    UnexpectedTracerError (it killed the round-2 driver bench)."""
    n, mt, m = spec.n, spec.m_total, spec.m_ineq
    nr = _round_up(n, 8)
    mGp = _round_up(m, 8)
    Ah = np.asarray(spec.A, np.float64)
    Ph = np.asarray(spec.P, np.float64)
    rho = np.asarray(spec.rho_vec, np.float64)
    E = np.asarray(spec.E, np.float64)
    D = np.asarray(spec.D, np.float64)
    c = float(np.asarray(spec.cost_scale))

    AG = Ah[:m]                                   # (m, n) scaled G block
    dbox = np.diag(Ah[m:]) if Ah[m:].shape[0] == n else None
    assert dbox is not None
    # σ=0 KKT matrix (fp64): P̂ + Âᵀ ρ Â  (positive definite — box rows)
    K0 = Ph + (Ah.T * rho[None, :]) @ Ah
    K0inv = np.linalg.inv(K0)
    Mfull = np.vstack([AG, np.diag(dbox)]) @ K0inv       # (m+n, n)

    AGT = np.zeros((nr, mGp), np.float32)
    AGT[:n, :m] = AG.T
    Mp = np.zeros((mGp + nr, nr), np.float32)
    Mp[:m, :n] = Mfull[:m]
    Mp[mGp:mGp + n, :n] = Mfull[m:]
    Pp = np.zeros((nr, nr), np.float32)
    Pp[:n, :n] = Ph

    def col(v, rows, fill):
        out = np.full((rows, 1), fill, np.float32)
        out[:len(v), 0] = v
        return out

    db = col(dbox, nr, 0.0)
    with jax.ensure_compile_time_eval():
        return PallasQP(
            base=spec,
            AGT=jnp.asarray(AGT), M=jnp.asarray(Mp), P=jnp.asarray(Pp),
            dbox=jnp.asarray(db),
            dbox_inv=jnp.asarray(np.where(db == 0.0, 1.0, 1.0 / np.where(
                db == 0.0, 1.0, db))),
            rhoG=jnp.asarray(col(rho[:m], mGp, 1.0)),
            rhoG_inv=jnp.asarray(col(1.0 / rho[:m], mGp, 1.0)),
            rhoB=jnp.asarray(col(rho[m:], nr, 1.0)),
            rhoB_inv=jnp.asarray(col(1.0 / rho[m:], nr, 1.0)),
            EG_inv=jnp.asarray(col(1.0 / E[:m], mGp, 1.0)),
            EB_inv=jnp.asarray(col(1.0 / E[m:], nr, 1.0)),
            Dc_inv=jnp.asarray(col(1.0 / (D * c), nr, 1.0)),
            n_pad=nr, m_pad=mGp,
        )


def _mm(prec):
    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
    return mm


def _bf16_split(a):
    """fp32 → (hi, lo) bf16 pair with hi + lo ≈ a to ~16 mantissa bits."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm3(Ahi, Alo):
    """Manual 3-pass bf16 matmul: A·b ≈ Ahi·bhi + Ahi·blo + Alo·bhi
    (the lo·lo term is below fp32 rounding). This is exactly what
    ``precision=HIGH`` lowers to on the MXU — but Mosaic rejects HIGH
    inside a kernel (round-3 finding), so the decomposition is spelled
    out: three DEFAULT-precision bf16 passes with fp32 accumulation,
    i.e. half the 6-pass HIGHEST MXU time per matmul. The CONSTANT
    operand is split once outside the iteration loop; only the iterate
    operand pays a 2-op split per call."""
    def mm(b):
        bhi, blo = _bf16_split(b)
        d = _mm(jax.lax.Precision.DEFAULT)
        return d(Ahi, bhi) + d(Ahi, blo) + d(Alo, bhi)
    return mm


def _phase(q, lG, uG, lB, uB, AGT, M, dbox, rhoG, rhoGi, rhoB, rhoBi,
           zG, yG, zB, yB, iters: int, alpha: float, prec,
           iters_lo: int = 0):
    """``iters`` ADMM iterations plus one extra x-update, all VMEM
    arrays. (zG, yG, zB, yB) are the (already-clipped) initial iterates.
    Returns (ztG, ztB, x, zG, yG, zB, yB, dyG, dyB) — zt is Â x̃ of the
    post-loop half step, whose δy feeds the infeasibility certificate
    (same as one more iteration of the XLA path); the loop carry stays
    minimal. Shared by the plain kernel and the fused wave kernel.

    ``iters_lo``: the first iters_lo iterations run the manual bf16
    3-pass matmuls (``_mm3`` — the in-kernel twin of
    ops/admm.admm_solve_mixed's HIGH phase), the tail and the final
    half step at ``prec``. ADMM is self-correcting: early iterations
    only need to move the iterate into the basin; the full-precision
    tail restores the converged accuracy (measured +20% on the XLA
    path at ~1e-3 relative objective noise)."""
    mm = _mm(prec)
    mGp = AGT.shape[1]

    def half_step_with(mmA, mmM):
        def half_step(zG, yG, zB, yB):
            """w → t → u = Â x̃ (the x-update of one OSQP iteration)."""
            wG = rhoG * zG - yG
            wB = rhoB * zB - yB
            t = mmA(wG) + dbox * wB - q           # (nr, B)
            return mmM(t)                         # Â x̃, both blocks
        return half_step

    def body_with(half_step):
        def body(_, carry):
            zG, yG, zB, yB = carry
            u = half_step(zG, yG, zB, yB)
            ztG = u[:mGp]
            ztB = u[mGp:]
            zrG = alpha * ztG + (1.0 - alpha) * zG
            zG_new = jnp.clip(zrG + yG * rhoGi, lG, uG)
            dyG = rhoG * (zrG - zG_new)
            zrB = alpha * ztB + (1.0 - alpha) * zB
            zB_new = jnp.clip(zrB + yB * rhoBi, lB, uB)
            dyB = rhoB * (zrB - zB_new)
            return (zG_new, yG + dyG, zB_new, yB + dyB)
        return body

    half_full = half_step_with(lambda w: mm(AGT, w), lambda t: mm(M, t))
    carry = (zG, yG, zB, yB)
    if iters_lo > 0:
        half_lo = half_step_with(_mm3(*_bf16_split(AGT)),
                                 _mm3(*_bf16_split(M)))
        carry = jax.lax.fori_loop(0, iters_lo, body_with(half_lo), carry)
    zG, yG, zB, yB = jax.lax.fori_loop(0, max(iters - iters_lo, 0),
                                       body_with(half_full), carry)

    u = half_full(zG, yG, zB, yB)
    ztG = u[:mGp]
    ztB = u[mGp:]
    zrG = alpha * ztG + (1.0 - alpha) * zG
    dyG = rhoG * (zrG - jnp.clip(zrG + yG * rhoGi, lG, uG))
    zrB = alpha * ztB + (1.0 - alpha) * zB
    dyB = rhoB * (zrB - jnp.clip(zrB + yB * rhoBi, lB, uB))
    return ztG, ztB, zG, yG, zB, yB, dyG, dyB


def _rmax(a):
    # row-reductions keepdims → (1, B): TPU prefers ≥2-D values
    return jnp.max(a, axis=0, keepdims=True)


def _rsum(a):
    return jnp.sum(a, axis=0, keepdims=True)


def _stats(q, lG, uG, lB, uB, AGT, P, dbox, egi, ebi, dci, cinv,
           ztG, ztB, x, yG, yB, dyG, dyB, prec):
    """(8, B) stats block: obj, r_prim, r_rel, r_dual, infeas-cert, pad.
    All in original units (see module docstring)."""
    mm = _mm(prec)
    violG = jnp.abs(ztG - jnp.clip(ztG, lG, uG)) * egi
    violB = jnp.abs(ztB - jnp.clip(ztB, lB, uB)) * ebi
    r_prim = jnp.maximum(_rmax(violG), _rmax(violB))
    relG = violG / jnp.maximum(1.0, jnp.abs(ztG * egi))
    relB = violB / jnp.maximum(1.0, jnp.abs(ztB * ebi))
    r_rel = jnp.maximum(_rmax(relG), _rmax(relB))

    Px = mm(P, x)                                 # (nr, B)
    Aty = mm(AGT, yG) + dbox * yB
    dual = (Px + q + Aty) * dci
    r_dual = _rmax(jnp.abs(dual))
    obj = (0.5 * _rsum(x * Px) + _rsum(q * x)) * cinv

    # OSQP §3.4 primal-infeasibility certificate from the final δy
    dy_norm = jnp.maximum(_rmax(jnp.abs(dyG)), _rmax(jnp.abs(dyB)))
    Atdy = _rmax(jnp.abs(mm(AGT, dyG) + dbox * dyB))
    finuG, finlG = uG < 0.9 * BIG, lG > -0.9 * BIG
    finuB, finlB = uB < 0.9 * BIG, lB > -0.9 * BIG
    dypG, dynG = jnp.maximum(dyG, 0.0), jnp.minimum(dyG, 0.0)
    dypB, dynB = jnp.maximum(dyB, 0.0), jnp.minimum(dyB, 0.0)
    support = (_rsum(jnp.where(~finuG, dypG, 0.0))
               + _rsum(jnp.where(~finlG, -dynG, 0.0))
               + _rsum(jnp.where(~finuB, dypB, 0.0))
               + _rsum(jnp.where(~finlB, -dynB, 0.0)))
    gap_term = (_rsum(jnp.where(finuG, uG * dypG, 0.0))
                + _rsum(jnp.where(finlG, lG * dynG, 0.0))
                + _rsum(jnp.where(finuB, uB * dypB, 0.0))
                + _rsum(jnp.where(finlB, lB * dynB, 0.0)))
    eps_c = 1e-4
    cert = ((dy_norm > 1e-12)
            & (Atdy <= eps_c * dy_norm)
            & (support <= eps_c * dy_norm)
            & (gap_term <= -eps_c * dy_norm)).astype(jnp.float32)

    pad = jnp.zeros((3,) + obj.shape[1:], jnp.float32)
    return jnp.concatenate([obj, r_prim, r_rel, r_dual, cert, pad],
                           axis=0)


def _admm_kernel(q_ref, lG_ref, uG_ref, lB_ref, uB_ref,
                 agt_ref, m_ref, p_ref, dbox_ref, dboxi_ref,
                 rhoG_ref, rhoGi_ref, rhoB_ref, rhoBi_ref,
                 egi_ref, ebi_ref, dci_ref, cinv_ref,
                 *rest, iters: int, alpha: float, prec, warm: bool,
                 iters_lo: int = 0):
    if warm:
        z0G_ref, y0G_ref, z0B_ref, y0B_ref = rest[:4]
        rest = rest[4:]
    x_ref, zG_ref, yG_ref, zB_ref, yB_ref, stats_ref = rest

    q = q_ref[:]
    lG, uG = lG_ref[:], uG_ref[:]
    lB, uB = lB_ref[:], uB_ref[:]
    AGT = agt_ref[:]
    M = m_ref[:]
    dbox, dboxi = dbox_ref[:], dboxi_ref[:]
    rhoG, rhoGi = rhoG_ref[:], rhoGi_ref[:]
    rhoB, rhoBi = rhoB_ref[:], rhoBi_ref[:]

    if warm:
        zG = jnp.clip(z0G_ref[:], lG, uG)
        yG = y0G_ref[:]
        zB = jnp.clip(z0B_ref[:], lB, uB)
        yB = y0B_ref[:]
    else:
        zG = jnp.clip(jnp.zeros_like(lG), lG, uG)
        yG = jnp.zeros_like(lG)
        zB = jnp.clip(jnp.zeros_like(lB), lB, uB)
        yB = jnp.zeros_like(lB)

    ztG, ztB, zG, yG, zB, yB, dyG, dyB = _phase(
        q, lG, uG, lB, uB, AGT, M, dbox, rhoG, rhoGi, rhoB, rhoBi,
        zG, yG, zB, yB, iters, alpha, prec, iters_lo=iters_lo)
    x = ztB * dboxi                               # x̃ = d⁻¹ (d ∘ x̃)
    x_ref[:] = x
    zG_ref[:] = zG
    yG_ref[:] = yG
    zB_ref[:] = zB
    yB_ref[:] = yB
    stats_ref[:] = _stats(
        q, lG, uG, lB, uB, AGT, p_ref[:], dbox, egi_ref[:], ebi_ref[:],
        dci_ref[:], cinv_ref[0, 0], ztG, ztB, x, yG, yB, dyG, dyB, prec)


def _admm_wave_kernel(q_ref, lG_ref, uG_ref, lB_ref, uB_ref,
                      agt_ref, m_ref, p_ref, dbox_ref, dboxi_ref,
                      rhoG_ref, rhoGi_ref, rhoB_ref, rhoBi_ref,
                      egi_ref, ebi_ref, dci_ref, cinv_ref,
                      bin_ref, m2_ref,
                      rhoG2_ref, rhoG2i_ref, rhoB2_ref, rhoB2i_ref,
                      *rest, iters: int, p1: int, p2: int,
                      alpha: float, alpha2: float, prec, warm: bool):
    """Fused B&B wave: relaxation + dive probe in ONE kernel program
    (round-3, VERDICT r2 item 8). The relax iterates stay in VMEM and
    warm-start the probe directly — the separate-launch form pays an
    HBM round-trip of all five iterate arrays plus XLA pack/unpack glue
    between the two (three, with the two-phase stiff-ρ probe) programs.

    Probe bounds are derived IN-kernel: every binary coordinate (bin
    mask) is fixed to round(clip(x̃, node box)) in original units —
    algebraically identical to the loop-level
    ``pv = where(fix_mask, fix_val, round(clip(x, 0, 1)))`` because a
    fixed binary's node box is the point {fix_val}. The probe then runs
    p1 stiff-ρ iterations (M2/ρ2 — the implied-equality trick, see
    solver/bnb.py CondensedBackend.admm_probe) and p2 base-ρ
    iterations, warm-chained in VMEM (same Ruiz frame by construction:
    both preps equilibrate the same (H, A, q0))."""
    if warm:
        z0G_ref, y0G_ref, z0B_ref, y0B_ref = rest[:4]
        rest = rest[4:]
    (x_ref, zG_ref, yG_ref, zB_ref, yB_ref, stats_ref,
     xp_ref, zGp_ref, yGp_ref, zBp_ref, yBp_ref, statsp_ref) = rest

    q = q_ref[:]
    lG, uG = lG_ref[:], uG_ref[:]
    lB, uB = lB_ref[:], uB_ref[:]
    AGT = agt_ref[:]
    M = m_ref[:]
    P = p_ref[:]
    dbox, dboxi = dbox_ref[:], dboxi_ref[:]
    rhoG, rhoGi = rhoG_ref[:], rhoGi_ref[:]
    rhoB, rhoBi = rhoB_ref[:], rhoBi_ref[:]
    egi, ebi, dci = egi_ref[:], ebi_ref[:], dci_ref[:]
    cinv = cinv_ref[0, 0]
    binm = bin_ref[:]                              # (nr, 1) 1=binary

    if warm:
        zG = jnp.clip(z0G_ref[:], lG, uG)
        yG = y0G_ref[:]
        zB = jnp.clip(z0B_ref[:], lB, uB)
        yB = y0B_ref[:]
    else:
        zG = jnp.clip(jnp.zeros_like(lG), lG, uG)
        yG = jnp.zeros_like(lG)
        zB = jnp.clip(jnp.zeros_like(lB), lB, uB)
        yB = jnp.zeros_like(lB)

    # ---- phase 0: relaxation -------------------------------------------
    ztG, ztB, zG, yG, zB, yB, dyG, dyB = _phase(
        q, lG, uG, lB, uB, AGT, M, dbox, rhoG, rhoGi, rhoB, rhoBi,
        zG, yG, zB, yB, iters, alpha, prec)
    x = ztB * dboxi
    x_ref[:] = x
    zG_ref[:] = zG
    yG_ref[:] = yG
    zB_ref[:] = zB
    yB_ref[:] = yB
    stats_ref[:] = _stats(q, lG, uG, lB, uB, AGT, P, dbox, egi, ebi,
                          dci, cinv, ztG, ztB, x, yG, yB, dyG, dyB, prec)

    # ---- probe bounds: binaries fixed to the rounded relaxation --------
    # ztB is the E-scaled x (E_box·x_orig); /E → original units; clip to
    # the node box FIRST (scaled clip == original clip, E > 0), so fixed
    # binaries reproduce their fix_val exactly.
    x_orig = jnp.clip(ztB, lB, uB) * ebi
    pv = jnp.round(jnp.clip(x_orig, 0.0, 1.0)) / ebi   # back to E-frame
    lBp = jnp.where(binm > 0, pv, lB)
    uBp = jnp.where(binm > 0, pv, uB)

    # ---- probe: stiff-ρ then base-ρ, warm-chained in VMEM --------------
    zGp = zG
    yGp = yG
    zBp = jnp.clip(zB, lBp, uBp)
    yBp = yB
    if p1 > 0:
        M2 = m2_ref[:]
        rhoG2, rhoG2i = rhoG2_ref[:], rhoG2i_ref[:]
        rhoB2, rhoB2i = rhoB2_ref[:], rhoB2i_ref[:]
        _, _, zGp, yGp, zBp, yBp, _, _ = _phase(
            q, lG, uG, lBp, uBp, AGT, M2, dbox,
            rhoG2, rhoG2i, rhoB2, rhoB2i,
            zGp, yGp, zBp, yBp, p1, alpha2, prec)
    ztGp, ztBp, zGp, yGp, zBp, yBp, dyGp, dyBp = _phase(
        q, lG, uG, lBp, uBp, AGT, M, dbox, rhoG, rhoGi, rhoB, rhoBi,
        zGp, yGp, zBp, yBp, p2, alpha, prec)
    xp = ztBp * dboxi
    xp_ref[:] = xp
    zGp_ref[:] = zGp
    yGp_ref[:] = yGp
    zBp_ref[:] = zBp
    yBp_ref[:] = yBp
    statsp_ref[:] = _stats(q, lG, uG, lBp, uBp, AGT, P, dbox, egi, ebi,
                           dci, cinv, ztGp, ztBp, xp, yGp, yBp,
                           dyGp, dyBp, prec)


_PREC = {"highest": jax.lax.Precision.HIGHEST,
         "high": jax.lax.Precision.HIGH,
         "default": jax.lax.Precision.DEFAULT}


@functools.partial(jax.jit,
                   static_argnames=("iters", "tile", "warm", "interpret",
                                    "iters_lo"))
def _pallas_run(pq: PallasQP, qT, lGT, uGT, lBT, uBT, warm_arrs,
                iters: int, tile: int, warm: bool,
                interpret: bool = False, iters_lo: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = qT.shape[1]
    nr, mGp = pq.n_pad, pq.m_pad
    spec = pq.base
    grid = (B // tile,)
    kernel = functools.partial(
        _admm_kernel, iters=iters, alpha=spec.alpha,
        prec=_PREC[spec.precision], warm=warm, iters_lo=iters_lo)

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [tile_spec(nr),                       # qT
                tile_spec(mGp), tile_spec(mGp),      # lG, uG
                tile_spec(nr), tile_spec(nr),        # lB, uB
                const_spec((nr, mGp)),               # AGT
                const_spec((mGp + nr, nr)),          # M
                const_spec((nr, nr)),                # P
                const_spec((nr, 1)), const_spec((nr, 1)),    # dbox(, inv)
                const_spec((mGp, 1)), const_spec((mGp, 1)),  # rhoG(, inv)
                const_spec((nr, 1)), const_spec((nr, 1)),    # rhoB(, inv)
                const_spec((mGp, 1)), const_spec((nr, 1)),   # E invs
                const_spec((nr, 1)),                 # Dc_inv
                const_spec((1, 1))]                  # cost_scale⁻¹
    args = [qT, lGT, uGT, lBT, uBT,
            pq.AGT, pq.M, pq.P, pq.dbox, pq.dbox_inv,
            pq.rhoG, pq.rhoG_inv, pq.rhoB, pq.rhoB_inv,
            pq.EG_inv, pq.EB_inv, pq.Dc_inv,
            (1.0 / pq.base.cost_scale).reshape(1, 1).astype(jnp.float32)]
    if warm:
        in_specs += [tile_spec(mGp), tile_spec(mGp),
                     tile_spec(nr), tile_spec(nr)]
        args += list(warm_arrs)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        in_specs=in_specs,
        out_specs=[tile_spec(nr),
                   tile_spec(mGp), tile_spec(mGp),
                   tile_spec(nr), tile_spec(nr),
                   tile_spec(8)],
        out_shape=[
            jax.ShapeDtypeStruct((nr, B), jnp.float32),
            jax.ShapeDtypeStruct((mGp, B), jnp.float32),
            jax.ShapeDtypeStruct((mGp, B), jnp.float32),
            jax.ShapeDtypeStruct((nr, B), jnp.float32),
            jax.ShapeDtypeStruct((nr, B), jnp.float32),
            jax.ShapeDtypeStruct((8, B), jnp.float32),
        ],
    )(*args)
    return out


def admm_solve_pallas(pq: PallasQP, q, h, lb, ub, iters: int = 100,
                      tile: int = 512, warm=None,
                      interpret: bool = False,
                      low_frac: float = 0.0) -> AdmmResult:
    """Batched ADMM via the Pallas kernel. q (B,n), h (B,m), lb/ub (B,n)
    in ORIGINAL units; returns the same AdmmResult as ``admm_solve``
    (original-unit x/obj/residuals, scaled-frame z/y for warm starts).
    ``warm``: optional (x, z, y) from a previous AdmmResult (x unused —
    the σ=0 iteration has no x-carry). B must be a multiple of ``tile``
    (pad the batch at call sites).
    ``low_frac``: fraction of the iterations run with the manual bf16
    3-pass matmuls (in-kernel mixed precision — see ``_phase``); keep 0
    for B&B bound work, opt in for throughput-bound relaxation
    sweeps."""
    spec = pq.base
    n, m = spec.n, spec.m_ineq
    mt = spec.m_total
    B = q.shape[0]
    if B % tile != 0:
        tile = max(t for t in (128, 256, 512) if B % t == 0) \
            if any(B % t == 0 for t in (128, 256, 512)) else None
        if tile is None:
            raise ValueError(f"batch {B} not a multiple of 128")
    c = spec.cost_scale
    nr, mGp = pq.n_pad, pq.m_pad

    # scale + transpose + pad (cheap XLA ops fused around the kernel)
    qT = jnp.zeros((nr, B), jnp.float32).at[:n].set((c * spec.D * q).T)
    lGT = jnp.zeros((mGp, B), jnp.float32).at[:m].set(-BIG)
    uGT = jnp.zeros((mGp, B), jnp.float32).at[:m].set((h * spec.E[:m]).T)
    lBT = jnp.zeros((nr, B), jnp.float32).at[:n].set(
        jnp.clip(lb * spec.E[m:], -BIG, BIG).T)
    uBT = jnp.zeros((nr, B), jnp.float32).at[:n].set(
        jnp.clip(ub * spec.E[m:], -BIG, BIG).T)

    warm_arrs = None
    if warm is not None:
        _, z0, y0 = warm
        warm_arrs = (
            jnp.zeros((mGp, B), jnp.float32).at[:m].set(z0[..., :m].T),
            jnp.zeros((mGp, B), jnp.float32).at[:m].set(y0[..., :m].T),
            jnp.zeros((nr, B), jnp.float32).at[:n].set(z0[..., m:mt].T),
            jnp.zeros((nr, B), jnp.float32).at[:n].set(y0[..., m:mt].T),
        )

    xT, zGT, yGT, zBT, yBT, stats = _pallas_run(
        pq, qT, lGT, uGT, lBT, uBT, warm_arrs, iters, tile,
        warm is not None, interpret,
        iters_lo=int(iters * low_frac))

    x = (spec.D * xT[:n].T)
    z = jnp.concatenate([zGT[:m].T, zBT[:n].T], axis=-1)
    y = jnp.concatenate([yGT[:m].T, yBT[:n].T], axis=-1)
    return AdmmResult(x=x, obj=stats[0], r_prim=stats[1],
                      r_prim_rel=stats[2], r_dual=stats[3],
                      infeas_cert=stats[4] > 0.5, y=y, z=z)


@functools.partial(jax.jit, static_argnames=("iters", "p1", "p2", "tile",
                                             "warm", "interpret"))
def _pallas_wave_run(pq: PallasQP, pq2, binmask, qT, lGT, uGT, lBT, uBT,
                     warm_arrs, iters: int, p1: int, p2: int, tile: int,
                     warm: bool, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = qT.shape[1]
    nr, mGp = pq.n_pad, pq.m_pad
    spec = pq.base
    alpha2 = spec.alpha if pq2 is None else pq2.base.alpha
    grid = (B // tile,)
    kernel = functools.partial(
        _admm_wave_kernel, iters=iters, p1=p1, p2=p2, alpha=spec.alpha,
        alpha2=alpha2, prec=_PREC[spec.precision], warm=warm)

    def tile_spec(rows):
        return pl.BlockSpec((rows, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    src2 = pq if pq2 is None else pq2
    in_specs = [tile_spec(nr),
                tile_spec(mGp), tile_spec(mGp),
                tile_spec(nr), tile_spec(nr),
                const_spec((nr, mGp)),
                const_spec((mGp + nr, nr)),
                const_spec((nr, nr)),
                const_spec((nr, 1)), const_spec((nr, 1)),
                const_spec((mGp, 1)), const_spec((mGp, 1)),
                const_spec((nr, 1)), const_spec((nr, 1)),
                const_spec((mGp, 1)), const_spec((nr, 1)),
                const_spec((nr, 1)),
                const_spec((1, 1)),
                const_spec((nr, 1)),                 # binary mask
                const_spec((mGp + nr, nr)),          # M2 (stiff probe)
                const_spec((mGp, 1)), const_spec((mGp, 1)),
                const_spec((nr, 1)), const_spec((nr, 1))]
    args = [qT, lGT, uGT, lBT, uBT,
            pq.AGT, pq.M, pq.P, pq.dbox, pq.dbox_inv,
            pq.rhoG, pq.rhoG_inv, pq.rhoB, pq.rhoB_inv,
            pq.EG_inv, pq.EB_inv, pq.Dc_inv,
            (1.0 / pq.base.cost_scale).reshape(1, 1).astype(jnp.float32),
            binmask,
            src2.M, src2.rhoG, src2.rhoG_inv, src2.rhoB, src2.rhoB_inv]
    if warm:
        in_specs += [tile_spec(mGp), tile_spec(mGp),
                     tile_spec(nr), tile_spec(nr)]
        args += list(warm_arrs)

    def outs():
        return [jax.ShapeDtypeStruct((nr, B), jnp.float32),
                jax.ShapeDtypeStruct((mGp, B), jnp.float32),
                jax.ShapeDtypeStruct((mGp, B), jnp.float32),
                jax.ShapeDtypeStruct((nr, B), jnp.float32),
                jax.ShapeDtypeStruct((nr, B), jnp.float32),
                jax.ShapeDtypeStruct((8, B), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
        in_specs=in_specs,
        out_specs=[tile_spec(nr), tile_spec(mGp), tile_spec(mGp),
                   tile_spec(nr), tile_spec(nr), tile_spec(8)] * 2,
        out_shape=outs() + outs(),
    )(*args)
    return out


def admm_wave_pallas(pq: PallasQP, pq_probe, binary_idx, q, h, lb, ub,
                     iters: int = 100, probe_iters: int = 100,
                     tile: int = 512, warm=None, interpret: bool = False):
    """Fused relaxation + dive-probe via ONE kernel program. Inputs as
    ``admm_solve_pallas``; ``binary_idx`` are the variable indices fixed
    to their rounded relaxation values for the probe; ``pq_probe`` is
    the optional stiff-ρ prep for the probe's first half (same Ruiz
    frame — asserted implicitly by sharing Â/D/E from ``pq``). Returns
    ``(relax AdmmResult, probe AdmmResult)``."""
    spec = pq.base
    n, m = spec.n, spec.m_ineq
    mt = spec.m_total
    B = q.shape[0]
    if B % tile != 0:
        tile = max((t for t in (128, 256, 512) if B % t == 0),
                   default=None)
        if tile is None:
            raise ValueError(f"batch {B} not a multiple of 128")
    c = spec.cost_scale
    nr, mGp = pq.n_pad, pq.m_pad

    qT = jnp.zeros((nr, B), jnp.float32).at[:n].set((c * spec.D * q).T)
    lGT = jnp.zeros((mGp, B), jnp.float32).at[:m].set(-BIG)
    uGT = jnp.zeros((mGp, B), jnp.float32).at[:m].set((h * spec.E[:m]).T)
    lBT = jnp.zeros((nr, B), jnp.float32).at[:n].set(
        jnp.clip(lb * spec.E[m:], -BIG, BIG).T)
    uBT = jnp.zeros((nr, B), jnp.float32).at[:n].set(
        jnp.clip(ub * spec.E[m:], -BIG, BIG).T)
    with jax.ensure_compile_time_eval():
        bm = np.zeros((nr, 1), np.float32)
        bm[np.asarray(binary_idx, int), 0] = 1.0
        binmask = jnp.asarray(bm)

    warm_arrs = None
    if warm is not None:
        _, z0, y0 = warm
        warm_arrs = (
            jnp.zeros((mGp, B), jnp.float32).at[:m].set(z0[..., :m].T),
            jnp.zeros((mGp, B), jnp.float32).at[:m].set(y0[..., :m].T),
            jnp.zeros((nr, B), jnp.float32).at[:n].set(z0[..., m:mt].T),
            jnp.zeros((nr, B), jnp.float32).at[:n].set(y0[..., m:mt].T),
        )

    p1 = probe_iters // 2 if pq_probe is not None else 0
    p2 = probe_iters - p1
    (xT, zGT, yGT, zBT, yBT, st,
     xpT, zGpT, yGpT, zBpT, yBpT, stp) = _pallas_wave_run(
        pq, pq_probe, binmask, qT, lGT, uGT, lBT, uBT, warm_arrs,
        iters, p1, p2, tile, warm is not None, interpret)

    def unpack(xT, zGT, yGT, zBT, yBT, st):
        x = (spec.D * xT[:n].T)
        z = jnp.concatenate([zGT[:m].T, zBT[:n].T], axis=-1)
        y = jnp.concatenate([yGT[:m].T, yBT[:n].T], axis=-1)
        return AdmmResult(x=x, obj=st[0], r_prim=st[1],
                          r_prim_rel=st[2], r_dual=st[3],
                          infeas_cert=st[4] > 0.5, y=y, z=z)

    return (unpack(xT, zGT, yGT, zBT, yBT, st),
            unpack(xpT, zGpT, yGpT, zBpT, yBpT, stp))


def admm_wave_auto(spec: BoxQP, spec_probe, binary_idx, q, h, lb, ub,
                   iters: int = 100, probe_iters: int = 100, warm=None):
    """Fused-wave entry point with the same dispatch policy as
    ``admm_solve_auto``: the fused kernel when eligible, otherwise the
    exact sequential composition (relax → rounded probe bounds →
    two-phase probe) through ``admm_solve_auto`` — CPU tests therefore
    exercise the identical search semantics on the XLA path. Returns
    ``(relax, probe, lb_probe, ub_probe)``; the probe bounds are also
    returned because the caller's certified probe clamp (solver/bnb.py
    do_probe) needs them."""
    force = spec.pallas_mode
    concrete = (not isinstance(spec.P, jax.core.Tracer)
                and (spec_probe is None
                     or not isinstance(spec_probe.P, jax.core.Tracer)))
    on_tpu = jax.default_backend() == "tpu"
    eligible = (concrete and force != "off"
                and (on_tpu or force == "interpret")
                and getattr(q, "ndim", 1) == 2 and q.shape[0] % 128 == 0)
    bidx = jnp.asarray(np.asarray(binary_idx, np.int32))
    if eligible:
        pq = pallas_for(spec)
        pq2 = pallas_for(spec_probe) if spec_probe is not None else None
        B, n = q.shape
        m = spec.m_ineq
        hb = jnp.broadcast_to(h, (B, m))
        lbb = jnp.broadcast_to(lb, (B, n))
        ubb = jnp.broadcast_to(ub, (B, n))
        relax, probe = admm_wave_pallas(
            pq, pq2, binary_idx, q, hb, lbb, ubb, iters=iters,
            probe_iters=probe_iters, warm=warm, interpret=(not on_tpu))
        xb = relax.x[:, bidx]
    else:
        relax = admm_solve_auto(spec, q, h, lb, ub, iters=iters,
                                warm=warm)
        xb = relax.x[:, bidx]
    # probe bounds in original units (identical formula to the
    # in-kernel one: clip to the node box first, so fixed binaries
    # reproduce their fixed value exactly)
    lbb_ = jnp.broadcast_to(lb, relax.x.shape)
    ubb_ = jnp.broadcast_to(ub, relax.x.shape)
    pv = jnp.round(jnp.clip(jnp.clip(xb, lbb_[..., bidx], ubb_[..., bidx]),
                            0.0, 1.0))
    lb_p = lbb_.at[..., bidx].set(pv)
    ub_p = ubb_.at[..., bidx].set(pv)
    if not eligible:
        w = (relax.x, relax.z, relax.y)
        if spec_probe is not None:
            k = probe_iters // 2
            r1 = admm_solve_auto(spec_probe, q, h, lb_p, ub_p, iters=k,
                                 warm=w)
            probe = admm_solve_auto(spec, q, h, lb_p, ub_p,
                                    iters=probe_iters - k,
                                    warm=(r1.x, r1.z, r1.y))
        else:
            probe = admm_solve_auto(spec, q, h, lb_p, ub_p,
                                    iters=probe_iters, warm=w)
    return relax, probe, lb_p, ub_p


# ---- default dispatch: kernel on TPU, XLA path elsewhere ----------------


def pallas_for(spec: BoxQP) -> PallasQP:
    """Memoized ``prepare_pallas``, stored ON the spec object (the host
    fp64 refactorization runs once per prepared problem; the derived
    data is garbage-collected with the spec). Safe to call from inside
    any jit trace — ``prepare_pallas`` builds concrete arrays under
    ``ensure_compile_time_eval`` — and safe to SHARE across any number
    of jitted programs (utils/prepcache.py has the round-2 history)."""
    from pyhybridcontrol_tpu.utils.prepcache import cached_on

    return cached_on(spec, "pallas_qp", lambda: prepare_pallas(spec))


def admm_solve_auto(spec: BoxQP, q, h, lb, ub, iters: int = 100,
                    warm=None) -> AdmmResult:
    """Default batched-QP entry point (same signature/result as
    ``ops.admm.admm_solve``): dispatches to the Pallas kernel when it can
    win — TPU backend, a 2-D batch that tiles to the 128-lane grain —
    and to the XLA path otherwise (CPU, single solves, odd batches, or a
    ``spec`` passed through jit arguments, whose traced arrays cannot be
    refactorized host-side). Dispatch is resolved at trace time, so this
    is jit-compatible; close over ``spec`` rather than passing it as a
    jit argument to enable the fast path.

    The dispatch policy comes from ``spec.pallas_mode`` — fixed when the
    problem was PREPARED (prepare_admm reads PHC_PALLAS_FORCE once
    there): "off" = never use the kernel (chip-side kill switch),
    "interpret" = run eligible batches through the kernel in interpret
    mode on non-TPU backends (CPU testability of the kernel-in-wave-loop
    path), "" = auto. Two programs traced from the same spec therefore
    always agree, whatever the environment does between traces.
    """
    from pyhybridcontrol_tpu.ops.admm import admm_solve

    force = spec.pallas_mode
    concrete = not isinstance(spec.P, jax.core.Tracer)
    on_tpu = jax.default_backend() == "tpu"
    eligible = (concrete and force != "off"
                and (on_tpu or force == "interpret")
                and getattr(q, "ndim", 1) == 2 and q.shape[0] % 128 == 0)
    if eligible:
        pq = pallas_for(spec)
        B, n = q.shape
        m = spec.m_ineq
        hb = jnp.broadcast_to(h, (B, m))
        lbb = jnp.broadcast_to(lb, (B, n))
        ubb = jnp.broadcast_to(ub, (B, n))
        return admm_solve_pallas(pq, q, hb, lbb, ubb, iters=iters,
                                 warm=warm,
                                 interpret=(not on_tpu))
    return admm_solve(spec, q, h, lb, ub, iters=iters, warm=warm)
