"""Pallas TPU kernel for the batched ADMM QP solver (SURVEY.md §2b
``kernels/qp_admm`` — the speed-of-light path; the plain-XLA version in
ops/admm.py is the always-working fallback, SURVEY.md §7 "hard parts").

Why a kernel: the XLA fori_loop version round-trips the iterate set
(x, z, y — ~(B, n+2m̄) floats) through HBM every iteration. At MPC sizes
(n≈64, m̄≈320) a whole batch tile of iterates PLUS the problem matrices
fit in VMEM, so the kernel runs all ``iters`` iterations on-chip:

    grid = (B // TB,)                       one program per batch tile
    VMEM: Kinvᵀ (n̄,n̄), Â (m̄,n̄), Âᵀ + per-tile q,l,u + x,z,y scratch
    loop body: 3 MXU matmuls on (TB, ·) tiles — zero HBM traffic

Shapes are padded to the fp32 tile grid (8, 128) on the host once at
prepare time (padding rows of Â are zero ⇒ their z/y stay 0 and do not
affect x̃; padding cols have Kinv=I ⇒ x stays 0 there).

The public entry ``admm_solve_pallas`` matches ``admm_solve`` semantics
(original-unit inputs, Ruiz scaling internal, relative residuals) and is
selected via ``backend="pallas"`` in the solver layers.
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from pyhybridcontrol_tpu.ops.admm import AdmmResult, BoxQP

BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasQP:
    """Padded, device-resident problem data for the Pallas kernel."""

    base: BoxQP                     # unpadded spec (host assembly reuse)
    KinvT: jnp.ndarray              # (n̄, n̄)
    A: jnp.ndarray                  # (m̄p, n̄)
    AT: jnp.ndarray                 # (n̄, m̄p)
    rho: jnp.ndarray                # (m̄p,) padded per-row ρ (1 in padding)
    E: jnp.ndarray                  # (m̄p,) padded row scales
    D: jnp.ndarray                  # (n̄,)
    n_pad: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))


def prepare_pallas(spec: BoxQP) -> PallasQP:
    """Pad a prepared BoxQP to TPU tile shapes (host-side, once)."""
    n = spec.n
    mt = spec.m_total
    n_pad = _round_up(n, 128)
    m_pad = _round_up(mt, 128)
    KinvT = np.zeros((n_pad, n_pad), np.float32)
    KinvT[:n, :n] = np.asarray(spec.Kinv).T
    A = np.zeros((m_pad, n_pad), np.float32)
    A[:mt, :n] = np.asarray(spec.A)
    rho = np.ones(m_pad, np.float32)
    rho[:mt] = np.asarray(spec.rho_vec)
    E = np.ones(m_pad, np.float32)
    E[:mt] = np.asarray(spec.E)
    D = np.ones(n_pad, np.float32)
    D[:n] = np.asarray(spec.D)
    return PallasQP(base=spec,
                    KinvT=jnp.asarray(KinvT), A=jnp.asarray(A),
                    AT=jnp.asarray(A.T), rho=jnp.asarray(rho),
                    E=jnp.asarray(E), D=jnp.asarray(D),
                    n_pad=n_pad, m_pad=m_pad)


def _admm_kernel(q_ref, l_ref, u_ref, kinvt_ref, a_ref, at_ref, rho_ref,
                 x_ref, z_ref, y_ref, *, iters: int, sigma: float,
                 alpha: float):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[:]
    l = l_ref[:]
    u = u_ref[:]
    rho = rho_ref[:]          # (1, m̄p) broadcast row
    x = jnp.zeros_like(q)
    z = jnp.clip(jnp.zeros_like(l), l, u)
    y = jnp.zeros_like(l)

    def body(_, carry):
        x, z, y = carry
        w = rho * z - y
        # fp32 inputs + DEFAULT precision = bf16 MXU passes — wrong for
        # ADMM; HIGHEST gives fp32-equivalent multi-pass accumulation.
        t = sigma * x - q + jax.lax.dot_general(
            w, a_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        xt = jax.lax.dot_general(
            t, kinvt_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        zt = jax.lax.dot_general(
            xt, at_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        zr = alpha * zt + (1.0 - alpha) * z
        z_new = jnp.clip(zr + y / rho, l, u)
        y_new = y + rho * (zr - z_new)
        return xt, z_new, y_new

    x, z, y = jax.lax.fori_loop(0, iters, body, (x, z, y))
    x_ref[:] = x
    z_ref[:] = z
    y_ref[:] = y


@functools.partial(jax.jit, static_argnames=("iters", "tile"))
def _pallas_run(pq: PallasQP, qp_pad, l_pad, u_pad, iters: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = qp_pad.shape[0]
    n_pad, m_pad = pq.n_pad, pq.m_pad
    spec = pq.base
    grid = (B // tile,)
    kernel = functools.partial(_admm_kernel, iters=iters,
                               sigma=spec.sigma, alpha=spec.alpha)
    x, z, y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # q
            pl.BlockSpec((tile, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # l
            pl.BlockSpec((tile, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # u
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # KinvT
            pl.BlockSpec((m_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # A
            pl.BlockSpec((n_pad, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # AT
            pl.BlockSpec((1, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),       # rho row
        ],
        out_specs=[
            pl.BlockSpec((tile, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad), jnp.float32),
        ],
    )(qp_pad, l_pad, u_pad, pq.KinvT, pq.A, pq.AT, pq.rho[None, :])
    return x, z, y


def admm_solve_pallas(pq: PallasQP, q, h, lb, ub, iters: int = 100,
                      tile: int = 128, interpret: bool = False
                      ) -> AdmmResult:
    """Batched ADMM via the Pallas kernel. q (B,n), h (B,m), lb/ub (B,n)
    in ORIGINAL units; returns the same AdmmResult as ``admm_solve``.
    B must be a multiple of ``tile`` (pad the batch at call sites)."""
    spec = pq.base
    n, mt, m = spec.n, spec.m_total, spec.m_ineq
    B = q.shape[0]
    c = spec.cost_scale

    # scale + pad (cheap XLA elementwise; fused with surrounding program)
    qh = jnp.zeros((B, pq.n_pad), jnp.float32)
    qh = qh.at[:, :n].set(c * spec.D * q)
    l_pad = jnp.full((B, pq.m_pad), -BIG, jnp.float32)
    u_pad = jnp.full((B, pq.m_pad), BIG, jnp.float32)
    l_pad = l_pad.at[:, m:mt].set(jnp.clip(lb * spec.E[m:], -BIG, BIG))
    u_pad = u_pad.at[:, :m].set(h * spec.E[:m])
    u_pad = u_pad.at[:, m:mt].set(jnp.clip(ub * spec.E[m:], -BIG, BIG))
    # padding rows: l=u=0 keeps z,y at 0 there
    l_pad = l_pad.at[:, mt:].set(0.0)
    u_pad = u_pad.at[:, mt:].set(0.0)

    if interpret:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            x, z, y = _pallas_run(pq, qh, l_pad, u_pad, iters, tile)
    else:
        x, z, y = _pallas_run(pq, qh, l_pad, u_pad, iters, tile)

    x = x[:, :n]
    z = z[:, :mt]
    y = y[:, :mt]

    # residuals/objective identical to ops/admm.py (original units)
    prec = spec.precision
    Ax = jnp.matmul(x, spec.A.T, precision=prec)
    l0, u0 = _unpadded_bounds(spec, h, lb, ub)
    Ax_orig = Ax / spec.E
    viol = jnp.abs(Ax - jnp.clip(Ax, l0, u0)) / spec.E
    r_prim = jnp.max(viol, axis=-1)
    r_rel = jnp.max(viol / jnp.maximum(1.0, jnp.abs(Ax_orig)), axis=-1)
    qh_s = c * spec.D * q
    dual = (jnp.matmul(x, spec.P.T, precision=prec) + qh_s
            + jnp.matmul(y, spec.A, precision=prec)) / (spec.D * c)
    r_dual = jnp.max(jnp.abs(dual), axis=-1)
    obj = (0.5 * jnp.sum(x * jnp.matmul(x, spec.P.T, precision=prec),
                         axis=-1) + jnp.sum(qh_s * x, axis=-1)) / c
    # kernel does not expose δy → no certificate (conservative False:
    # callers treat non-converged nodes as "branch anyway", never prune)
    cert = jnp.zeros(r_prim.shape, bool)
    return AdmmResult(x=spec.D * x, obj=obj, r_prim=r_prim,
                      r_prim_rel=r_rel, r_dual=r_dual,
                      infeas_cert=cert, y=y, z=z)


def _unpadded_bounds(spec: BoxQP, h, lb, ub):
    m = spec.m_ineq
    l = jnp.concatenate([jnp.full(h.shape[:-1] + (m,), -BIG, h.dtype),
                         jnp.clip(lb * spec.E[m:], -BIG, BIG)], axis=-1)
    u = jnp.concatenate([h * spec.E[:m],
                         jnp.clip(ub * spec.E[m:], -BIG, BIG)], axis=-1)
    return l, u
