"""Generic PWA → MLD conversion via big-M (SURVEY.md §2a "PWA→MLD
conversion"; the reference encodes this per-model by hand — here it is a
general converter, per the [LIT] recipe of Bemporad & Morari 1999 §3).

A PWA system is a list of regions i = 1..M:

    x⁺ = A_i x + B_i u + c_i   whenever   S_i x + R_i u ≤ T_i,

with the operating set bounded by a box  x_lb ≤ x ≤ x_ub, u_lb ≤ u ≤ u_ub
(big-M validity requires bounded operation). Encoding:

  * one binary δ_i per region with  Σ_i δ_i = 1  (two ≤ rows),
  * region guard:  S_i x + R_i u − T_i ≤ M_i (1 − δ_i)   with M_i the row
    max of the guard over the box (interval arithmetic),
  * per-region auxiliary  z_i = δ_i · (A_i x + B_i u + c_i) ∈ ℝ^{nx}
    via the four standard big-M product rows, so  x⁺ = Σ_i z_i,
  * the box itself is appended as constraint rows (it is load-bearing —
    it makes every big-M finite).

Conversion is exact on the box: for any (x,u) in exactly one region the
unique feasible (δ, z) reproduces the PWA successor state.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from pyhybridcontrol_tpu.mld.info import MldInfo
from pyhybridcontrol_tpu.mld.model import MldModel


@dataclasses.dataclass
class PwaRegion:
    A: np.ndarray
    B: np.ndarray
    c: np.ndarray          # (nx,)
    S: np.ndarray          # guard: S x + R u ≤ T
    R: np.ndarray
    T: np.ndarray          # (ng,)


@dataclasses.dataclass
class PwaSystem:
    regions: List[PwaRegion]
    x_lb: np.ndarray
    x_ub: np.ndarray
    u_lb: np.ndarray
    u_ub: np.ndarray
    u_types: Optional[Sequence[str]] = None

    @property
    def nx(self):
        return self.regions[0].A.shape[0]

    @property
    def nu(self):
        return self.regions[0].B.shape[1]

    def simulate_step(self, x, u):
        """Host-side exact PWA step (region lookup) — test oracle."""
        for reg in self.regions:
            if np.all(reg.S @ x + reg.R @ u <= reg.T + 1e-9):
                return reg.A @ x + reg.B @ u + reg.c
        raise ValueError("state/input not in any PWA region")


def _interval_bounds(W, lb, ub):
    """Componentwise [min, max] of W @ v over lb ≤ v ≤ ub."""
    Wp = np.maximum(W, 0.0)
    Wn = np.minimum(W, 0.0)
    lo = Wp @ lb + Wn @ ub
    hi = Wp @ ub + Wn @ lb
    return lo, hi


def pwa_to_mld(sys: PwaSystem, big_m_margin: float = 1e-6) -> MldModel:
    """Convert a PWA system to an equivalent MldModel (exact on the box)."""
    M = len(sys.regions)
    nx, nu = sys.nx, sys.nu
    ndelta = M
    nz = M * nx

    rows_E, rows_F1, rows_F2, rows_F3, rows_f5 = [], [], [], [], []

    def add_row(E=None, F1=None, F2=None, F3=None, f5=0.0):
        rows_E.append(np.zeros(nx) if E is None else np.asarray(E, float))
        rows_F1.append(np.zeros(nu) if F1 is None else np.asarray(F1, float))
        rows_F2.append(np.zeros(ndelta) if F2 is None else np.asarray(F2, float))
        rows_F3.append(np.zeros(nz) if F3 is None else np.asarray(F3, float))
        rows_f5.append(float(f5))

    # Σ δ_i = 1  →  Σδ ≤ 1 and −Σδ ≤ −1
    add_row(F2=np.ones(ndelta), f5=1.0)
    add_row(F2=-np.ones(ndelta), f5=-1.0)

    # operating box on x and u
    for j in range(nx):
        e = np.zeros(nx); e[j] = 1.0
        add_row(E=e, f5=sys.x_ub[j])
        add_row(E=-e, f5=-sys.x_lb[j])
    for j in range(nu):
        e = np.zeros(nu); e[j] = 1.0
        add_row(F1=e, f5=sys.u_ub[j])
        add_row(F1=-e, f5=-sys.u_lb[j])

    for i, reg in enumerate(sys.regions):
        zsl = slice(i * nx, (i + 1) * nx)
        ei = np.zeros(ndelta); ei[i] = 1.0

        # guard rows: S x + R u − T ≤ Mg (1 − δ_i)
        G = np.hstack([reg.S, reg.R])
        _, g_hi = _interval_bounds(
            G, np.concatenate([sys.x_lb, sys.u_lb]),
            np.concatenate([sys.x_ub, sys.u_ub]))
        Mg = g_hi - reg.T + big_m_margin
        Mg = np.maximum(Mg, 0.0)
        for r in range(reg.S.shape[0]):
            add_row(E=reg.S[r], F1=reg.R[r], F2=Mg[r] * ei,
                    f5=reg.T[r] + Mg[r])

        # w_i(x,u) = A_i x + B_i u + c_i, bounds over the box
        Wab = np.hstack([reg.A, reg.B])
        lo, hi = _interval_bounds(
            Wab, np.concatenate([sys.x_lb, sys.u_lb]),
            np.concatenate([sys.x_ub, sys.u_ub]))
        L = lo + reg.c - big_m_margin
        U = hi + reg.c + big_m_margin

        for j in range(nx):
            zj = np.zeros(nz); zj[zsl][j] = 1.0
            a, b, c = reg.A[j], reg.B[j], reg.c[j]
            # z ≤ U δ
            add_row(F2=-U[j] * ei, F3=zj, f5=0.0)
            # z ≥ L δ   →  −z + L δ ≤ 0
            add_row(F2=L[j] * ei, F3=-zj, f5=0.0)
            # z ≤ w − L(1−δ)  →  z − w − L δ ≤ −L
            add_row(E=-a, F1=-b, F2=-L[j] * ei, F3=zj, f5=c - L[j])
            # z ≥ w − U(1−δ)  →  w − z − U δ ≤ U... : −z + w + U δ ≤ U... sign:
            # w − U(1−δ) ≤ z  →  w − z − Uδ ≤ −... compute: A x + B u + c − U + Uδ ≤ z
            add_row(E=a, F1=b, F2=U[j] * ei, F3=-zj, f5=U[j] - c)

    # dynamics: x⁺ = Σ_i z_i  →  B3 = [I I … I]
    B3 = np.hstack([np.eye(nx)] * M)

    info = MldInfo(nx=nx, nu=nu, ndelta=ndelta, nz=nz, nomega=0, ny=nx,
                   ncons=len(rows_f5),
                   u_types=tuple(sys.u_types) if sys.u_types else ("c",) * nu)
    return MldModel.from_matrices(
        info,
        A=np.zeros((nx, nx)), B3=B3, C=np.eye(nx),
        E=np.stack(rows_E), F1=np.stack(rows_F1), F2=np.stack(rows_F2),
        F3=np.stack(rows_F3), f5=np.asarray(rows_f5),
    )
