"""Device-sharded scenario-tree MIQP via consensus ADMM (SURVEY.md §5
"scenario-tree depth sharded across devices"; VERDICT round-1 item 8).

The dense joint build (ops/scenario_tree.py) materializes one
O((S·N·nv)²) condensed H — tree size is capped by one chip's HBM. This
module never forms the joint problem: each scenario keeps its OWN copy
of the single-scenario condensed QP (one shared KKT inverse for all of
them), and non-anticipativity is enforced *inside the ADMM splitting*:

  - the single-scenario constraint block gains N·(nu+nδ) unit selector
    rows (one per shared-decision coordinate), and
  - the z-update on those rows REPLACES the box projection with the
    probability-weighted group mean over the scenarios that share the
    information set — the exact proximal solution of the consensus
    constraint (global-variable consensus ADMM, cf. Boyd et al. §7).

Probability weighting rides a scaled-dual change of variables: scenario
s uses penalties ρ_s = p_s·ρ and σ_s = p_s·σ, so its KKT matrix is
p_s·K with K SHARED — in the scaled duals ỹ = y/p_s every scenario runs
the *standard* iteration (ops/admm.py) and only the consensus z-update
sees the probabilities. Per-iteration work is S batched matmuls
(scenario axis = batch axis = mesh axis) plus one tiny (S,S,N) group-
mean einsum; sharded over a `scen` mesh axis, XLA partitions the
matmuls and inserts one small all-gather for the einsum — memory per
device is O(S/P · (N·nv)²) instead of O((S·N·nv)²) total.

B&B: binaries in a shared information set are ONE decision. The search
branches on set representatives; `TreeBackend.solve` expands rep-coord
bounds to every member (one gather), so fixing a set fixes it in all
scenarios at once. Parity vs the dense joint build is tested at small S
(tests/test_consensus_tree.py).

Infeasibility: per-scenario dual certificates only (a node is certified
infeasible if ANY scenario alone is). Cross-scenario consensus
infeasibility is not certified — such nodes stay "unconverged" and are
resolved by deeper fixing, never by a wrong prune.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyhybridcontrol_tpu.ops.admm import BIG, AdmmResult, BoxQP, prepare_admm
from pyhybridcontrol_tpu.ops.condense import CondensedMpc, DeviceQP
from pyhybridcontrol_tpu.ops.scenario_tree import ScenarioTree
from pyhybridcontrol_tpu.solver.bnb import BnbResult, BnbSpec, _bnb_loop


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TreeConsensusQP:
    """Prepared consensus-ADMM scenario-tree problem (pytree)."""

    admm: BoxQP              # single-scenario ADMM prep, consensus rows
    #                          appended to the constraint block
    qp: DeviceQP             # single-scenario DeviceQP (assembly)
    M: jnp.ndarray           # (S, S, N) p-weighted group-mean tensor:
    #                          mean_s[v] = Σ_t M[s,t,k]·v[t,k,:]
    probs: jnp.ndarray       # (S,)
    omega: jnp.ndarray       # (S, N, nω) tree disturbance paths
    S: int = dataclasses.field(metadata=dict(static=True))
    N: int = dataclasses.field(metadata=dict(static=True))
    nud: int = dataclasses.field(metadata=dict(static=True))
    cons0: int = dataclasses.field(metadata=dict(static=True))
    # B&B maps (static: they define compiled shapes/gathers)
    binary_reps: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))       # rep coords in (S·nV) space
    rep_map: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True))       # (S·nV) member→rep coord map

    @property
    def nV(self) -> int:
        return self.qp.n

    @property
    def ncr(self) -> int:
        return self.N * self.nud


def prepare_tree_consensus(cmpc: CondensedMpc, tree: ScenarioTree,
                           **admm_kw) -> TreeConsensusQP:
    """Host build. ``cmpc`` must be the plain full-v single-scenario
    condensation (same restriction as the dense joint build —
    ops/scenario_tree.py:108)."""
    if cmpc.T_full.shape[0] != cmpc.T_full.shape[1]:
        raise ValueError(
            "consensus tree requires the plain full-v frame (no move "
            "blocking / soft slacks on the single-scenario problem)")
    info = cmpc.info
    S, N, nv, nV = tree.S, tree.N, info.nv, cmpc.nV
    if N != cmpc.N:
        raise ValueError(f"tree N={N} != condensed N={cmpc.N}")
    nud = info.nu + info.ndelta

    # consensus selector rows appended to G: coordinate (k, j<nud)
    E_sel = np.zeros((N * nud, nV))
    for k in range(N):
        for j in range(nud):
            E_sel[k * nud + j, k * nv + j] = 1.0
    cons0 = cmpc.G.shape[0]
    G_aug = np.vstack([cmpc.G, E_sel])
    admm_kw.setdefault("q_typical", cmpc.f0)
    admm_kw.setdefault("binary_idx", cmpc.binary_idx)
    admm_kw.setdefault("boost_rows", getattr(cmpc, "z_rows", None))
    admm = prepare_admm(G_aug, cmpc.H,
                        eq_rows=np.arange(cons0, cons0 + N * nud),
                        **admm_kw)

    # p-weighted group-mean tensor
    p = np.asarray(tree.probs, np.float64)
    g = np.asarray(tree.groups)                      # (S, N)
    M = np.zeros((S, S, N))
    for k in range(N):
        same = g[:, k][:, None] == g[:, k][None, :]  # (S, S)
        wgt = same * p[None, :]
        M[:, :, k] = wgt / wgt.sum(axis=1, keepdims=True)

    # binary info sets → representatives + member→rep map
    qp = cmpc.device_qp()
    rep_map = np.arange(S * nV)
    reps = []
    seen = {}
    for c in qp.binary_idx:                          # per-scenario coord
        k, j = c // nv, c % nv
        if j >= nud:                                 # uncoupled binary
            for s in range(S):
                reps.append(s * nV + c)
            continue
        for s in range(S):
            key = (int(g[s, k]), k, j)
            if key not in seen:
                seen[key] = s * nV + c
                reps.append(s * nV + c)
            rep_map[s * nV + c] = seen[key]
    return TreeConsensusQP(
        admm=admm, qp=qp,
        M=jnp.asarray(M, jnp.float32),
        probs=jnp.asarray(p, jnp.float32),
        omega=jnp.asarray(tree.omega_paths, jnp.float32),
        S=S, N=N, nud=nud, cons0=cons0,
        binary_reps=tuple(int(r) for r in sorted(reps)),
        rep_map=tuple(int(r) for r in rep_map))


def assemble_tree(tqp: TreeConsensusQP, x0, price_seq=None, u_prev=None):
    """Per-scenario (f, h): scenario s sees its own tree path ω_s.
    ``price_seq`` (N, nv) is UNWEIGHTED (probabilities are handled by
    the consensus iteration, not the data). Returns f (S, nV),
    h (S, m + ncr) with the consensus rows' bounds at +BIG (their
    z-update never clips)."""
    qp = tqp.qp

    def one(W):
        return qp.assemble(x0, W, u_prev, price_seq)

    f, h = jax.vmap(one)(tqp.omega)
    free = jnp.full((tqp.S, tqp.ncr), BIG, h.dtype)
    return f, jnp.concatenate([h, free], axis=-1)


def tree_admm_solve(tqp: TreeConsensusQP, f, h, lb, ub,
                    iters: int = 200, warm=None,
                    scen_mesh=None) -> AdmmResult:
    """Consensus ADMM over the scenario axis. f (…, S, nV), h (…, S, m̄g),
    lb/ub (…, S, nV). Returns a per-PROBLEM AdmmResult: x keeps the
    scenario axis (…, S, nV); obj = Σ_s p_s J_s; residuals are maxima
    over scenarios (consensus rows measure |Ax − groupmean|).

    ``scen_mesh``: optional (Mesh, axis_name) pinning the S axis (always
    dim −2 of the iterates) to a mesh axis — XLA then partitions the
    batched matmuls over scenarios and inserts the (small) consensus
    all-gather for the group-mean einsum.
    """
    spec = tqp.admm
    rho, alpha, sigma = spec.rho_vec, spec.alpha, spec.sigma
    c = spec.cost_scale
    qh = c * spec.D * f
    m = spec.m_ineq
    l_ = jnp.concatenate(
        [jnp.full(h.shape[:-1] + (m,), -BIG, h.dtype),
         jnp.clip(lb * spec.E[m:], -BIG, BIG)], axis=-1)
    u_ = jnp.concatenate(
        [jnp.clip(h * spec.E[:m], -BIG, BIG),
         jnp.clip(ub * spec.E[m:], -BIG, BIG)], axis=-1)
    batch = qh.shape[:-1]
    n, mt = spec.n, spec.m_total
    c0, c1 = tqp.cons0, tqp.cons0 + tqp.ncr

    if scen_mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        mesh_, ax_ = scen_mesh

        def pin(a):
            spec_ = PartitionSpec(*([None] * (a.ndim - 2) + [ax_, None]))
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh_, spec_))
    else:
        def pin(a):
            return a

    if warm is None:
        x = jnp.zeros(batch + (n,), qh.dtype)
        z = jnp.clip(jnp.zeros(batch + (mt,), qh.dtype), l_, u_)
        y = jnp.zeros(batch + (mt,), qh.dtype)
    else:
        x0w, z0w, y0w = warm
        x = x0w / spec.D
        z = jnp.clip(z0w, l_, u_)
        y = y0w

    AT = spec.A.T
    prec = spec.precision

    def mm(a, b):
        return jnp.matmul(a, b, precision=prec)

    def group_mean(v):
        """p-weighted mean over information sets. v (…, S, ncr)."""
        vk = v.reshape(v.shape[:-1] + (tqp.N, tqp.nud))
        out = jnp.einsum("stk,...tkj->...skj", tqp.M, vk,
                         precision="highest")
        return out.reshape(v.shape)

    def z_update(s_):
        z_box = jnp.clip(s_, l_, u_)
        zc = group_mean(s_[..., c0:c1])
        return z_box.at[..., c0:c1].set(zc)

    def body(_, carry):
        x, z, y, _ = carry
        w = rho * z - y
        xt = pin(mm(sigma * x - qh + mm(w, spec.A), spec.Kinv.T))
        zt = mm(xt, AT)
        zr = alpha * zt + (1.0 - alpha) * z
        z_new = z_update(zr + y / rho)
        y_new = y + rho * (zr - z_new)
        return xt, z_new, y_new, y_new - y

    dy0 = jnp.zeros_like(y)
    x, z, y, dy = jax.lax.fori_loop(0, iters, body, (x, z, y, dy0))

    Ax = mm(x, AT)
    Ax_orig = Ax / spec.E
    viol = jnp.abs(Ax - jnp.clip(Ax, l_, u_))
    # consensus rows: split-variable gap (z holds the group mean) —
    # this is the non-anticipativity residual
    viol = viol.at[..., c0:c1].set(jnp.abs(Ax - z)[..., c0:c1])
    viol = viol / spec.E
    r_prim = jnp.max(viol, axis=(-2, -1))
    r_rel = jnp.max(viol / jnp.maximum(1.0, jnp.abs(Ax_orig)),
                    axis=(-2, -1))
    dual = (mm(x, spec.P.T) + qh + mm(y, spec.A)) / (spec.D * c)
    r_dual = jnp.max(jnp.abs(dual), axis=(-2, -1))
    obj_s = (0.5 * jnp.sum(x * mm(x, spec.P.T), axis=-1)
             + jnp.sum(qh * x, axis=-1)) / c
    obj = jnp.sum(tqp.probs * obj_s, axis=-1)
    x_orig = spec.D * x

    # per-scenario infeasibility certificate, consensus dy masked
    dyc = dy.at[..., c0:c1].set(0.0)
    dy_norm = jnp.max(jnp.abs(dyc), axis=-1)
    Atdy = jnp.max(jnp.abs(mm(dyc, spec.A)), axis=-1)
    fin_u = u_ < 0.9 * BIG
    fin_l = l_ > -0.9 * BIG
    dyp = jnp.maximum(dyc, 0.0)
    dyn_ = jnp.minimum(dyc, 0.0)
    support = (jnp.sum(jnp.where(~fin_u, dyp, 0.0), axis=-1)
               + jnp.sum(jnp.where(~fin_l, -dyn_, 0.0), axis=-1))
    gap_term = (jnp.sum(jnp.where(fin_u, u_ * dyp, 0.0), axis=-1)
                + jnp.sum(jnp.where(fin_l, l_ * dyn_, 0.0), axis=-1))
    eps_c = 1e-4
    cert_s = ((dy_norm > 1e-12) & (Atdy <= eps_c * dy_norm)
              & (support <= eps_c * dy_norm)
              & (gap_term <= -eps_c * dy_norm))
    return AdmmResult(x=x_orig, obj=obj, r_prim=r_prim,
                      r_prim_rel=r_rel, r_dual=r_dual,
                      infeas_cert=jnp.any(cert_s, axis=-1), y=y, z=z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TreeBackend:
    """B&B backend over the flat (S·nV) joint decision. The loop
    branches on information-set REPRESENTATIVE coords; ``solve``
    expands their bounds to all member scenarios (one gather via
    ``rep_map``) so one branching decision fixes a whole set."""

    tqp: TreeConsensusQP
    scen_mesh: object = dataclasses.field(
        default=None, metadata=dict(static=True))
    # stiff-rho prep for dive probes: fully-fixed consensus leaves are
    # the implied-equality case over S coupled scenarios — at rho=1
    # they certify at ~8000 iterations, stiff rho collapses that (see
    # solver/bnb.py CondensedBackend.admm_probe)
    tqp_probe: object = dataclasses.field(default=None)

    @property
    def n(self):
        return self.tqp.S * self.tqp.nV

    @property
    def lb(self):
        return jnp.tile(self.tqp.qp.lb, (self.tqp.S,))

    @property
    def ub(self):
        return jnp.tile(self.tqp.qp.ub, (self.tqp.S,))

    @property
    def binary_idx(self):
        return self.tqp.binary_reps

    @property
    def warm_size(self):
        return self.tqp.S * self.tqp.admm.m_total

    def solve(self, f, h, lb, ub, iters, warm=None):
        tqp = self.tqp
        S, nV = tqp.S, tqp.nV
        rep = jnp.asarray(np.asarray(tqp.rep_map, np.int32))
        lb = jnp.take(lb, rep, axis=-1).reshape(lb.shape[:-1] + (S, nV))
        ub = jnp.take(ub, rep, axis=-1).reshape(ub.shape[:-1] + (S, nV))
        batch = f.shape[:-1]
        fr = f.reshape(batch + (S, nV))
        hr = h.reshape(batch + (S, -1))
        if warm is not None:
            xw, zw, yw = warm
            warm = (xw.reshape(batch + (S, nV)),
                    zw.reshape(batch + (S, -1)),
                    yw.reshape(batch + (S, -1)))
        res = tree_admm_solve(tqp, fr, hr, lb, ub, iters=iters,
                              warm=warm, scen_mesh=self.scen_mesh)
        return dataclasses.replace(
            res,
            x=res.x.reshape(batch + (self.n,)),
            z=res.z.reshape(batch + (self.warm_size,)),
            y=res.y.reshape(batch + (self.warm_size,)))

    def solve_probe(self, f, h, lb, ub, iters, warm=None):
        if self.tqp_probe is None:
            return self.solve(f, h, lb, ub, iters, warm=warm)
        return TreeBackend(self.tqp_probe, self.scen_mesh).solve(
            f, h, lb, ub, iters, warm=warm)

    def broadcast_data(self, f, h, W):
        return (jnp.broadcast_to(f, (W,) + f.shape),
                jnp.broadcast_to(h, (W,) + h.shape))


@partial(jax.jit, static_argnames=("spec", "scen_mesh"))
def solve_tree_miqp(tqp: TreeConsensusQP, f, h,
                    spec: BnbSpec = BnbSpec(),
                    init_incumbent=None,
                    scen_mesh=None, tqp_probe=None) -> BnbResult:
    """B&B over the consensus-tree MIQP. (f, h) from ``assemble_tree``
    (shapes (S, nV) / (S, m̄g) — flattened internally). Returns
    BnbResult with x the flat (S·nV) joint plan (reshape to (S, nV)).

    ``scen_mesh``: optional (Mesh, axis_name) sharding the scenario
    axis of the (wave, S, …) node batches across the mesh — ONE joint
    tree MIQP spanning all devices."""
    return _bnb_loop(TreeBackend(tqp, scen_mesh, tqp_probe),
                     f.reshape(-1), h.reshape(-1), spec,
                     init_incumbent=init_incumbent)
