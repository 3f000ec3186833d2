"""TPU-resident branch-and-bound MIQP engine (SURVEY.md §2b ``solver/bnb``
— replaces Gurobi's B&B core, redesigned for XLA's static-shape model).

Design: a *fixed-capacity node pool* with an active mask instead of a
dynamic frontier (SURVEY.md §7 "hard parts"). Each **wave** (one iteration
of a jitted ``lax.while_loop``):

  1. select the W best-bound active nodes (``lax.top_k`` — best-first),
  2. solve their QP relaxations as ONE batched ADMM call (MXU matmuls),
  3. solve W *probe* QPs — binaries fixed to the rounded relaxation —
     which is the primal dive heuristic: every feasible probe is a true
     MIQP upper bound, so the incumbent drops early and pruning bites,
  4. prune (infeasible / bound ≥ incumbent − gap / integral relaxation),
  5. branch the survivors on their most-fractional binary: child-0
     overwrites the parent slot, child-1 takes a free slot (best-bound
     children win slots on overflow; overflow is reported — the result is
     then a certified-feasible but possibly suboptimal sequence).

A node is (fix_mask, fix_val) over the binary indices — bounds tightening
only — so the ADMM KKT inverse is shared by every node (see ops/admm.py).
Everything is static-shape; the whole solve is one device program with no
host round-trips. Incumbent monotonicity + bound-validity invariants are
property-tested (SURVEY.md §4.6).

Multi-device: ``parallel/sharded_bnb.py`` shards the pool over a mesh and
all-reduces the incumbent each wave.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from pyhybridcontrol_tpu.ops.admm import BoxQP, admm_solve
from pyhybridcontrol_tpu.ops.condense import DeviceQP

BIG = 1e30


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CondensedBackend:
    """Default QP backend: condensed DeviceQP + dense ADMM. The B&B
    loop only touches this interface, so alternative solvers (the
    stagewise O(N) path — solver/bnb_stagewise.py) plug in the same
    wave loop."""

    admm: BoxQP
    qp: DeviceQP

    @property
    def n(self):
        return self.qp.n

    @property
    def lb(self):
        return self.qp.lb

    @property
    def ub(self):
        return self.qp.ub

    @property
    def binary_idx(self):
        return self.qp.binary_idx

    @property
    def warm_size(self):
        return self.admm.m_total

    def solve(self, f, h, lb, ub, iters, warm=None):
        return admm_solve(self.admm, f, h, lb, ub, iters=iters, warm=warm)

    def broadcast_data(self, f, h, W):
        return (jnp.broadcast_to(f, (W,) + f.shape),
                jnp.broadcast_to(h, (W,) + h.shape))


@dataclasses.dataclass(frozen=True)
class BnbSpec:
    """Static B&B configuration."""

    capacity: int = 512          # node-pool slots
    wave_size: int = 64          # nodes relaxed per wave
    max_waves: int = 64
    qp_iters: int = 100
    feas_tol: float = 1e-3       # "converged" primal-residual tolerance
    infeas_tol: float = 0.5      # residual fallback for "clearly
    # infeasible" — primary detection is the ADMM dual certificate
    # (AdmmResult.infeas_cert); anything between feas_tol and this is
    # "unconverged": branch anyway on the parent bound rather than
    # wrongly pruning a hard-but-feasible relaxation (degenerate PWA
    # relaxations sit at large residuals for thousands of iterations).
    int_tol: float = 1e-3        # integrality tolerance on relaxed binaries
    gap: float = 1e-4            # absolute pruning gap margin
    warm_start: bool = True      # children inherit parent ADMM iterates
    # (x, z, y) through the node pool — fewer iterations to re-converge
    probe_iters: int = 0         # iterations for dive probes / leaf
    # evaluation; 0 → same as qp_iters. Degenerate big-M leaves need
    # several thousand iterations to certify (see docs/PERFORMANCE.md).

    def __post_init__(self):
        if self.wave_size > self.capacity:
            # would otherwise surface as a cryptic lax.top_k shape error
            # deep inside the jitted wave loop
            raise ValueError(
                f"wave_size ({self.wave_size}) cannot exceed pool "
                f"capacity ({self.capacity})")
        if self.capacity < 2 or self.wave_size < 1:
            raise ValueError("need capacity >= 2 and wave_size >= 1")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BnbState:
    fix_mask: jnp.ndarray     # (C, nb) bool
    fix_val: jnp.ndarray      # (C, nb) f32
    x_pool: jnp.ndarray       # (C, n) parent primal (original units)
    z_pool: jnp.ndarray       # (C, m̄) parent z (scaled frame)
    y_pool: jnp.ndarray       # (C, m̄) parent dual (scaled frame)
    bound: jnp.ndarray        # (C,) parent relaxation lower bound
    active: jnp.ndarray       # (C,) bool
    depth: jnp.ndarray        # (C,) i32
    inc_obj: jnp.ndarray      # () incumbent objective
    inc_x: jnp.ndarray        # (n,) incumbent solution
    inc_found: jnp.ndarray    # () bool
    wave: jnp.ndarray         # () i32
    nodes_solved: jnp.ndarray  # () i32
    overflow: jnp.ndarray     # () bool
    alive: jnp.ndarray        # () bool — any active node (globally, when
    #                           a global_any_active hook is installed)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BnbResult:
    x: jnp.ndarray
    obj: jnp.ndarray
    found: jnp.ndarray
    waves: jnp.ndarray
    nodes_solved: jnp.ndarray
    overflow: jnp.ndarray
    best_open_bound: jnp.ndarray   # min bound over still-open nodes (gap)


def _init_state(qp, spec: BnbSpec, dtype, m_total: int
                ) -> BnbState:
    C, nb, n = spec.capacity, len(qp.binary_idx), qp.n
    mw = m_total if spec.warm_start else 1
    nw = n if spec.warm_start else 1
    return BnbState(
        fix_mask=jnp.zeros((C, nb), bool),
        fix_val=jnp.zeros((C, nb), dtype),
        x_pool=jnp.zeros((C, nw), dtype),
        z_pool=jnp.zeros((C, mw), dtype),
        y_pool=jnp.zeros((C, mw), dtype),
        bound=jnp.full((C,), -BIG, dtype),
        active=jnp.zeros((C,), bool).at[0].set(True),
        depth=jnp.zeros((C,), jnp.int32),
        inc_obj=jnp.asarray(BIG, dtype),
        inc_x=jnp.zeros((n,), dtype),
        inc_found=jnp.asarray(False),
        wave=jnp.asarray(0, jnp.int32),
        nodes_solved=jnp.asarray(0, jnp.int32),
        overflow=jnp.asarray(False),
        alive=jnp.asarray(True),
    )


def _bnb_loop(backend, f, h, spec: BnbSpec,
              root_active: bool = True,
              exchange_children=None,
              reduce_incumbent=None,
              global_any_active=None,
              root_device_pred=None,
              init_incumbent=None) -> BnbResult:
    """Shared B&B wave loop. The three optional hooks are the multi-device
    seams (SURVEY.md §2b ``dist/collective``):

      exchange_children(pytree) — permute the child-1 batch across devices
        (load balancing); identity when single-device.
      reduce_incumbent(obj, x, found) — all-reduce-min the incumbent.
      global_any_active(bool) — OR-reduce the termination flag.

    Called directly for single-chip solves and from inside ``shard_map``
    for pool-sharded solves (parallel/sharded_bnb.py).
    """
    nb = len(backend.binary_idx)
    if nb == 0:
        res = backend.solve(f, h, backend.lb, backend.ub, spec.qp_iters)
        zero = jnp.asarray(0, jnp.int32)
        return BnbResult(res.x, res.obj, res.r_prim_rel < spec.feas_tol,
                         zero, jnp.asarray(1, jnp.int32),
                         jnp.asarray(False), res.obj)
    bidx = jnp.asarray(np.asarray(backend.binary_idx, np.int32))
    W = spec.wave_size
    dtype = jnp.result_type(f)
    state = _init_state(backend, spec, dtype, backend.warm_size)
    if not root_active:
        state = dataclasses.replace(
            state, active=jnp.zeros_like(state.active))
    if root_device_pred is not None:
        # SPMD: only the root device's pool starts with the root node
        state = dataclasses.replace(
            state, active=state.active & root_device_pred)
    if init_incumbent is not None:
        # seed from a heuristic (e.g. rollout repair — solver/repair.py):
        # any feasible point is a valid upper bound from wave 0.
        obj0, x0V, ok0 = init_incumbent
        state = dataclasses.replace(
            state,
            inc_obj=jnp.where(ok0, obj0.astype(state.inc_obj.dtype),
                              state.inc_obj),
            inc_x=jnp.where(ok0, x0V.astype(state.inc_x.dtype),
                            state.inc_x),
            inc_found=state.inc_found | ok0)

    def node_bounds(fm, fv):
        """(W, n) lb/ub for nodes given fixed-binary masks/values."""
        Wb = fm.shape[0]
        lb = jnp.broadcast_to(backend.lb, (Wb, backend.n))
        ub = jnp.broadcast_to(backend.ub, (Wb, backend.n))
        lb = lb.at[:, bidx].set(jnp.where(fm, fv, 0.0))
        ub = ub.at[:, bidx].set(jnp.where(fm, fv, 1.0))
        return lb, ub

    fb, hb = backend.broadcast_data(f, h, W)

    def cond(s: BnbState):
        return s.alive & (s.wave < spec.max_waves)

    def body(s: BnbState) -> BnbState:
        # -- 1. best-first selection ------------------------------------
        pri = jnp.where(s.active, s.bound, BIG)
        neg, sel = jax.lax.top_k(-pri, W)
        valid = s.active[sel]
        fm = s.fix_mask[sel]
        fv = s.fix_val[sel]
        parent_bound = s.bound[sel]

        # -- 2. batched relaxations -------------------------------------
        lb, ub = node_bounds(fm, fv)
        warm = ((s.x_pool[sel], s.z_pool[sel], s.y_pool[sel])
                if spec.warm_start else None)
        relax = backend.solve(fb, hb, lb, ub, spec.qp_iters, warm=warm)
        converged = relax.r_prim_rel < spec.feas_tol
        infeasible = relax.infeas_cert | (relax.r_prim_rel > spec.infeas_tol)
        # trustworthy lower bound only when converged; otherwise inherit
        # the parent bound (still valid) so the child ordering stays sane.
        lower = jnp.where(valid & converged, relax.obj,
                          jnp.where(valid & ~infeasible, parent_bound, BIG))

        xb = relax.x[:, bidx]
        rounded = jnp.round(jnp.clip(xb, 0.0, 1.0))
        frac = jnp.where(fm, 0.0, jnp.abs(xb - rounded))
        max_frac = jnp.max(frac, axis=1) if nb > 0 else jnp.zeros(W)
        integral = max_frac < spec.int_tol

        # -- 3. probe (dive): all binaries fixed to rounded -------------
        pv = jnp.where(fm, fv, rounded)
        ones = jnp.ones_like(fm)
        lb_p, ub_p = node_bounds(ones, pv)
        probe = backend.solve(fb, hb, lb_p, ub_p,
                              spec.probe_iters or spec.qp_iters,
                              warm=(relax.x, relax.z, relax.y))
        probe_ok = (probe.r_prim_rel < spec.feas_tol) & valid
        probe_obj = jnp.where(probe_ok, probe.obj, BIG)
        k = jnp.argmin(probe_obj)
        better = probe_obj[k] < s.inc_obj
        inc_obj = jnp.where(better, probe_obj[k], s.inc_obj)
        inc_x = jnp.where(better, probe.x[k], s.inc_x)
        inc_found = s.inc_found | (better & probe_ok[k])
        if reduce_incumbent is not None:
            inc_obj, inc_x, inc_found = reduce_incumbent(
                inc_obj, inc_x, inc_found)

        # -- 4. prune ----------------------------------------------------
        fully_fixed = jnp.all(fm, axis=1)   # leaf: nothing left to branch
        prune = ((~valid) | infeasible | fully_fixed
                 | (converged & (lower >= inc_obj - spec.gap))
                 | (converged & integral))
        expand = valid & ~prune

        # -- 5. branch ---------------------------------------------------
        child_bound = jnp.maximum(parent_bound,
                                  jnp.where(converged, lower, parent_bound))
        # branch on most-fractional FREE binary (fixed ones score −1 so
        # frac-0 ties can never select an already-fixed variable)
        jstar = jnp.argmax(jnp.where(fm, -1.0, frac), axis=1)
        branch_hot = jax.nn.one_hot(jstar, nb, dtype=bool)
        cfm = fm | branch_hot
        cfv0 = jnp.where(branch_hot, 0.0, fv)
        cfv1 = jnp.where(branch_hot, 1.0, fv)
        cdepth = s.depth[sel] + 1

        # deactivate all selected nodes, then write child-0 into the
        # parent slot (inactive when not expanding — scatter is unmasked
        # but guarded by `expand` in the active flag).
        active = s.active.at[sel].set(False)
        fix_mask = s.fix_mask.at[sel].set(jnp.where(expand[:, None], cfm, fm))
        fix_val = s.fix_val.at[sel].set(jnp.where(expand[:, None], cfv0, fv))
        bound = s.bound.at[sel].set(child_bound)
        depth = s.depth.at[sel].set(cdepth)
        active = active.at[sel].set(expand)
        if spec.warm_start:
            x_pool = s.x_pool.at[sel].set(relax.x)
            z_pool = s.z_pool.at[sel].set(relax.z)
            y_pool = s.y_pool.at[sel].set(relax.y)
        else:
            x_pool, z_pool, y_pool = s.x_pool, s.z_pool, s.y_pool

        # child-1 → free slots; best-bound children win on overflow.
        # Multi-device: the child-1 batch is exchanged across devices
        # first (load balancing — SURVEY.md §5 "node redistribution").
        c1 = dict(fm=cfm, fv=cfv1, bound=child_bound, depth=cdepth,
                  live=expand)
        if spec.warm_start:
            c1.update(xw=relax.x, zw=relax.z, yw=relax.y)
        if exchange_children is not None:
            c1 = exchange_children(c1)
        cfm1, cfv1x = c1["fm"], c1["fv"]
        cb1, cd1, clive = c1["bound"], c1["depth"], c1["live"]

        free_score = jnp.where(active, -1.0, 1.0)
        fs_val, free_slots = jax.lax.top_k(free_score, W)
        slot_free = fs_val > 0.0
        order = jnp.argsort(jnp.where(clive, cb1, BIG))
        # i-th best child → i-th free slot
        tgt = free_slots
        src = order
        write_ok = slot_free & clive[src]
        tgt_safe = jnp.where(write_ok, tgt, spec.capacity)  # drop OOB
        fix_mask = fix_mask.at[tgt_safe].set(cfm1[src], mode="drop")
        fix_val = fix_val.at[tgt_safe].set(cfv1x[src], mode="drop")
        bound = bound.at[tgt_safe].set(cb1[src], mode="drop")
        depth = depth.at[tgt_safe].set(cd1[src], mode="drop")
        active = active.at[tgt_safe].set(True, mode="drop")
        if spec.warm_start:
            x_pool = x_pool.at[tgt_safe].set(c1["xw"][src], mode="drop")
            z_pool = z_pool.at[tgt_safe].set(c1["zw"][src], mode="drop")
            y_pool = y_pool.at[tgt_safe].set(c1["yw"][src], mode="drop")
        overflow = s.overflow | jnp.any(clive[src] & ~slot_free)

        alive = jnp.any(active)
        if global_any_active is not None:
            alive = global_any_active(alive)

        return BnbState(
            fix_mask=fix_mask, fix_val=fix_val,
            x_pool=x_pool, z_pool=z_pool, y_pool=y_pool,
            bound=bound, active=active,
            depth=depth, inc_obj=inc_obj, inc_x=inc_x, inc_found=inc_found,
            wave=s.wave + 1,
            nodes_solved=s.nodes_solved + jnp.sum(valid.astype(jnp.int32)),
            overflow=overflow, alive=alive)

    s = jax.lax.while_loop(cond, body, state)
    best_open = jnp.min(jnp.where(s.active, s.bound, BIG))
    return BnbResult(x=s.inc_x, obj=s.inc_obj, found=s.inc_found,
                     waves=s.wave, nodes_solved=s.nodes_solved,
                     overflow=s.overflow, best_open_bound=best_open)


@partial(jax.jit, static_argnames=("spec",))
def solve_miqp_bnb(admm: BoxQP, qp: DeviceQP, f, h,
                   spec: BnbSpec = BnbSpec(),
                   init_incumbent=None) -> BnbResult:
    """Solve  min ½VᵀHV + fᵀV  s.t. GV ≤ h, lb ≤ V ≤ ub, V[bidx] ∈ {0,1}
    entirely on device. f, h from ``qp.assemble(x0, W, ...)``.
    ``init_incumbent``: optional (obj, V, ok) heuristic seed."""
    return _bnb_loop(CondensedBackend(admm, qp), f, h, spec,
                     init_incumbent=init_incumbent)
