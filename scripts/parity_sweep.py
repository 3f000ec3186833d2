"""Parity sweep: device MIQP engines vs the exact fp64 oracle across
every model family (BASELINE "control-sequence parity" criterion,
SURVEY.md §4.3). Writes PARITY_REPORT.json.

Run:  python scripts/parity_sweep.py [--instances 5]
Exit 0 iff every instance is within tolerance.
"""

import argparse
import json
import os
import sys

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo not in sys.path:
    sys.path.insert(0, _repo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=6)
    ap.add_argument("--rel-tol", type=float, default=2e-3)
    ap.add_argument("--families", type=str, default=None,
                    help="comma-separated family subset (dev only; the "
                         "report is written only for a FULL sweep)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pyhybridcontrol_tpu.models.battery import (
        BatteryParams, battery_model, battery_price_seq, battery_weights)
    from pyhybridcontrol_tpu.models.dewh import (
        DewhParams, dewh_energy_price_seq, dewh_model, dewh_weights)
    from pyhybridcontrol_tpu.models.double_integrator import (
        default_weights, switched_double_integrator)
    from pyhybridcontrol_tpu.models.pwa_examples import (
        pwa_spring_mld, pwa_weights)
    from pyhybridcontrol_tpu.mld.info import MldInfo
    from pyhybridcontrol_tpu.mld.model import MldModel
    from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
    from pyhybridcontrol_tpu.ops.condense import CondensedMpc
    from pyhybridcontrol_tpu.ops.consensus_tree import (
        assemble_tree, prepare_tree_consensus, solve_tree_miqp)
    from pyhybridcontrol_tpu.ops.scenario_tree import (
        ScenarioTree, build_scenario_tree_qp)
    from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb
    from pyhybridcontrol_tpu.solver.oracle import (
        solve_miqp_enumeration_oracle)
    from pyhybridcontrol_tpu.solver.repair import (
        prepare_repair, root_repair_incumbent)

    rng = np.random.default_rng(42)
    spec = BnbSpec(capacity=256, wave_size=32, qp_iters=400,
                   probe_iters=2000, max_waves=48)

    def x0_di():
        return rng.normal(size=2) * 1.5

    def x0_pwa():
        return rng.uniform(-2, 2, size=2)

    def x0_dewh():
        return np.array([rng.uniform(51, 70), float(rng.integers(0, 2))])

    def x0_batt():
        return np.array([rng.uniform(0.15, 0.85)])

    dp = DewhParams()
    bp = BatteryParams()
    families = {
        "double_integrator_N8": dict(
            model=switched_double_integrator(), w=default_weights(), N=8,
            x0=x0_di),
        # N=3 → 9 binaries → 512 oracle subproblems (the fp64 oracle is
        # the cost driver: each reduced QP is a dense ADMM+polish solve)
        # degenerate relaxations → bounds never prune; give the pool
        # an exhaustive budget (tree ≤ ~1k nodes at 9 binaries)
        "pwa_spring_N3": dict(
            model=pwa_spring_mld(on_off=True), w=pwa_weights(), N=3,
            x0=x0_pwa, instances=2,
            spec=BnbSpec(capacity=2048, wave_size=64, qp_iters=400,
                         probe_iters=4000, max_waves=64)),
        # hull (disaggregated) PWA encoding — the config-2 production
        # formulation (configs/benchmarks.py): same MIQP as bigm, so
        # the SAME oracle criterion applies; its tight relaxations are
        # well-conditioned, so the margin is the standard 5e-4.
        "pwa_hull_N3": dict(
            model=pwa_spring_mld(on_off=True, formulation="hull"),
            w=pwa_weights(), N=3, x0=x0_pwa, instances=2,
            spec=BnbSpec(capacity=2048, wave_size=64, qp_iters=400,
                         probe_iters=4000, max_waves=64)),
        "dewh_N6": dict(
            model=dewh_model(dp), w=dewh_weights(), N=6, x0=x0_dewh,
            price=lambda N: dewh_energy_price_seq(
                np.full(N, 0.15), dp, nv=dewh_model(dp).info.nv)),
        # battery objectives are O(0.1): an incumbent accepted at the
        # default feas_tol=1e-3 residual carries an ~1e-3 objective
        # error — larger than this family's 5e-4 margin. Battery's
        # well-conditioned probes converge to ~7e-7 (BnbSpec.inc_tol
        # doc), so the strict incumbent tolerance is safe HERE (it is
        # NOT safe globally: degenerate pwa_spring probes plateau near
        # 1e-4 and a global inc_tol=5e-5 made them fail at 0.09 rel).
        "battery_N6": dict(
            model=battery_model(bp), w=battery_weights(q_soc=2.0), N=6,
            x0=x0_batt,
            spec=BnbSpec(capacity=256, wave_size=32, qp_iters=400,
                         probe_iters=2000, max_waves=48, inc_tol=1e-5),
            price=lambda N: battery_price_seq(
                np.full(N, 0.12), bp, nv=battery_model(bp).info.nv)),
        # transform paths: the condensation transforms reshape the QP
        # (blocked u frame / slack-extended frame) — MIQP parity must
        # hold THROUGH them, not just for plain stage problems. Repair
        # seeding is full-v-layout-only, so it is off here (DI probe
        # rounding finds incumbents without it).
        "di_moveblock_N8": dict(
            model=switched_double_integrator(), w=default_weights(), N=8,
            x0=x0_di, repair=False,
            transform=lambda c: c.with_move_blocking(
                [0, 0, 1, 1, 2, 2, 3, 3])),
        "di_softbox_N8": dict(
            model=switched_double_integrator(), w=default_weights(), N=8,
            x0=lambda: rng.normal(size=2) * 2.5, repair=False,
            transform=lambda c: c.with_soft_constraints(
                list(range(10)), lin_pen=50.0, quad_pen=5.0)),
        # combined transforms: blocking THEN soft (the order the
        # controller applies them) — parity must survive composition
        "di_block_soft_N8": dict(
            model=switched_double_integrator(), w=default_weights(), N=8,
            x0=lambda: rng.normal(size=2) * 2.0, repair=False,
            transform=lambda c: c.with_move_blocking(
                [0, 0, 1, 1, 2, 2, 3, 3]).with_soft_constraints(
                list(range(10)), lin_pen=50.0, quad_pen=5.0)),
    }

    # disturbance-channel DI for the scenario-tree families
    _base = switched_double_integrator()
    _m = _base.numpy_mats()
    omega_di = MldModel.from_matrices(
        MldInfo(nx=2, nu=1, ndelta=1, nz=1, nomega=1, ny=2,
                ncons=_base.info.ncons),
        A=_m.A, B1=_m.B1, B3=_m.B3, B4=np.array([[0.0], [1.0]]),
        C=_m.C, E=_m.E, F1=_m.F1, F2=_m.F2, F3=_m.F3, f5=_m.f5)

    def _tree_instance():
        paths = rng.normal(0.0, 0.3, size=(2, 4, 1))
        return ScenarioTree.from_branching(paths, branch_steps=(1,))

    def _tree_solves(consensus):
        """Family solve hook: dense-joint (or consensus) device MIQP vs
        the fp64 oracle on the SAME dense joint problem."""
        def run(x0, _pq):
            tree = _tree_instance()
            c1 = CondensedMpc(omega_di, 4, default_weights())
            joint = build_scenario_tree_qp(c1, tree)
            W = np.asarray(tree.omega_paths, np.float32).reshape(8, 1)
            tspec = BnbSpec(capacity=512, wave_size=32, qp_iters=600,
                            probe_iters=3000, max_waves=48)
            if consensus:
                tqp = prepare_tree_consensus(c1, tree)
                f, h = assemble_tree(tqp, jnp.asarray(x0))
                r = solve_tree_miqp(tqp, f, h, tspec)
            else:
                qpj, admj = joint.device_qp(), prepare_admm_mpc(joint)
                f, h = qpj.assemble(jnp.asarray(x0), jnp.asarray(W))
                r = solve_miqp_bnb(admj, qpj, f, h, tspec)
            fo, ho = joint.assemble_np(x0, np.asarray(W, np.float64))
            orc = solve_miqp_enumeration_oracle(
                joint.H, fo, joint.G, ho, joint.lb, joint.ub,
                joint.binary_idx)
            return r, orc
        return run

    families["di_tree_dense_S2"] = dict(
        model=omega_di, w=default_weights(), N=4, x0=x0_di,
        instances=4, solve=_tree_solves(consensus=False))
    families["di_tree_consensus_S2"] = dict(
        model=omega_di, w=default_weights(), N=4, x0=x0_di,
        instances=4, solve=_tree_solves(consensus=True))

    def _tree_stagewise(x0, _pq):
        """Scenario tree over the stagewise O(N) frame
        (ops/stagewise_tree.py, round 4) vs the fp64 oracle on the
        dense joint problem. The stagewise frame drops per-scenario
        data constants the condensed frame keeps, so the device plan
        is re-costed in the joint frame before comparison."""
        from pyhybridcontrol_tpu.ops.stagewise_tree import (
            assemble_stagewise_tree, prepare_stagewise_tree,
            solve_tree_miqp_stagewise)

        tree = _tree_instance()
        c1 = CondensedMpc(omega_di, 4, default_weights())
        joint = build_scenario_tree_qp(c1, tree)
        W = np.asarray(tree.omega_paths, np.float32).reshape(8, 1)
        swt = prepare_stagewise_tree(omega_di, tree, default_weights())
        swt_p = prepare_stagewise_tree(omega_di, tree,
                                       default_weights(), rho=10.0)
        q, l, u = assemble_stagewise_tree(swt, jnp.asarray(x0))
        tspec = BnbSpec(capacity=512, wave_size=32, qp_iters=600,
                        probe_iters=3000, max_waves=48)
        r = solve_tree_miqp_stagewise(swt, q, l, u, tspec,
                                      swt_probe=swt_p)
        fo, ho = joint.assemble_np(x0, np.asarray(W, np.float64))
        orc = solve_miqp_enumeration_oracle(
            joint.H, fo, joint.G, ho, joint.lb, joint.ub,
            joint.binary_idx)
        S, b, nv = tree.S, swt.sw.b, swt.sw.nv
        V = (np.asarray(r.x).reshape(S, 4, b)[:, :, :nv]
             .reshape(-1).astype(np.float64))

        class _R:
            obj = float(0.5 * V @ joint.H @ V + fo @ V)
            found = bool(r.found)
            nodes_solved = int(r.nodes_solved)
        return _R, orc

    families["di_tree_stagewise_S2"] = dict(
        model=omega_di, w=default_weights(), N=4, x0=x0_di,
        instances=4, solve=_tree_stagewise)

    def _pooled_batch(n_inst):
        """Pooled multi-instance driver (solver/bnb_pooled.py): one
        global node pool over the batch — per-instance incumbents must
        match the oracle exactly like the per-instance driver's."""
        from pyhybridcontrol_tpu.solver.bnb_pooled import (
            solve_miqp_bnb_pooled)

        model = switched_double_integrator()
        c = CondensedMpc(model, 8, default_weights())
        qp, admm = c.device_qp(), prepare_admm_mpc(c)
        probe = prepare_admm_mpc(c, rho=10.0)
        x0s = np.stack([x0_di().astype(np.float32)
                        for _ in range(n_inst)])
        f, h = jax.vmap(qp.assemble)(jnp.asarray(x0s))
        r = solve_miqp_bnb_pooled(
            admm, qp, f, h,
            BnbSpec(capacity=256, wave_size=32, qp_iters=400,
                    probe_iters=2000, max_waves=256),
            pool_slots=1024, admm_probe=probe)
        rows = []
        for i in range(n_inst):
            fo, ho = c.assemble_np(x0s[i])
            orc = solve_miqp_enumeration_oracle(
                c.H, fo, c.G, ho, c.lb, c.ub, c.binary_idx)

            class _R:
                obj = float(r.obj[i])
                found = bool(r.found[i])
                nodes_solved = int(r.nodes_solved)
            rows.append((x0s[i], _R, orc))
        return rows

    families["di_pooled_N8"] = dict(
        model=None, w=None, N=8, x0=x0_di, instances=6,
        batch_solve=_pooled_batch)

    def _pooled_tree_batch(n_inst):
        """Dense-joint scenario trees through the POOLED driver
        (solver/bnb_pooled.py ``branch_map`` rep-map branching, round
        5): a batch of tree MIQPs in ONE global pool — one branching
        decision fixes every member copy of an information set — vs the
        fp64 enumeration oracle on each joint problem."""
        from pyhybridcontrol_tpu.control.mpc import MpcController

        tree = _tree_instance()
        ctrl = MpcController(omega_di, 4, default_weights())
        ctrl.set_scenario_tree(tree)
        ctrl.bnb_spec = BnbSpec(capacity=512, wave_size=32,
                                qp_iters=600, probe_iters=3000,
                                max_waves=48)
        x0s = np.stack([x0_di().astype(np.float32)
                        for _ in range(n_inst)])
        res = ctrl.feedback_batch(jnp.asarray(x0s), engine="pooled",
                                  pooled_wave=128, pool_slots=1024)
        joint = build_scenario_tree_qp(
            CondensedMpc(omega_di, 4, default_weights()), tree)
        W = np.asarray(tree.omega_paths, np.float64).reshape(8, 1)
        rows = []
        for i in range(n_inst):
            fo, ho = joint.assemble_np(x0s[i], W)
            orc = solve_miqp_enumeration_oracle(
                joint.H, fo, joint.G, ho, joint.lb, joint.ub,
                joint.binary_idx)

            class _R:
                obj = float(res.obj[i])
                found = bool(res.found[i])
                nodes_solved = int(res.nodes[i])
            rows.append((x0s[i], _R, orc))
        return rows

    families["di_tree_pooled_S2"] = dict(
        model=None, w=None, N=4, x0=x0_di, instances=3,
        batch_solve=_pooled_tree_batch)

    def _stagewise_parallel(x0, _pq):
        """Stagewise B&B with the log-depth associative-scan K sweeps
        (parallel_sweeps=True) vs the condensed-frame oracle. The
        stagewise objective carries an x0 constant the condensed frame
        drops, so the device plan is re-costed in the oracle's frame."""
        from pyhybridcontrol_tpu.ops.stagewise import (
            assemble_stagewise, prepare_stagewise)
        from pyhybridcontrol_tpu.solver.bnb_stagewise import (
            solve_miqp_bnb_stagewise)

        model = switched_double_integrator()
        w, N = default_weights(), 8
        sw = prepare_stagewise(model, N, w)
        swp = prepare_stagewise(model, N, w, rho=10.0)
        q, l, u = assemble_stagewise(sw, jnp.asarray(x0))
        sspec = BnbSpec(capacity=256, wave_size=32, qp_iters=400,
                        probe_iters=2000, max_waves=48)
        r = solve_miqp_bnb_stagewise(sw, q, l, u, sspec, sw_probe=swp,
                                     parallel_sweeps=True)
        c = CondensedMpc(model, N, w)
        fo, ho = c.assemble_np(x0)
        orc = solve_miqp_enumeration_oracle(
            c.H, fo, c.G, ho, c.lb, c.ub, c.binary_idx)
        v = (np.asarray(r.x).reshape(N, sw.b)[:, :sw.nv]
             .reshape(-1).astype(np.float64))

        class _R:
            obj = float(0.5 * v @ c.H @ v + fo @ v)
            found = bool(r.found)
            nodes_solved = int(r.nodes_solved)
        return _R, orc

    families["di_stagewise_parallel_N8"] = dict(
        model=None, w=None, N=8, x0=x0_di, instances=4,
        solve=_stagewise_parallel)

    def _stagewise_extra(x0, _pq):
        """Horizon-coupled extra row (input budget) in the stagewise
        frame — the round-4 rank-r bordered Woodbury x-update
        (ops/stagewise.py::_solve_K_bordered) — vs the condensed-frame
        oracle with the same row. The budget is set per instance to
        0.2 below the UNCONSTRAINED optimum's input sum, so the row
        BINDS on every draw; the device plan is re-costed in the
        oracle's frame (x0-constant difference)."""
        from pyhybridcontrol_tpu.ops.stagewise import (
            assemble_stagewise, assemble_stagewise_ext,
            prepare_stagewise)
        from pyhybridcontrol_tpu.solver.bnb_stagewise import (
            solve_miqp_bnb_stagewise)

        model = switched_double_integrator()
        w, N = default_weights(), 8
        nv = model.info.nv
        c0 = CondensedMpc(model, N, w)
        fo0, ho0 = c0.assemble_np(x0)
        orc0 = solve_miqp_enumeration_oracle(
            c0.H, fo0, c0.G, ho0, c0.lb, c0.ub, c0.binary_idx)
        A_v = np.zeros((1, N * nv))
        A_v[0, 0::nv] = 1.0
        cap = float(A_v[0] @ orc0.x) - 0.2
        b_e = np.array([cap])

        sw = prepare_stagewise(model, N, w, extra=(A_v, b_e))
        swp = prepare_stagewise(model, N, w, rho=10.0,
                                extra=(A_v, b_e))
        q, l, u = assemble_stagewise(sw, jnp.asarray(x0))
        ue = assemble_stagewise_ext(sw, jnp.asarray(x0))
        sspec = BnbSpec(capacity=256, wave_size=32, qp_iters=400,
                        probe_iters=2000, max_waves=48)
        r = solve_miqp_bnb_stagewise(sw, q, l, u, sspec, sw_probe=swp,
                                     ext_u=ue)
        c = CondensedMpc(model, N, w).with_extra_constraints(A_v, b_e)
        fo, ho = c.assemble_np(x0)
        orc = solve_miqp_enumeration_oracle(
            c.H, fo, c.G, ho, c.lb, c.ub, c.binary_idx)
        v = (np.asarray(r.x).reshape(N, sw.b)[:, :sw.nv]
             .reshape(-1).astype(np.float64))

        class _R:
            obj = float(0.5 * v @ c.H @ v + fo @ v)
            found = bool(r.found)
            nodes_solved = int(r.nodes_solved)
        return _R, orc

    families["di_extra_budget_N8"] = dict(
        model=None, w=None, N=8, x0=x0_di, instances=4,
        solve=_stagewise_extra)

    def _tree_extra(x0, _pq):
        """Extra rows x scenario trees in the stagewise frame (round 4
        — per-scenario budget, shared bordered factors batched over
        scenarios) vs the fp64 oracle on the dense joint problem with
        the row block-replicated per scenario. The budget is set 0.2
        below the tightest scenario's unconstrained input sum so it
        BINDS; the device plan is re-costed in the joint frame."""
        from pyhybridcontrol_tpu.ops.stagewise_tree import (
            assemble_stagewise_tree, assemble_stagewise_tree_ext,
            prepare_stagewise_tree, solve_tree_miqp_stagewise)

        tree = _tree_instance()
        N, nv = 4, omega_di.info.nv
        c1 = CondensedMpc(omega_di, N, default_weights())
        joint0 = build_scenario_tree_qp(c1, tree)
        W = np.asarray(tree.omega_paths, np.float64).reshape(8, 1)
        fo0, ho0 = joint0.assemble_np(x0, W)
        orc0 = solve_miqp_enumeration_oracle(
            joint0.H, fo0, joint0.G, ho0, joint0.lb, joint0.ub,
            joint0.binary_idx)
        A_v = np.zeros((1, N * nv))
        A_v[0, 0::nv] = 1.0
        S = tree.S
        Vs0 = orc0.x.reshape(S, -1)
        cap = min(float(A_v[0] @ Vs0[s]) for s in range(S)) - 0.2
        b_e = np.array([cap])
        A_joint = np.zeros((S, S * N * nv))
        for s in range(S):
            A_joint[s, s * N * nv:(s + 1) * N * nv] = A_v[0]
        joint = joint0.with_extra_constraints(A_joint,
                                              np.repeat(b_e, S))
        fo, ho = joint.assemble_np(x0, W)
        orc = solve_miqp_enumeration_oracle(
            joint.H, fo, joint.G, ho, joint.lb, joint.ub,
            joint.binary_idx)

        swt = prepare_stagewise_tree(omega_di, tree, default_weights(),
                                     extra=(A_v, b_e))
        swt_p = prepare_stagewise_tree(omega_di, tree,
                                       default_weights(), rho=10.0,
                                       extra=(A_v, b_e))
        q, l, u = assemble_stagewise_tree(swt, jnp.asarray(x0))
        ue = assemble_stagewise_tree_ext(swt, jnp.asarray(x0))
        tspec = BnbSpec(capacity=512, wave_size=32, qp_iters=600,
                        probe_iters=3000, max_waves=48)
        r = solve_tree_miqp_stagewise(swt, q, l, u, tspec,
                                      swt_probe=swt_p, ext_u=ue)
        b = swt.sw.b
        V = (np.asarray(r.x).reshape(S, N, b)[:, :, :nv]
             .reshape(-1).astype(np.float64))

        class _R:
            obj = float(0.5 * V @ joint.H @ V + fo @ V)
            found = bool(r.found)
            nodes_solved = int(r.nodes_solved)
        return _R, orc

    families["di_tree_extra_S2"] = dict(
        model=omega_di, w=default_weights(), N=4, x0=x0_di,
        instances=4, solve=_tree_extra)

    # per-family worst-margin ceilings (VERDICT round-1 item 9):
    # non-degenerate families must sit well inside the global rel-tol
    # so one numerics regression cannot silently eat the whole margin.
    MARGINS = {
        "double_integrator_N8": 5e-4,
        "di_pooled_N8": 5e-4,
        "di_stagewise_parallel_N8": 1e-3,   # ADMM-iterate re-costing
        "di_extra_budget_N8": 1e-3,         # ADMM-iterate re-costing
        # di_tree_extra_S2 keeps the global tol (joint-tree re-costing)
        "pwa_hull_N3": 5e-4,
        "battery_N6": 5e-4,
        "di_moveblock_N8": 5e-4,
        "di_block_soft_N8": 1e-3,
        "di_softbox_N8": 1e-3,
        "dewh_N6": 1e-3,        # binary state aux rows
        # degenerate big-M leaves / joint trees keep the global tol
    }

    if args.families is not None:
        keep = {s.strip() for s in args.families.split(",")}
        unknown = keep - set(families)
        if unknown:
            sys.exit(f"unknown families: {sorted(unknown)}")
        families = {k: v for k, v in families.items() if k in keep}

    report = {}
    worst = 0.0
    worst_by_family = {}
    failures = 0
    for name, fam in families.items():
        model, w, N = fam["model"], fam["w"], fam["N"]
        n_inst = fam.get("instances", args.instances)
        fspec = fam.get("spec", spec)
        margin = MARGINS.get(name, args.rel_tol)
        batch_hook = fam.get("batch_solve")
        solve_hook = fam.get("solve")
        if batch_hook is None and solve_hook is None:
            c = CondensedMpc(model, N, w)
            if fam.get("transform") is not None:
                c = fam["transform"](c)
            qp, admm = c.device_qp(), prepare_admm_mpc(c)
            # rollout repair is full-v-frame-only: binary-state models
            # (nxb>0) append aux columns, so the controller gates it
            # (control/mpc.py) and the sweep must too
            rspec = (prepare_repair(model, w)
                     if fam.get("repair", True) and model.info.nxb == 0
                     else None)
        price = fam.get("price")
        rows = []
        batch_rows = batch_hook(n_inst) if batch_hook is not None else None
        for t in range(n_inst):
            if batch_rows is not None:
                x0, r, orc = batch_rows[t]
            else:
                x0 = fam["x0"]().astype(np.float32)
            pq = (price(N).astype(np.float32)
                  if price is not None else None)
            if batch_rows is not None:
                pass
            elif solve_hook is not None:
                r, orc = solve_hook(x0, pq)
            else:
                f, h = qp.assemble(jnp.asarray(x0),
                                   price_seq=None if pq is None
                                   else jnp.asarray(pq))
                seed = None
                if rspec is not None:
                    seed = root_repair_incumbent(
                        admm, qp, rspec, jnp.asarray(x0), f, h,
                        price_seq=None if pq is None else jnp.asarray(pq),
                        qp_iters=400)
                r = solve_miqp_bnb(admm, qp, f, h, fspec,
                                   init_incumbent=seed)
                fo, ho = c.assemble_np(
                    x0, price_seq=None if pq is None
                    else np.asarray(pq, np.float64))
                orc = solve_miqp_enumeration_oracle(
                    c.H, fo, c.G, ho, c.lb, c.ub, c.binary_idx)
            dev_found = bool(r.found)
            if orc.status == "optimal" and dev_found:
                rel = abs(float(r.obj) - orc.obj) / max(1.0, abs(orc.obj))
                # one-sided under-report gate, scale-aware (round 5): a
                # feasible plan cannot beat the optimum, so obj below
                # orc is bounded by the family's documented tolerance —
                # for RE-COSTED families a feas_tol-feasible plan
                # under-runs by ~dual·residual, which SCALES with the
                # instance (measured: a |obj|=1675 draw under-ran by
                # 5.4e-4 rel = 0.91 abs, legitimately inside the
                # family's 1e-3 re-costing ceiling while failing the
                # old absolute 5e-3 gate, which at that scale demanded
                # 3e-6-relative plan accuracy — far beyond the engine's
                # feas_tol=1e-3 acceptance semantics).
                ok = (rel <= margin
                      and float(r.obj) >= orc.obj
                      - max(5e-3, margin * abs(orc.obj)))
            else:
                rel = None
                ok = (orc.status != "optimal") == (not dev_found)
            worst = max(worst, rel or 0.0)
            worst_by_family[name] = max(worst_by_family.get(name, 0.0),
                                        rel or 0.0)
            failures += 0 if ok else 1
            rows.append(dict(x0=[float(v) for v in x0],
                             device_obj=float(r.obj) if dev_found else None,
                             oracle_obj=(orc.obj if orc.status == "optimal"
                                         else None),
                             oracle_status=orc.status,
                             rel_delta=rel, ok=bool(ok),
                             nodes=int(r.nodes_solved)))
            print(f"{name} [{t}]: dev="
                  f"{float(r.obj) if dev_found else None} oracle="
                  f"{orc.obj if orc.status=='optimal' else orc.status} "
                  f"rel={rel} {'OK' if ok else 'FAIL'}", flush=True)
        report[name] = rows

    n_total = sum(len(v) for v in report.values())
    if args.families is not None:
        print(f"\n[subset run] {n_total} instances; worst "
              f"{worst:.2e}; failures {failures} (report NOT written)")
        return 0 if failures == 0 else 1
    with open(os.path.join(_repo, "PARITY_REPORT.json"), "w") as fp:
        json.dump(dict(rel_tol=args.rel_tol, worst_rel_delta=worst,
                       margins={k: MARGINS.get(k, args.rel_tol)
                                for k in report},
                       worst_by_family=worst_by_family,
                       instances=n_total,
                       failures=failures, families=report), fp, indent=2)
    print(f"\n{n_total} instances; worst rel delta {worst:.2e}; "
          f"failures {failures}")
    for k, v in worst_by_family.items():
        print(f"  {k}: worst {v:.2e} (margin "
              f"{MARGINS.get(k, args.rel_tol):.0e})")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
