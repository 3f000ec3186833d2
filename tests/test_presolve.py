"""Root presolve (ops/presolve.py): interval bound tightening + big-M
coefficient tightening must preserve the MIQP exactly (binary slices
unchanged) while only ever tightening bounds/relaxations."""

import jax.numpy as jnp
import numpy as np

from pyhybridcontrol_tpu.models.battery import (
    BatteryParams, battery_model, battery_price_seq, battery_weights)
from pyhybridcontrol_tpu.models.pwa_examples import (
    pwa_spring_mld, pwa_weights)
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.solver.oracle import solve_miqp_enumeration_oracle


def _oracle(c, x0, pq=None):
    fo, ho = c.assemble_np(x0, price_seq=pq)
    return solve_miqp_enumeration_oracle(c.H, fo, c.G, ho, c.lb, c.ub,
                                         c.binary_idx)


def test_presolve_miqp_invariant_pwa():
    c0 = CondensedMpc(pwa_spring_mld(on_off=True), 2, pwa_weights())
    c1 = c0.with_root_presolve()
    # layout unchanged
    assert c1.G.shape == c0.G.shape and len(c1.lb) == len(c0.lb)
    # formally-unbounded big-M auxiliaries got finite boxes
    n_unb0 = int(np.sum(~np.isfinite(c0.lb)) + np.sum(~np.isfinite(c0.ub)))
    n_unb1 = int(np.sum(~np.isfinite(c1.lb)) + np.sum(~np.isfinite(c1.ub)))
    assert n_unb1 < n_unb0
    # only tightening
    assert np.all(c1.lb >= c0.lb - 1e-12) and np.all(c1.ub <= c0.ub + 1e-12)
    rng = np.random.default_rng(0)
    for _ in range(2):
        x0 = rng.uniform(-2, 2, size=2)
        o0, o1 = _oracle(c0, x0), _oracle(c1, x0)
        assert o0.status == o1.status
        if o0.status == "optimal":
            np.testing.assert_allclose(o0.obj, o1.obj, rtol=1e-6,
                                       atol=1e-6)


def test_presolve_miqp_invariant_battery():
    p = BatteryParams()
    m = battery_model(p)
    c0 = CondensedMpc(m, 4, battery_weights(q_soc=2.0))
    c1 = c0.with_root_presolve()
    pq = battery_price_seq(np.full(4, 0.1), p,
                           nv=m.info.nv).astype(np.float64)
    rng = np.random.default_rng(1)
    for _ in range(3):
        x0 = np.array([rng.uniform(0.2, 0.8)])
        o0 = _oracle(c0, x0, pq)
        o1 = _oracle(c1, x0, pq)
        assert o0.status == o1.status == "optimal"
        np.testing.assert_allclose(o0.obj, o1.obj, rtol=1e-6, atol=1e-6)
