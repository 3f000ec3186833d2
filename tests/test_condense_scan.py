"""Device-side condensation (associative scan) vs host fp64 build, and
horizon-sharded condensation on the virtual mesh (SURVEY.md §2b
dist/condense_shard, §5 sequence-parallel analogue)."""

import jax
import jax.numpy as jnp
import numpy as np

from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator, default_weights)
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.ops.condense_scan import (
    affine_scan_rollout, condense_device, condense_horizon_sharded,
    matrix_power_scan)
from pyhybridcontrol_tpu.parallel import make_mesh


def test_matrix_power_scan(rng):
    A = jnp.asarray(rng.normal(size=(3, 3)) * 0.5, jnp.float32)
    pw = matrix_power_scan(A, 6)
    want = np.eye(3)
    for k in range(7):
        np.testing.assert_allclose(np.asarray(pw[k]), want, rtol=1e-4,
                                   atol=1e-5)
        want = want @ np.asarray(A, np.float64)


def test_affine_scan_matches_lsim(rng):
    model = switched_double_integrator()
    info = model.info
    N = 12
    x0 = jnp.asarray([1.5, -0.3])
    v = jnp.asarray(rng.uniform(-1, 1, size=(N, info.nv)), jnp.float32)
    xs_scan = affine_scan_rollout(model, x0, v)
    xs_seq, _ = model.lsim(x0, v)
    np.testing.assert_allclose(np.asarray(xs_scan), np.asarray(xs_seq[1:]),
                               rtol=1e-4, atol=1e-5)


def test_condense_device_matches_host():
    model = switched_double_integrator()
    N = 8
    c = CondensedMpc(model, N, default_weights())
    dev = jax.jit(lambda: condense_device(model, N))()
    for name in ("Phi", "Gv", "Gc", "Phi_t", "Gv_t", "Gc_t"):
        np.testing.assert_allclose(
            np.asarray(dev[name]), np.asarray(c.pred[name]),
            rtol=1e-4, atol=1e-5, err_msg=name)


def test_condense_device_vmap_over_models(rng):
    """Batched condensation over stacked model instances — the thing the
    host fp64 path cannot do."""
    from pyhybridcontrol_tpu.models.double_integrator import (
        switched_double_integrator as mk)

    models = [mk(Ts=ts) for ts in (0.3, 0.5, 0.7)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *models)
    out = jax.vmap(lambda m: condense_device(m, 6))(stacked)
    assert out["Gv"].shape[0] == 3
    solo = condense_device(models[1], 6)
    np.testing.assert_allclose(np.asarray(out["Gv"][1]),
                               np.asarray(solo["Gv"]), rtol=1e-5)


def test_condense_horizon_sharded_matches():
    model = switched_double_integrator()
    N = 8
    mesh = make_mesh([("hz", 4)])
    Phi_s, Gv_s = condense_horizon_sharded(model, N, mesh)
    dev = condense_device(model, N)
    np.testing.assert_allclose(np.asarray(Phi_s), np.asarray(dev["Phi"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Gv_s), np.asarray(dev["Gv"]),
                               rtol=1e-4, atol=1e-5)
