from pyhybridcontrol_tpu.parallel.mesh import make_mesh, scenario_sharding
from pyhybridcontrol_tpu.parallel.sharded_bnb import solve_miqp_bnb_sharded

__all__ = ["make_mesh", "scenario_sharding", "solve_miqp_bnb_sharded"]
