from pyhybridcontrol_tpu.ops.condense import CondensedMpc, DeviceQP, MpcWeights
from pyhybridcontrol_tpu.ops.admm import (
    BoxQP,
    admm_solve,
    admm_solve_batch,
    prepare_admm,
)
from pyhybridcontrol_tpu.ops.pallas_admm import (
    admm_solve_auto,
    admm_solve_pallas,
    prepare_pallas,
)

__all__ = [
    "CondensedMpc",
    "DeviceQP",
    "MpcWeights",
    "BoxQP",
    "admm_solve",
    "admm_solve_auto",
    "admm_solve_batch",
    "admm_solve_pallas",
    "prepare_admm",
    "prepare_pallas",
]
