from pyhybridcontrol_tpu.mld.info import MldInfo, VarTypes
from pyhybridcontrol_tpu.mld.model import MldModel
from pyhybridcontrol_tpu.mld.pwa import PwaSystem, PwaRegion, pwa_to_mld
from pyhybridcontrol_tpu.mld.symbolic import MldTemplate, from_sympy

__all__ = [
    "MldInfo",
    "VarTypes",
    "MldModel",
    "PwaSystem",
    "PwaRegion",
    "pwa_to_mld",
    "MldTemplate",
    "from_sympy",
]
