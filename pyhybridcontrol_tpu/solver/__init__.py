from pyhybridcontrol_tpu.solver.oracle import (
    OracleResult,
    solve_qp_oracle,
    solve_miqp_enumeration_oracle,
)
from pyhybridcontrol_tpu.solver.enumerate import solve_miqp_enumerate_device
from pyhybridcontrol_tpu.solver.bnb import BnbSpec, BnbResult, solve_miqp_bnb

__all__ = [
    "OracleResult",
    "solve_qp_oracle",
    "solve_miqp_enumeration_oracle",
    "solve_miqp_enumerate_device",
    "BnbSpec",
    "BnbResult",
    "solve_miqp_bnb",
]
