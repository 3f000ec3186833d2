from pyhybridcontrol_tpu.loop.closed_loop import (
    ClosedLoopResult,
    closed_loop,
    make_mpc_step,
)

__all__ = ["ClosedLoopResult", "closed_loop", "make_mpc_step"]
