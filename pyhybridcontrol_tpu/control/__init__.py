from pyhybridcontrol_tpu.control.mpc import MpcController

__all__ = ["MpcController"]
