from pyhybridcontrol_tpu.models.double_integrator import (
    switched_double_integrator,
    default_weights as di_default_weights,
)

__all__ = ["switched_double_integrator", "di_default_weights"]
