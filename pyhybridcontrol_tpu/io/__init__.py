from pyhybridcontrol_tpu.io.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from pyhybridcontrol_tpu.io.logging import StructuredLog

__all__ = ["save_checkpoint", "load_checkpoint", "StructuredLog"]
