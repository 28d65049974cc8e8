from tpu_pillars.utils.logging import JsonlLogger
from tpu_pillars.utils.profiling import StageTimer, trace

__all__ = ["JsonlLogger", "StageTimer", "trace"]
