from adsr_tpu.utils.profiling import StepTimer, trace
from adsr_tpu.utils.image import histogram_equalization, min_max_scaling

__all__ = ["StepTimer", "trace", "histogram_equalization", "min_max_scaling"]
