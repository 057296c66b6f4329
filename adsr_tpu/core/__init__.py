from adsr_tpu.core.config import (
    DataConfig,
    DRCTModelConfig,
    DRNModelConfig,
    EfficientADModelConfig,
    Experiment,
    MeshConfig,
    OptimConfig,
    drct_experiment,
    drn_experiment,
)
from adsr_tpu.core.mesh import make_mesh
from adsr_tpu.core import prng

__all__ = [
    "DataConfig", "DRCTModelConfig", "DRNModelConfig", "EfficientADModelConfig",
    "Experiment", "MeshConfig", "OptimConfig",
    "drct_experiment", "drn_experiment", "make_mesh", "prng",
]
