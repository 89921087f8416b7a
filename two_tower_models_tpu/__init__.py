"""TPU-native two-tower retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gauravchak/two_tower_models: the full model zoo (base retrieval, user-history
encoder, position/user/combined debiasing, light ranker, knowledge
distillation, ranker-as-reward-model), exact MIPS retrieval, and a complete
systems layer the reference lacks — device-mesh sharding with explicit
collectives, fused Pallas kernels, checkpointing, metrics, and benchmarks.
"""

__version__ = "0.1.0"

from two_tower_models_tpu.config import (
    DataConfig,
    Debias,
    ExperimentConfig,
    HistoryEncoderConfig,
    LightRankerConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    preset,
    PRESET_NAMES,
)
from two_tower_models_tpu.models.two_tower import Batch

__all__ = [
    "Batch",
    "DataConfig",
    "Debias",
    "ExperimentConfig",
    "HistoryEncoderConfig",
    "LightRankerConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "preset",
    "PRESET_NAMES",
    "__version__",
]
