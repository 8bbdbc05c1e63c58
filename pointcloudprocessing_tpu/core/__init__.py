from pointcloudprocessing_tpu.core import constants
from pointcloudprocessing_tpu.core.config import (
    LearningConfig,
    NoiseConfig,
    TrainableConfig,
    LossWeights,
    StageConfig,
    TrainConfig,
    load_config,
)

__all__ = [
    "constants",
    "LearningConfig",
    "NoiseConfig",
    "TrainableConfig",
    "LossWeights",
    "StageConfig",
    "TrainConfig",
    "load_config",
]
