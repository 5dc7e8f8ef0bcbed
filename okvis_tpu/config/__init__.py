"""Config system (TPU equivalent of okvis_common parameters + YAML reader)."""

from .parameters import (  # noqa: F401
    CameraConfig,
    CameraParams,
    ImuConfig,
    OptimizationConfig,
    PublishingConfig,
    VioParameters,
)
from .yaml_reader import build_imu_params, build_rig, read_config  # noqa: F401
