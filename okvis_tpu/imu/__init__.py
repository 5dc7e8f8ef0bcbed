"""IMU preintegration/propagation (TPU equivalent of reference ImuError math)."""

from .preintegration import (  # noqa: F401
    ImuParams,
    PreintegratedImu,
    gravity_vector,
    init_pose_from_imu,
    preintegrate,
    propagate,
)
