"""Datasets: EuRoC ASL loader + synthetic world generator."""

from .euroc import EurocDataset, ImageEvent, ImuSample  # noqa: F401
from .synthetic import (  # noqa: F401
    SyntheticImu,
    build_ba_problem,
    euroc_stereo_rig,
    make_landmarks,
    simulate_trajectory,
)
