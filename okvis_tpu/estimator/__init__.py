"""Sliding-window estimator (TPU equivalent of okvis::Estimator)."""

from .estimator import Estimator, LandmarkRecord, Observation, StateRecord  # noqa: F401
from .marginalization import MargResult, marginalize_system, pinv_sym  # noqa: F401
