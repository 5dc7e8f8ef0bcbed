"""Trajectory evaluation (ATE) utilities."""

from .ate import associate, ate_rmse, umeyama_alignment, write_tum  # noqa: F401
