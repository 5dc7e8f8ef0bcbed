"""Shared test fixture builders (thin re-export of the library builder)."""

from okvis_tpu.datasets.synthetic import build_ba_problem


def build_synthetic_problem(*args, **kwargs):
    return build_ba_problem(*args, **kwargs)
