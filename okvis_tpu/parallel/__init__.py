"""Distributed BA over a jax device mesh (new capability vs reference — SURVEY §2.14)."""

from .sharded_ba import (  # noqa: F401
    make_mesh,
    make_mesh2d,
    make_sharded_optimizer,
    problem_specs,
    shard_problem,
)
