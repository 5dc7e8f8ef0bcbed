"""Sliding-window BA solver (TPU replacement for Ceres SPARSE_SCHUR+DOGLEG)."""

from .assemble import NormalEqs, evaluate, marg_delta_chi  # noqa: F401
from .optimize import (  # noqa: F401
    SolveDiagnostics,
    apply_update,
    dense_dim_mask,
    optimize_window,
    optimize_windows_batched,
    solve_normal_eqs,
)
from .structure import (  # noqa: F401
    BaProblem,
    ExtLinks,
    ImuLinks,
    MargPrior,
    Observations,
    PosePriors,
    SbPriors,
    WindowConfig,
    WindowStates,
    empty_problem,
)
