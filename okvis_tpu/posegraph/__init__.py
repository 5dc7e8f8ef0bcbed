"""Pose-graph / loop-closure layer (new capability per BASELINE.json).

The reference release has no loop closure (SURVEY.md §6: "There is no loop
closure / pose graph / relocalization in this release"); BASELINE.json names
a pose-graph layer handling keyframe culling and loop constraints as a
required new capability. This package provides it, TPU-first:

- ``graph``: padded host-side pose-graph container (SoA numpy, id<->slot maps)
- ``optimize``: jitted SE(3) pose-graph solver — batched edge residuals,
  Gauss-Newton matvec via jvp/vjp (no materialized Jacobian), block-Jacobi
  preconditioned CG, Levenberg-Marquardt trust region, one XLA program
- ``place_recognition``: brute-force binary-descriptor keyframe retrieval as
  one MXU Hamming matmul per query (replaces a BoW vocabulary tree)
- ``loop_closure``: geometric verification (descriptor matching + 3D-2D
  RANSAC) producing a relative-pose loop constraint
- ``manager``: orchestration — odometry edges, loop detection, optimization,
  drift correction, redundant-keyframe culling with edge composition
"""

from . import graph, loop_closure, manager, optimize, place_recognition  # noqa: F401
