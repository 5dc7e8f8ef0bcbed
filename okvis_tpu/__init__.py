"""okvis_tpu — TPU-native keyframe-based visual-inertial SLAM.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ethz-asl/okvis (Leutenegger et al., IJRR 2015): N-camera + IMU sliding-window
bundle adjustment with keyframe marginalization, BRISK-style feature
detection/matching, and a host-side async pipeline — redesigned TPU-first:

- All per-frame estimation work (IMU preintegration, residual/Jacobian
  evaluation, Schur-complement BA, marginalization) is fixed-shape, masked,
  jitted XLA — one retrace-free program per step.
- Feature matching rides the MXU (Hamming distance as a ±1 bit-vector matmul)
  with a Pallas XOR+popcount kernel as the bandwidth-optimal alternative.
- The sliding window scales across devices by sharding landmarks/observations
  over a `jax.sharding.Mesh` with `psum`-reduced Hessians (see
  `okvis_tpu.parallel`).

Layer map (mirrors reference /root/reference layering, SURVEY.md §1):
  utils       — time, timing registry, ids          (okvis_util/time/timing)
  kinematics  — batched SE(3)/quaternion math       (okvis_kinematics)
  cameras     — pinhole + distortion models, rigs   (okvis_cv)
  imu         — preintegration/propagation          (okvis_ceres ImuError math)
  factors     — residual+Jacobian evaluation        (okvis_ceres error terms)
  solver      — Schur/dogleg sliding-window BA      (replaces Ceres)
  estimator   — sliding-window state machine        (okvis_ceres Estimator)
  frontend    — detection/description/matching/RANSAC (okvis_frontend + BRISK + OpenGV)
  ops         — Pallas TPU kernels
  parallel    — device mesh / sharded BA
  pipeline    — async host pipeline                 (okvis_multisensor_processing)
  config      — parameters + YAML reader            (okvis_common)
  datasets    — EuRoC ASL loader                    (okvis_apps)
  eval        — trajectory / ATE evaluation
"""

__version__ = "0.1.0"
