"""N-camera rig: per-camera extrinsics + geometry + pairwise FOV overlap masks.

TPU-native re-design of the reference NCameraSystem
(/root/reference/okvis_cv/include/okvis/cameras/NCameraSystem.hpp:162,
src/NCameraSystem.cpp:50-124): camera specs are static; intrinsics and
extrinsics are stacked jnp arrays (so per-camera work batches with vmap).
The overlap computation is the ref's per-pixel ray-casting, vectorized: one
batched backproject → rotate-at-infinity → project per camera pair instead of
a double pixel loop.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kinematics import SE3, compose, inverse, quat_rotate
from . import pinhole
from .pinhole import CameraSpec


@dataclasses.dataclass
class NCameraSystem:
    """Camera rig. specs are static; T_SC / intrinsics are arrays.

    T_SC[i] maps camera-i coordinates into the IMU/sensor frame S.
    """

    specs: Tuple[CameraSpec, ...]
    T_SC: SE3  # batched: r (N,3), q (N,4)
    intrinsics: List[jnp.ndarray]  # per camera (4+K_i,) — K varies by model
    overlaps: np.ndarray = None  # (N, N) bool, computed by compute_overlaps
    overlap_mats: list = None  # [seen_by][cam] -> (H, W) bool or None

    @property
    def num_cameras(self) -> int:
        return len(self.specs)

    def camera_T_SC(self, i: int) -> SE3:
        return SE3(r=self.T_SC.r[i], q=self.T_SC.q[i])

    def has_overlap(self, cam_a: int, cam_b: int) -> bool:
        if self.overlaps is None:
            return False
        return bool(self.overlaps[cam_a][cam_b])

    def compute_overlaps(self, stride: int = 8) -> None:
        """Pairwise FOV overlap via vectorized ray casting
        (ref NCameraSystem::computeOverlaps, src/NCameraSystem.cpp:50-124).

        For every pixel of camera `cam` (subsampled by `stride` then
        upsampled — the mask is only used for a coarse gating decision),
        backproject, rotate the ray into the other camera (point at
        infinity: rotation only), project, and verify via a backprojection
        ray-consistency check.
        """
        n = self.num_cameras
        self.overlaps = np.zeros((n, n), dtype=bool)
        self.overlap_mats = [[None] * n for _ in range(n)]
        for seen_by in range(n):
            for cam in range(n):
                spec = self.specs[cam]
                if seen_by == cam:
                    self.overlaps[seen_by][cam] = True
                    self.overlap_mats[seen_by][cam] = np.ones(
                        (spec.height, spec.width), dtype=bool
                    )
                    continue
                other = self.specs[seen_by]
                T_Co_C = compose(inverse(self.camera_T_SC(seen_by)), self.camera_T_SC(cam))
                us = jnp.arange(0, spec.width, stride, dtype=jnp.float32)
                vs = jnp.arange(0, spec.height, stride, dtype=jnp.float32)
                uu, vv = jnp.meshgrid(us, vs)
                uv = jnp.stack([uu.ravel(), vv.ravel()], axis=-1)
                bp = jax.vmap(lambda p: pinhole.back_project(spec, self.intrinsics[cam], p))
                rays = bp(uv)
                rays_o = quat_rotate(T_Co_C.q[None, :], rays)
                proj = jax.vmap(lambda p: pinhole.project(other, self.intrinsics[seen_by], p))
                uv_o, flags = proj(rays_o)
                ok = flags == pinhole.STATUS_OK
                # verification ray consistency (guards distortion-model artifacts)
                ver = jax.vmap(
                    lambda p: pinhole.back_project(other, self.intrinsics[seen_by], p)
                )(uv_o)
                a = rays_o / jnp.linalg.norm(rays_o, axis=-1, keepdims=True)
                b = ver / jnp.linalg.norm(ver, axis=-1, keepdims=True)
                ok = ok & (jnp.abs(jnp.sum(a * b, axis=-1) - 1.0) < 1e-6)
                mask_small = np.asarray(ok).reshape(len(vs), len(us))
                mask = np.kron(mask_small, np.ones((stride, stride), dtype=bool))
                mask = mask[: spec.height, : spec.width]
                self.overlap_mats[seen_by][cam] = mask
                self.overlaps[seen_by][cam] = bool(mask_small.any())


def make_stereo_rig(
    specs: Sequence[CameraSpec],
    T_SC_list: Sequence[SE3],
    intrinsics_list: Sequence[jnp.ndarray],
    compute_overlaps: bool = True,
) -> NCameraSystem:
    r = jnp.stack([T.r for T in T_SC_list])
    q = jnp.stack([T.q for T in T_SC_list])
    rig = NCameraSystem(
        specs=tuple(specs),
        T_SC=SE3(r=r, q=q),
        intrinsics=[jnp.asarray(i) for i in intrinsics_list],
    )
    if compute_overlaps:
        rig.compute_overlaps()
    return rig
