"""Frame / MultiFrame containers: fixed-capacity SoA keypoint storage.

TPU-native redesign of the reference Frame/MultiFrame
(/root/reference/okvis_cv/include/okvis/Frame.hpp:204, MultiFrame.hpp:62-278):
instead of cv::KeyPoint vectors, every camera's keypoints live in padded
arrays (uv, score, packed descriptors, validity mask) of capacity
`max_keypoints`, plus a host-side landmark-id array (0 = unassociated) — so
all matching/gating work stays batched and retrace-free.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..frontend.detection import Keypoints


@dataclasses.dataclass
class FrameData:
    """One camera's detections in a multiframe."""

    keypoints: Keypoints  # uv (K,2), score (K,), mask (K,)
    descriptors: jnp.ndarray  # (K, 16) uint32
    landmark_ids: np.ndarray  # (K,) int64 host array; 0 = none
    image: Optional[jnp.ndarray] = None  # (H, W) retained for visualization
    sizes: Optional[np.ndarray] = None  # (K,) keypoint size (octave-scaled)

    def keypoint_size(self, k: int) -> float:
        return float(self.sizes[k]) if self.sizes is not None else 8.0

    @property
    def num_keypoints(self) -> int:
        return int(np.asarray(self.keypoints.mask).sum())


@dataclasses.dataclass
class MultiFrame:
    """Synchronized bundle of per-camera frames (ref MultiFrame)."""

    id: int
    timestamp: float  # seconds
    frames: List[FrameData]

    @property
    def num_cameras(self) -> int:
        return len(self.frames)

    def landmark_id(self, cam: int, k: int) -> int:
        return int(self.frames[cam].landmark_ids[k])

    def set_landmark_id(self, cam: int, k: int, lm_id: int) -> None:
        self.frames[cam].landmark_ids[k] = lm_id

    def keypoint(self, cam: int, k: int) -> np.ndarray:
        return np.asarray(self.frames[cam].keypoints.uv[k])
