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
    """One camera's detections in a multiframe.

    uv/mask host mirrors are cached (one joint fetch, ideally populated by
    the detection stage in its own thread) — on accelerators behind a
    network transport every ad-hoc np.asarray of a device array is a
    round trip, and the association path reads these arrays many times."""

    keypoints: Keypoints  # uv (K,2), score (K,), mask (K,)
    descriptors: jnp.ndarray  # (K, 16) uint32
    landmark_ids: np.ndarray  # (K,) int64 host array; 0 = none
    image: Optional[jnp.ndarray] = None  # (H, W) retained for visualization
    sizes: Optional[np.ndarray] = None  # (K,) keypoint size (octave-scaled)
    _uv_np: Optional[np.ndarray] = None
    _mask_np: Optional[np.ndarray] = None

    def _fetch_host(self) -> None:
        import jax

        from ..utils import syncstats

        syncstats.bump("frame_mirror")
        uv, mask = jax.device_get((self.keypoints.uv, self.keypoints.mask))
        self._uv_np = np.asarray(uv)
        self._mask_np = np.asarray(mask, bool)

    @property
    def uv_np(self) -> np.ndarray:
        if self._uv_np is None:
            self._fetch_host()
        return self._uv_np

    @property
    def mask_np(self) -> np.ndarray:
        if self._mask_np is None:
            self._fetch_host()
        return self._mask_np

    def set_host_mirrors(self, uv: np.ndarray, mask: np.ndarray) -> None:
        self._uv_np = np.asarray(uv)
        self._mask_np = np.asarray(mask, bool)

    def keypoint_size(self, k: int) -> float:
        return float(self.sizes[k]) if self.sizes is not None else 8.0

    @property
    def num_keypoints(self) -> int:
        return int(self.mask_np.sum())


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
