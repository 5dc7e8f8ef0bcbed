"""EuRoC MAV dataset loader (ASL format).

TPU equivalent of the reference CLI data driver
(/root/reference/okvis_apps/src/okvis_app_synchronous.cpp:238-366): iterates
`mav0/cam*/data/*.png` (filenames are nanosecond timestamps) and
`mav0/imu0/data.csv`, yielding measurements in timestamp order — the input
protocol of the pipeline. Also reads the ground-truth state CSV for ATE
evaluation.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

NS = 1_000_000_000


@dataclasses.dataclass
class ImuSample:
    timestamp_ns: int
    gyro: np.ndarray  # (3,)
    acc: np.ndarray  # (3,)


_native_decode = None


def _get_native_decode():
    """Native libpng decoder (okvis_tpu.native), or None without a toolchain."""
    global _native_decode
    if _native_decode is None:
        try:
            from ..native import decode_png_gray, get_lib

            get_lib()
            _native_decode = decode_png_gray
        except Exception:
            _native_decode = False
    return _native_decode or None


@dataclasses.dataclass
class ImageEvent:
    timestamp_ns: int
    cam_idx: int
    path: str
    width: int = 752
    height: int = 480

    def load(self) -> np.ndarray:
        dec = _get_native_decode()
        if dec is not None:
            try:
                return dec(self.path, self.height, self.width)
            except IOError:
                pass  # size mismatch etc. — fall back to PIL
        from PIL import Image

        img = np.asarray(Image.open(self.path).convert("L"), dtype=np.float32)
        return img


class EurocDataset:
    """Lazy iterator over an extracted EuRoC sequence directory (…/mav0)."""

    def __init__(self, mav0_dir: str, num_cameras: int = 2, skip_sec: float = 0.0):
        self.dir = mav0_dir
        self.num_cameras = num_cameras
        self.imu: List[ImuSample] = self._load_imu()
        self.images: List[ImageEvent] = self._scan_images()
        if skip_sec > 0 and self.images:
            t0 = self.images[0].timestamp_ns + int(skip_sec * NS)
            self.images = [e for e in self.images if e.timestamp_ns >= t0]

    def _load_imu(self) -> List[ImuSample]:
        path = os.path.join(self.dir, "imu0", "data.csv")
        out = []
        with open(path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                v = line.strip().split(",")
                out.append(
                    ImuSample(
                        timestamp_ns=int(v[0]),
                        gyro=np.asarray([float(v[1]), float(v[2]), float(v[3])]),
                        acc=np.asarray([float(v[4]), float(v[5]), float(v[6])]),
                    )
                )
        return out

    def _scan_images(self) -> List[ImageEvent]:
        events = []
        for cam in range(self.num_cameras):
            d = os.path.join(self.dir, f"cam{cam}", "data")
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if not name.endswith(".png"):
                    continue
                events.append(
                    ImageEvent(
                        timestamp_ns=int(name[:-4]),
                        cam_idx=cam,
                        path=os.path.join(d, name),
                    )
                )
        events.sort(key=lambda e: (e.timestamp_ns, e.cam_idx))
        return events

    def imu_arrays(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        ts = np.asarray([s.timestamp_ns for s in self.imu], dtype=np.int64)
        gyro = np.stack([s.gyro for s in self.imu])
        acc = np.stack([s.acc for s in self.imu])
        return ts, gyro, acc

    def ground_truth(self) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """(ts_ns, positions (N,3), quaternions xyzw (N,4)) from
        state_groundtruth_estimate0, or None if absent."""
        path = os.path.join(
            self.dir, "state_groundtruth_estimate0", "data.csv"
        )
        if not os.path.exists(path):
            return None
        ts, ps, qs = [], [], []
        with open(path) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                v = line.strip().split(",")
                ts.append(int(v[0]))
                ps.append([float(v[1]), float(v[2]), float(v[3])])
                # EuRoC GT quaternions are w,x,y,z -> store xyzw
                qs.append([float(v[5]), float(v[6]), float(v[7]), float(v[4])])
        return np.asarray(ts, np.int64), np.asarray(ps), np.asarray(qs)

    def measurements(self) -> Iterator[object]:
        """All measurements in global timestamp order (ref app main loop)."""
        merged: List[object] = list(self.imu) + list(self.images)
        merged.sort(key=lambda m: m.timestamp_ns)
        return iter(merged)
