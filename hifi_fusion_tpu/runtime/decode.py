"""Sensor frame decoding: PointCloud2-style binary blobs -> planar arrays.

The ingest equivalent of the reference's decode thread
(pointCloud2ToPclXYZRGBOMP + splitRGBData, FUSION.cpp:170-216): RealSense
style streams deliver interleaved per-point records (x,y,z float32 + packed
rgb float) with a stride.  Here decoding is a planar strided copy —
C++/OpenMP when the native library is built, NumPy strided views otherwise —
and unlike the reference it handles organized clouds (height > 1) too; the
reference iterates a single row_step and silently drops all rows but the
first (FUSION.cpp:185-190).

The reference's blue-channel bug — packed rgb blue extracted with a shift of
1 instead of 0 (splitRGBData's {16,8,1} table, FUSION.cpp:174) — is fixed by
default and available behind ``blue_shift_bug=True`` for bit-compatibility
studies.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from . import native

# sensor_msgs/PointField datatype codes
FLOAT32 = 7


@dataclasses.dataclass
class PointField:
    name: str
    offset: int
    datatype: int = FLOAT32
    count: int = 1


@dataclasses.dataclass
class CloudFrame:
    """A PointCloud2-equivalent message (transport-agnostic)."""
    data: bytes
    point_step: int
    width: int
    height: int = 1
    fields: List[PointField] = dataclasses.field(default_factory=list)
    frame_id: str = "camera"
    stamp: float = 0.0

    @property
    def n_points(self) -> int:
        return self.width * self.height

    def field_offset(self, name: str) -> Optional[int]:
        for f in self.fields:
            if f.name == name:
                return f.offset
        return None


def make_cloud_frame(xyz: np.ndarray, rgb: Optional[np.ndarray] = None,
                     frame_id: str = "camera", stamp: float = 0.0
                     ) -> CloudFrame:
    """Encode planar arrays into an interleaved RealSense-style record
    (x,y,z,rgb-packed; 16-byte point_step) — used by replay sources/tests."""
    n = xyz.shape[0]
    rec = np.zeros((n, 4), np.float32)
    rec[:, 0:3] = xyz.astype(np.float32)
    fields = [PointField("x", 0), PointField("y", 4), PointField("z", 8)]
    if rgb is not None:
        r = np.clip(rgb[:, 0], 0, 255).astype(np.uint32)
        g = np.clip(rgb[:, 1], 0, 255).astype(np.uint32)
        b = np.clip(rgb[:, 2], 0, 255).astype(np.uint32)
        rec[:, 3] = ((r << 16) | (g << 8) | b).view(np.float32)
        fields.append(PointField("rgb", 12))
    return CloudFrame(data=rec.tobytes(), point_step=16, width=n,
                      fields=fields, frame_id=frame_id, stamp=stamp)


def decode_frame(frame: CloudFrame, blue_shift_bug: bool = False
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """CloudFrame -> ((N,3) f32 xyz, (N,3) f32 rgb in [0,255])."""
    off_x = frame.field_offset("x")
    off_y = frame.field_offset("y")
    off_z = frame.field_offset("z")
    off_rgb = frame.field_offset("rgb")
    if off_x is None or off_y is None or off_z is None:
        raise ValueError("cloud frame lacks x/y/z fields")
    n = frame.n_points
    if native.available():
        return native.decode_xyzrgb(
            frame.data, n, frame.point_step, off_x, off_y, off_z,
            -1 if off_rgb is None else off_rgb, blue_shift_bug)
    return _decode_numpy(frame, off_x, off_y, off_z, off_rgb,
                         blue_shift_bug)


def _decode_numpy(frame: CloudFrame, off_x: int, off_y: int, off_z: int,
                  off_rgb: Optional[int], blue_shift_bug: bool
                  ) -> Tuple[np.ndarray, np.ndarray]:
    n = frame.n_points
    raw = np.frombuffer(frame.data, np.uint8,
                        count=n * frame.point_step).reshape(n,
                                                            frame.point_step)

    def f32_at(off: int) -> np.ndarray:
        return raw[:, off:off + 4].copy().view(np.float32)[:, 0]

    xyz = np.stack([f32_at(off_x), f32_at(off_y), f32_at(off_z)],
                   axis=-1).astype(np.float32)
    rgb = np.zeros((n, 3), np.float32)
    if off_rgb is not None:
        packed = raw[:, off_rgb:off_rgb + 4].copy().view(np.uint32)[:, 0]
        blue_shift = 1 if blue_shift_bug else 0
        rgb[:, 0] = (packed >> 16) & 0xFF
        rgb[:, 1] = (packed >> 8) & 0xFF
        rgb[:, 2] = (packed >> blue_shift) & 0xFF
    return xyz, rgb
