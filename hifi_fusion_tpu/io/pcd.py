"""PCD / CSV export-import — host side of the extraction path.

The reference emits, from ``process``:

* an ASCII PCD of XYZRGBNormal points (cylinder-filtered centroid + normal,
  OccupancyGrid.hpp:456-488 via pcl::io::savePCDFileASCII), and
* a metadata CSV with header
  ``Id,sdx,sdy,sdz,mean distance from normal, distance from normal sd,
  points in cylinder`` (OccupancyGrid.hpp:462,478).

This module reproduces both formats (PCL-compatible PCD headers), adds a
binary PCD fast path and a reader for round-tripping in tests.  A C++
writer (runtime/native) accelerates the ASCII formatting when built; this
NumPy implementation is the always-available fallback and the format oracle.
"""

from __future__ import annotations

import io as _io
import os
from typing import Dict, Optional, Tuple

import numpy as np

_PCD_XYZ = ("x", "y", "z")
_PCD_NORMAL = ("normal_x", "normal_y", "normal_z")


def _pack_rgb_float(rgb: np.ndarray) -> np.ndarray:
    """(N,3) float 0-255 -> PCL packed-float rgb column.  A 1-D integer
    ``rgb`` is accepted as ALREADY-packed 0x00RRGGBB words (the device
    export lane, ops/extract.ExtractResult.rgb_packed — same clip ->
    truncate -> shift recipe, so the file bytes are identical)."""
    if rgb.ndim == 1:
        return np.ascontiguousarray(rgb, np.uint32).view(np.float32)
    r = np.clip(rgb[:, 0], 0, 255).astype(np.uint32)
    g = np.clip(rgb[:, 1], 0, 255).astype(np.uint32)
    b = np.clip(rgb[:, 2], 0, 255).astype(np.uint32)
    packed = (r << 16) | (g << 8) | b
    return packed.view(np.float32)


def _header(fields, sizes, types, counts, n, data_kind: str) -> str:
    return "\n".join([
        "# .PCD v0.7 - Point Cloud Data file format",
        "VERSION 0.7",
        "FIELDS " + " ".join(fields),
        "SIZE " + " ".join(str(s) for s in sizes),
        "TYPE " + " ".join(types),
        "COUNT " + " ".join(str(c) for c in counts),
        f"WIDTH {n}",
        "HEIGHT 1",
        "VIEWPOINT 0 0 0 1 0 0 0",
        f"POINTS {n}",
        f"DATA {data_kind}",
        "",
    ])


def write_pcd_xyzrgbnormal(path: str, xyz: np.ndarray, rgb: np.ndarray,
                           normal: np.ndarray, ascii_mode: bool = True
                           ) -> None:
    """PCL-layout PointXYZRGBNormal PCD (fields x y z rgb normal curvature)."""
    n = xyz.shape[0]
    fields = list(_PCD_XYZ) + ["rgb"] + list(_PCD_NORMAL) + ["curvature"]
    hdr = _header(fields, [4] * 8, ["F"] * 8, [1] * 8, n,
                  "ascii" if ascii_mode else "binary")
    cols = np.empty((n, 8), np.float32)
    cols[:, 0:3] = xyz.astype(np.float32)
    cols[:, 3] = _pack_rgb_float(rgb) if rgb is not None else 0.0
    cols[:, 4:7] = normal.astype(np.float32)
    cols[:, 7] = 0.0
    _write(path, hdr, cols, ascii_mode)


def write_pcd_xyzrgb(path: str, xyz: np.ndarray, rgb: np.ndarray,
                     ascii_mode: bool = True) -> None:
    n = xyz.shape[0]
    fields = list(_PCD_XYZ) + ["rgb"]
    hdr = _header(fields, [4] * 4, ["F"] * 4, [1] * 4, n,
                  "ascii" if ascii_mode else "binary")
    cols = np.empty((n, 4), np.float32)
    cols[:, 0:3] = xyz.astype(np.float32)
    cols[:, 3] = _pack_rgb_float(rgb) if rgb is not None else 0.0
    _write(path, hdr, cols, ascii_mode)


def _write(path: str, hdr: str, cols: np.ndarray, ascii_mode: bool) -> None:
    from ..runtime import native
    if ascii_mode:
        if native.available():
            native.write_pcd_ascii(path, hdr, cols)
            return
        with open(path, "w") as f:
            f.write(hdr)
            np.savetxt(f, cols, fmt="%.9g", delimiter=" ")
    else:
        with open(path, "wb") as f:
            f.write(hdr.encode())
            f.write(np.ascontiguousarray(cols, "<f4").tobytes())


def read_pcd(path: str) -> Tuple[Dict[str, np.ndarray], int]:
    """Minimal PCD reader (ascii/binary, float32 scalar fields only)."""
    with open(path, "rb") as f:
        raw = f.read()
    head_end = raw.find(b"DATA ")
    nl = raw.find(b"\n", head_end)
    header_txt = raw[:nl].decode()
    body = raw[nl + 1:]
    meta = {}
    for line in header_txt.splitlines():
        parts = line.split()
        if parts:
            meta[parts[0]] = parts[1:]
    fields = meta["FIELDS"]
    n = int(meta["POINTS"][0])
    kind = meta["DATA"][0]
    k = len(fields)
    if kind == "ascii":
        arr = np.loadtxt(_io.BytesIO(body), dtype=np.float32,
                         ndmin=2).reshape(n, k)
    else:
        arr = np.frombuffer(body, "<f4", count=n * k).reshape(n, k)
    return {f: arr[:, i].copy() for i, f in enumerate(fields)}, n


# CSV header text matches the reference's metadata file byte-for-byte
# (OccupancyGrid.hpp:462).
CSV_HEADER = ("Id,sdx,sdy,sdz,mean distance from normal,"
              " distance from normal sd, points in cylinder")


def write_metadata_csv(path: str, sd: np.ndarray, mean_dist: np.ndarray,
                       sd_dist: np.ndarray, count: np.ndarray) -> None:
    from ..runtime import native
    n = sd.shape[0]
    cols = np.empty((n, 5), np.float64)
    cols[:, 0:3] = sd
    cols[:, 3] = mean_dist
    cols[:, 4] = sd_dist
    if native.available():
        # float64 in both paths: the native writer formats doubles, so the
        # CSV is byte-identical whether or not libfusion_native is built.
        native.write_metadata_csv(path, CSV_HEADER, cols,
                                  count.astype(np.int64))
        return
    with open(path, "w") as f:
        f.write(CSV_HEADER + "\n")
        for i in range(n):
            f.write(f"{i},{cols[i,0]:.6g},{cols[i,1]:.6g},{cols[i,2]:.6g},"
                    f"{cols[i,3]:.6g},{cols[i,4]:.6g},{int(count[i])}\n")


def read_metadata_csv(path: str) -> Dict[str, np.ndarray]:
    data = np.genfromtxt(path, delimiter=",", skip_header=1, ndmin=2)
    return {
        "id": data[:, 0].astype(np.int64),
        "sd": data[:, 1:4],
        "mean_dist": data[:, 4],
        "sd_dist": data[:, 5],
        "count": data[:, 6].astype(np.int64),
    }
