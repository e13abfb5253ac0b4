"""Synthetic eye-in-hand sweep generation for tests and benchmarks.

Stands in for the RealSense RGBD stream + TF poses the reference consumes
(launch:3 remap to /camera/depth/color/points; FUSION.cpp:327-349): a wavy
surface patch is sampled in the fusion frame, and each frame observes a
shifted window of it from a camera pose whose z-distance sits inside the
reference clip window (0.28, 0.6) m.

Camera-frame points are produced by applying the *inverse* pose in float64,
so device/oracle f32 forward transforms land within ~1e-7 m of the intended
world-frame samples — keeping parity tests away from voxel-boundary razor
edges (sample jitter is bounded away from cell walls).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

from ..config import FusionConfig


@dataclasses.dataclass
class Frame:
    points_cam: np.ndarray  # (N,3) f32
    rgb: np.ndarray         # (N,3) f32
    pose: np.ndarray        # (4,4) f32 fusion_T_camera
    mask: np.ndarray        # (N,)  bool


def _look_down_pose(cx: float, cy: float, cz: float) -> np.ndarray:
    """Camera at (cx,cy,cz) looking along -z of the fusion frame."""
    pose = np.eye(4, dtype=np.float64)
    pose[:3, :3] = np.asarray([[1.0, 0.0, 0.0],
                               [0.0, -1.0, 0.0],
                               [0.0, 0.0, -1.0]])
    pose[:3, 3] = [cx, cy, cz]
    return pose


def make_sweep(config: FusionConfig,
               n_frames: int,
               points_per_frame: int,
               seed: int = 0,
               noise_sd: float = 3e-4,
               surface_frac: float = 0.5,
               camera_height: float = 0.4) -> List[Frame]:
    """Generate a sweep over a wavy surface z = z0 + a*sin*cos patch."""
    rng = np.random.default_rng(seed)
    b = config.bbox
    xr = (b[1] - b[0]) * surface_frac
    yr = (b[3] - b[2]) * surface_frac
    x0 = (b[0] + b[1]) / 2 - xr / 2
    y0 = (b[2] + b[3]) / 2 - yr / 2
    z0 = b[4] + 0.35 * (b[5] - b[4])
    amp = 0.06 * (b[5] - b[4])

    frames = []
    for f in range(n_frames):
        # a sliding window over the surface (eye-in-hand sweep)
        u = rng.random(points_per_frame)
        v = rng.random(points_per_frame)
        wx = x0 + xr * (0.25 + 0.5 * f / max(n_frames - 1, 1)
                        ) + 0.25 * xr * (u - 0.5) * 2
        wy = y0 + yr * (0.5 + 0.45 * (v - 0.5) * 2)
        wz = (z0 + amp * np.sin(7.0 * wx) * np.cos(5.0 * wy)
              + rng.normal(0.0, noise_sd, points_per_frame))
        world = np.stack([wx, wy, wz], axis=-1)

        cx = np.mean(wx)
        cy = np.mean(wy)
        pose = _look_down_pose(cx, cy, z0 + camera_height)
        inv = np.linalg.inv(pose)
        pts_cam = (world @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

        rgb = rng.integers(0, 256, (points_per_frame, 3)).astype(np.float32)
        frames.append(Frame(
            points_cam=pts_cam,
            rgb=rgb,
            pose=pose.astype(np.float32),
            mask=np.ones(points_per_frame, bool),
        ))
    return frames


@dataclasses.dataclass
class PackedFrame:
    """Wire-format frame: 10 B/point instead of pad_frame's 25 B/point.

    The reference ingests PointCloud2 messages whose rgb field is already
    a packed u32-in-float (FUSION.cpp:170-216); real depth cameras emit
    u16 depth.  This is the equivalent compact ingest format for the TPU
    pipeline: the device frontend dequantizes/unpacks (ops/integrate.py),
    so host->device transfer shrinks 2.5x — on bandwidth-starved links
    (the axon tunnel measures ~37 MB/s) that is the difference between
    transfer-bound and compute-bound.
    """
    points_q: np.ndarray   # (3,N) u16 quantized camera-frame points
    quant: np.ndarray      # (2,3) f32: [scale, offset] per axis
    rgb_u32: np.ndarray    # (N,)  u32 packed 0xRRGGBB
    count: int             # number of valid points (prefix)
    pose: np.ndarray       # (4,4) f32
    points_f32: np.ndarray  # (3,N) f32 dequantized points (oracle/parity
    #                         side — EXACTLY what the device reconstructs)


def pack_frame_q16(frame: Frame, n_max: int) -> PackedFrame:
    """Quantize a frame to the u16 wire format, bit-reproducibly.

    Per-axis scale is a POWER OF TWO >= range/65535, so on both host and
    device the dequantization ``q * scale + offset`` rounds identically
    (q*scale is exact — q < 2^16, scale a power of two — so mul+add and a
    fused multiply-add produce the same f32); ``points_f32`` is that
    dequantization, the values every consumer (device, oracle, tests)
    must agree on.
    """
    n = frame.points_cam.shape[0]
    if n > n_max:
        raise ValueError(f"frame has {n} points > max_points {n_max}")
    pts = frame.points_cam.astype(np.float32)      # (N,3)
    lo = pts.min(axis=0)
    rng = pts.max(axis=0) - lo
    # scale = 2^ceil(log2(range/65535)); degenerate axes get scale 2^-24
    exp = np.where(rng > 0, np.ceil(np.log2(np.maximum(rng, 1e-30)
                                            / 65535.0)), -24.0)
    scale = np.exp2(exp).astype(np.float32)
    offset = lo.astype(np.float32)
    q = np.clip(np.rint((pts - offset) / scale), 0, 65535).astype(np.uint16)
    pq = np.zeros((3, n_max), np.uint16)
    pq[:, :n] = q.T
    # dequantize the PADDED array so points_f32 matches the device lane-
    # for-lane (padding lanes dequantize to the offset; masked anyway)
    pf = pq.astype(np.float32) * scale[:, None] + offset[:, None]
    r = frame.rgb.astype(np.uint32)
    rgb_u32 = np.zeros((n_max,), np.uint32)
    rgb_u32[:n] = (r[:, 0] << 16) | (r[:, 1] << 8) | r[:, 2]
    return PackedFrame(
        points_q=pq,
        quant=np.stack([scale, offset]).astype(np.float32),
        rgb_u32=rgb_u32,
        count=n,
        pose=frame.pose.astype(np.float32),
        points_f32=pf,
    )


@dataclasses.dataclass
class DepthFrame:
    """Sensor-native wire format: 4 B/pixel (u16 z-depth + rgb565).

    This is what a RealSense-class RGBD camera actually emits (Z16 +
    RGB565 stream formats) — the reference consumes the same stream
    after ROS inflates it to 16-32 B/point PointCloud2 (FUSION.cpp:
    182-216, launch:3).  Ingesting the sensor format directly makes the
    wire cost 640x480x4 B = 1.23 MB/frame; at the axon tunnel's measured
    ~37 MB/s that is ~33 ms/frame — exactly the 30 Hz sensor cadence —
    where the planar f32 format (25 B/pt) costs ~200 ms/frame.

    Unprojection happens on device: ``pc = depth_u16.astype(f32) *
    srays`` where ``srays = ray_dir * depth_scale`` is a device-resident
    (3,N) f32 constant (uploaded once per session).  ``points_f32`` is
    the identical host-side computation — the canonical values every
    consumer (device, oracles, tests) must agree on bit-for-bit.
    """
    depth_q: np.ndarray    # (N,) u16 z-depth in units of depth_scale
    rgb565: np.ndarray     # (N,) u16 packed 5:6:5 color
    pose: np.ndarray       # (4,4) f32 fusion_T_camera
    count: int             # valid prefix length (== N for organized frames)
    points_f32: np.ndarray  # (3,N) f32 canonical camera-frame points


# depth units: 2^-16 m (15.26 um); u16 range covers 1.0 m — beyond the
# reference's 0.6 m camera-z clip (FUSION.cpp:92-93).  A power of two
# keeps ``q * (ray*scale)`` a single exactly-reproducible f32 multiply.
DEPTH_SCALE = 2.0 ** -16


def camera_rays(width: int = 640, height: int = 480,
                fx: float = 500.0, fy: float = 500.0,
                scale: float = DEPTH_SCALE) -> np.ndarray:
    """(3, width*height) f32 scaled pinhole rays: ``srays[:, i] =
    ((u-cx)/fx, (v-cy)/fy, 1) * scale`` — row-major pixel order.
    ``depth_q * srays`` unprojects a z-depth image in ONE f32 multiply."""
    cx, cy = (width - 1) / 2.0, (height - 1) / 2.0
    u = np.arange(width, dtype=np.float64)
    v = np.arange(height, dtype=np.float64)
    rx = np.broadcast_to((u - cx) / fx, (height, width))
    ry = np.broadcast_to(((v - cy) / fy)[:, None], (height, width))
    rays = np.stack([rx.ravel(), ry.ravel(),
                     np.ones(width * height)], axis=0)
    return (rays * scale).astype(np.float32)


def make_depth_sweep(config: FusionConfig,
                     n_frames: int,
                     width: int = 640,
                     height: int = 480,
                     seed: int = 0,
                     noise_sd: float = 3e-4,
                     surface_frac: float = 0.5,
                     camera_height: float = 0.4,
                     srays: np.ndarray = None,
                     arc_frames: int = None) -> List[DepthFrame]:
    """The make_sweep surface observed as ORGANIZED z-depth images.

    Each pixel's depth solves ``camera_z - z = surface(world(z))`` by
    fixed-point iteration in f64 (the surface slope along a ray is <~0.1,
    so 4 rounds converge far below the u16 quantum), then quantizes to
    u16.  ``points_f32`` is the canonical device dequantization
    ``depth_q.astype(f32) * srays``.

    ``arc_frames`` decouples sweep DENSITY from sweep LENGTH: pose spacing
    is the fixed arc divided by ``arc_frames`` (default ``n_frames``), so a
    time-boxed shorter sweep covers a prefix of the nominal-length sweep's
    arc at the SAME per-frame spacing instead of spreading the frames out
    (a sparse sweep sees far more fresh surface per refine cadence and blew
    the replay budgets that the nominal workload fits comfortably).
    """
    rng = np.random.default_rng(seed)
    if srays is None:
        srays = camera_rays(width, height)
    rays64 = srays.astype(np.float64) / DEPTH_SCALE      # unit-z rays
    b = config.bbox
    xr = (b[1] - b[0]) * surface_frac
    yr = (b[3] - b[2]) * surface_frac
    x0 = (b[0] + b[1]) / 2 - xr / 2
    y0 = (b[2] + b[3]) / 2
    z0 = b[4] + 0.35 * (b[5] - b[4])
    amp = 0.06 * (b[5] - b[4])
    n = width * height
    denom = max((arc_frames or n_frames) - 1, 1)

    frames = []
    for f in range(n_frames):
        cx = x0 + xr * (0.25 + 0.5 * f / denom)
        cy = y0
        cz = z0 + camera_height
        pose = _look_down_pose(cx, cy, cz)
        noise = rng.normal(0.0, noise_sd, n)
        z = np.full(n, camera_height)
        for _ in range(4):
            wx = cx + rays64[0] * z
            wy = cy - rays64[1] * z
            z = (cz - z0 - amp * np.sin(7.0 * wx) * np.cos(5.0 * wy)
                 - noise)
        depth_q = np.clip(np.rint(z / DEPTH_SCALE), 0, 65535).astype(
            np.uint16)
        pf = depth_q.astype(np.float32)[None, :] * srays    # (3,N)
        frames.append(DepthFrame(
            depth_q=depth_q,
            rgb565=rng.integers(0, 1 << 16, n).astype(np.uint16),
            pose=pose.astype(np.float32),
            count=n,
            points_f32=pf,
        ))
    return frames


def pad_frame(frame: Frame, n_max: int) -> Frame:
    """Pad a frame to the static lane budget with masked lanes and convert
    to the device-side planar layout: points_cam/rgb become (3, n_max)
    (component-major — see ops/geometry.py on TPU tiling)."""
    n = frame.points_cam.shape[0]
    if n > n_max:
        raise ValueError(f"frame has {n} points > max_points {n_max}")
    pts = np.zeros((3, n_max), np.float32)
    rgb = np.zeros((3, n_max), np.float32)
    mask = np.zeros(n_max, bool)
    pts[:, :n] = frame.points_cam.T
    rgb[:, :n] = frame.rgb.T
    mask[:n] = frame.mask
    return Frame(points_cam=pts, rgb=rgb, pose=frame.pose, mask=mask)
