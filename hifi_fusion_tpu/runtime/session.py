"""FusionSession: the host runtime / control plane.

The live-service equivalent of the reference node's subscriber + services +
worker threads (survey §2 C2/C3/C9/C10; FUSION.cpp:99-169, 327-440), with
the same externally observable contract:

* ``start()`` / ``stop()``   — gate frame *ingestion* (in-flight frames
                               still drain; FUSION.cpp:361-375).
* ``reset()``                — stop + drop the raw input queue; the grid and
                               processed frames survive, exactly like the
                               reference (FUSION.cpp:351-359).  Pass
                               ``full=True`` for the fixed semantics (also
                               clears the grid — what reset *should* do).
* ``process()``              — drain-wait, export PCD + metadata CSV to the
                               output directory, then clear the grid
                               (snapshot-and-destroy; FUSION.cpp:377-440).
* ``push_frame(frame,pose)`` — the subscriber callback.  A ``pose_provider``
                               may be attached instead; if it raises, the
                               frame is dropped with a warning — the
                               reference's TF-exception contract
                               (FUSION.cpp:340-344).

Architecture differences (deliberate, TPU-first): the reference runs three
free-running mutex-guarded threads over two deques with 1 s sleep-polls.
Here one worker drains a bounded drop-oldest deque (the ROS queue=100
backpressure made explicit, FUSION.cpp:152) and calls the jitted fusion
step; JAX async dispatch overlaps host decode of frame N+1 with device
compute of frame N, and refinement is fused into the step on a frame
cadence — no grid mutex, no wall-clock races, deterministic results.
"""

from __future__ import annotations

import collections
import logging
import os
import threading
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FusionConfig
from ..grid import GridState
from ..io import downloads
from ..models.pipeline import FusionPipeline
from ..utils.profiling import StageTimers, annotate
from .decode import CloudFrame, decode_frame
from .sources import Source

log = logging.getLogger("hifi_fusion_tpu")

PoseProvider = Callable[[CloudFrame], np.ndarray]


class FusionSession:
    def __init__(self, config: FusionConfig,
                 output_dir: str = ".",
                 queue_depth: int = 100,
                 pose_provider: Optional[PoseProvider] = None,
                 final_refine: bool = True,
                 n_devices: int = 1,
                 route: bool = False):
        """``n_devices > 1`` runs the slab-sharded pipeline over a device
        mesh (parallel/sharding.py) behind the identical session contract;
        ``route=True`` additionally routes points to owner slabs over ICI
        instead of replicating frames.  The global config is then allowed
        to exceed single-chip caps (it is validated per-shard)."""
        if n_devices > 1:
            from ..parallel.sharding import ShardedPipeline
            self.pipeline = ShardedPipeline(config, n_devices=n_devices,
                                            route=route)
            self.config = config             # per-shard validation inside
        else:
            self.config = config.validate()
            self.pipeline = FusionPipeline(config)
        self.output_dir = output_dir
        self.pose_provider = pose_provider
        self.final_refine = final_refine

        self._queue = collections.deque(maxlen=queue_depth)
        self._qlock = threading.Lock()
        self._glock = threading.Lock()
        self._wake = threading.Event()
        self._shutdown = False
        self._started = False
        self._busy = False

        self._grid: GridState = self.pipeline.init()
        self._jrays = None          # device-resident rays (depth ingest)
        self.timers = StageTimers()
        self._frames_in = 0
        self._frames_integrated = 0
        self._frames_dropped = 0
        self._pose_failures = 0
        self._points_truncated = 0   # points cut from frames > max_points
        self._frames_truncated = 0
        self._t_first = None
        self._t_last = None

        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="fusion-worker")
        self._worker.start()

    # ------------------------------------------------------------------
    # control plane (Trigger-service equivalents)
    # ------------------------------------------------------------------
    def start(self) -> None:
        log.info("START")
        self._started = True

    def stop(self) -> None:
        log.info("STOP")
        self._started = False

    def reset(self, full: bool = False) -> None:
        """Reference parity: stop + clear *input* queue only
        (FUSION.cpp:351-359). ``full=True`` additionally clears the grid."""
        log.info("RESET full=%s", full)
        self._started = False
        with self._qlock:
            self._queue.clear()
        if full:
            self.drain()
            with self._glock:
                self._grid = self.pipeline.init()

    def process(self, cloud_name: str = "test_cloud.pcd",
                meta_name: str = "meta.csv",
                ascii_mode: bool = True,
                drain_timeout: float = 300.0,
                variants: Tuple[str, ...] = ()) -> Dict:
        """Drain, export the fused cloud + metadata, clear the grid.

        Ingestion is gated while draining — the reference self-quiesces
        because its drain blocks the spinner thread (FUSION.cpp:379-394);
        here a live pusher could otherwise starve the drain forever.
        Raises ``TimeoutError`` if the queue cannot drain: exporting a
        mid-stream grid would silently violate the snapshot contract.

        The cloud format follows the file extension: ``.pcd`` (reference
        default) or ``.ply``.  ``variants`` optionally writes additional
        clouds next to the main one — the reference's other download*
        entry points (OccupancyGrid.hpp:491-601): ``"hq"`` (count >=
        good_points_threshold), ``"classified"`` (quality-colored),
        ``"xyzrgb"``, ``"normals"``.
        """
        was_started = self._started
        self._started = False
        try:
            if not self.drain(timeout=drain_timeout):
                raise TimeoutError(
                    f"process(): input queue failed to drain within "
                    f"{drain_timeout}s; refusing to export a mid-stream "
                    f"grid")
            os.makedirs(self.output_dir, exist_ok=True)
            cloud_path = os.path.join(self.output_dir, cloud_name)
            meta_path = os.path.join(self.output_dir, meta_name)
            with self._glock:
                grid = self._grid
                if self.final_refine:
                    grid = self.pipeline.refine(grid)
                    # refine donated the old buffers; repoint _grid NOW so
                    # a failure below cannot leave it on deleted buffers
                    self._grid = grid
                host = self.pipeline.extract_host(grid)
                if cloud_path.endswith(".ply"):
                    from ..io import ply
                    ply.write_ply(cloud_path, host["centroid"], host["rgb"],
                                  host["normal"], ascii_mode=ascii_mode)
                    from ..io import pcd as _pcd
                    _pcd.write_metadata_csv(meta_path, host["sd"],
                                            host["mean_dist"],
                                            host["sd_dist"], host["count"])
                    n = int(host["centroid"].shape[0])
                else:
                    n = downloads.download_data(host, cloud_path, meta_path,
                                                ascii_mode=ascii_mode)
                variant_paths = self._write_variants(
                    host, cloud_path, variants, ascii_mode)
                metrics = self.pipeline.grid_metrics(grid)
                # snapshot-and-destroy, but leak-free by construction
                # (vs OccupancyGrid::clearVoxels ghost leak, GRID.hpp:167-183)
                self._grid = self.pipeline.init()
        finally:
            self._started = was_started
        log.info("PROCESS: %d voxels -> %s", n, cloud_path)
        return {"cloud": cloud_path, "metadata": meta_path, "n_points": n,
                "variants": variant_paths, "grid_metrics": metrics}

    def _write_variants(self, host, cloud_path: str, variants,
                        ascii_mode: bool) -> Dict[str, str]:
        """Write the reference's extra download* views next to the main
        cloud (OccupancyGrid.hpp:491-601)."""
        from ..io import pcd as _pcd
        stem = cloud_path.rsplit(".", 1)[0]
        out: Dict[str, str] = {}
        for v in variants:
            path = f"{stem}_{v}.pcd"
            if v == "hq":
                d = downloads.download_hq(host, self.config)
                _pcd.write_pcd_xyzrgbnormal(path, d["xyz"], d["rgb"],
                                            d["normal"],
                                            ascii_mode=ascii_mode)
            elif v == "classified":
                d = downloads.download_classified(host, self.config)
                _pcd.write_pcd_xyzrgb(path, d["xyz"], d["rgb"],
                                      ascii_mode=ascii_mode)
            elif v == "xyzrgb":
                d = downloads.download_xyz(host)
                _pcd.write_pcd_xyzrgb(path, d["xyz"], d["rgb"],
                                      ascii_mode=ascii_mode)
            elif v == "normals":
                d = downloads.download_with_normals(host)
                _pcd.write_pcd_xyzrgbnormal(path, d["xyz"], d["rgb"],
                                            d["normal"],
                                            ascii_mode=ascii_mode)
            else:
                raise ValueError(f"unknown export variant {v!r} (expected "
                                 f"hq/classified/xyzrgb/normals)")
            out[v] = path
        return out

    # ------------------------------------------------------------------
    # ingestion
    # ------------------------------------------------------------------
    def push_frame(self, frame: CloudFrame,
                   pose: Optional[np.ndarray] = None) -> bool:
        """Subscriber callback. Returns False if gated or pose lookup failed."""
        self._frames_in += 1
        if not self._started:
            return False
        if pose is None:
            if self.pose_provider is None:
                raise ValueError("no pose given and no pose_provider set")
            try:
                pose = self.pose_provider(frame)
            except Exception as e:   # drop-and-warn (FUSION.cpp:340-344)
                self._pose_failures += 1
                log.warning("pose lookup failed, dropping frame: %s", e)
                return False
        with self._qlock:
            if len(self._queue) == self._queue.maxlen:
                self._frames_dropped += 1
            self._queue.append((frame, np.asarray(pose)))
        self._wake.set()
        return True

    def push_depth_frame(self, depth_q: np.ndarray, rgb565: np.ndarray,
                         pose: np.ndarray, rays: np.ndarray = None) -> bool:
        """Sensor-native ingest: u16 z-depth image + rgb565 + camera pose.

        ``rays`` is the scaled pinhole ray table (3,N) f32
        (utils/synthetic.camera_rays); it is uploaded ONCE on first use
        and must stay fixed for the session (one camera).  4 B/pixel on
        the wire vs 25 planar — the production live-capture path.
        Single-device sessions only (the sharded pipeline routes planar
        world-space points; unproject on host for that path).
        """
        self._frames_in += 1
        if not self._started:
            return False
        if rays is not None and self._jrays is None:
            import jax.numpy as jnp
            self._jrays = jnp.asarray(np.asarray(rays, np.float32))
        if self._jrays is None:
            raise ValueError("push_depth_frame needs rays on first call")
        if not hasattr(self.pipeline, "step_depth"):
            raise NotImplementedError(
                "depth ingest is single-device only; unproject on host "
                "and use push_frame for sharded sessions")
        with self._qlock:
            if len(self._queue) == self._queue.maxlen:
                self._frames_dropped += 1
            self._queue.append((("depth",
                                 np.asarray(depth_q, np.uint16),
                                 np.asarray(rgb565, np.uint16)),
                                np.asarray(pose)))
        self._wake.set()
        return True

    def run_source(self, source: Source, auto_start: bool = True) -> None:
        """Feed an entire source through the session (replay mode)."""
        if auto_start:
            self.start()
        for frame, pose in source:
            self.push_frame(frame, pose)
        self.drain()

    # ------------------------------------------------------------------
    # worker
    # ------------------------------------------------------------------
    def _run(self) -> None:
        cfg = self.config
        while not self._shutdown:
            item = None
            with self._qlock:
                if self._queue:
                    item = self._queue.popleft()
                    self._busy = True
            if item is None:
                self._busy = False
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue
            frame, pose = item
            try:
                if isinstance(frame, tuple) and frame[0] == "depth":
                    # sensor-native path: no host decode, the device
                    # unprojects against the resident ray table
                    _, dq, r565 = frame
                    n = min(dq.shape[0], cfg.max_points)
                    with self.timers.stage("device_step"), annotate("step"):
                        with self._glock:
                            self._grid = self.pipeline.step_depth(
                                self._grid, jnp.asarray(dq[:n]),
                                jnp.asarray(r565[:n]),
                                jnp.asarray(np.int32(n)),
                                jnp.asarray(pose, jnp.float32),
                                self._jrays)
                    now = time.monotonic()
                    if self._t_first is None:
                        self._t_first = now
                    self._t_last = now
                    self._frames_integrated += 1
                    continue
                with self.timers.stage("decode"), annotate("decode"):
                    xyz, rgb = decode_frame(
                        frame, blue_shift_bug=cfg.bug_compat_blue_shift)
                    n = min(xyz.shape[0], cfg.max_points)
                    if xyz.shape[0] > n:
                        # surfaced in metrics() — every other drop path has
                        # a counter, so this one must too (VERDICT r1 #6)
                        self._points_truncated += xyz.shape[0] - n
                        self._frames_truncated += 1
                        log.warning(
                            "frame has %d points > max_points=%d; "
                            "truncating (%d dropped)", xyz.shape[0],
                            cfg.max_points, xyz.shape[0] - n)
                    # planar (3, N_max) device layout (see ops/geometry.py)
                    pts_p = np.zeros((3, cfg.max_points), np.float32)
                    rgb_p = np.zeros((3, cfg.max_points), np.float32)
                    pts_p[:, :n] = xyz[:n].T
                    rgb_p[:, :n] = rgb[:n].T
                    mask = np.zeros(cfg.max_points, bool)
                    mask[:n] = True
                with self.timers.stage("device_step"), annotate("step"):
                    with self._glock:
                        self._grid = self.pipeline.step(
                            self._grid, jnp.asarray(pts_p),
                            jnp.asarray(rgb_p), jnp.asarray(mask),
                            jnp.asarray(pose, jnp.float32))
                now = time.monotonic()
                if self._t_first is None:
                    self._t_first = now
                self._t_last = now
                self._frames_integrated += 1
            except Exception:
                log.exception("frame integration failed; frame dropped")
            finally:
                self._busy = False

    def drain(self, timeout: float = 300.0) -> bool:
        """Block until the input queue is empty and the worker is idle
        (the reference's drain-wait in getFusedCloud, FUSION.cpp:379-394 —
        without the 1 s sleep-polls)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._qlock:
                empty = not self._queue
            if empty and not self._busy:
                # ensure the last dispatched device step finished
                with self._glock:
                    jax.block_until_ready(self._grid.frames)
                return True
            time.sleep(0.002)
        return False

    # ------------------------------------------------------------------
    # observability / checkpoint (survey §5.4, §5.5)
    # ------------------------------------------------------------------
    def metrics(self) -> Dict:
        with self._glock:
            m = self.pipeline.grid_metrics(self._grid)
        dt = ((self._t_last - self._t_first)
              if (self._t_first is not None
                  and self._t_last is not None
                  and self._t_last > self._t_first) else None)
        m.update({
            "frames_received": self._frames_in,
            "frames_integrated": self._frames_integrated,
            "frames_dropped_backpressure": self._frames_dropped,
            "pose_failures": self._pose_failures,
            "frames_truncated": self._frames_truncated,
            "points_truncated": self._points_truncated,
            "frames_per_s": ((self._frames_integrated - 1) / dt
                             if dt else None),
            "stage_timers": self.timers.report(),
        })
        return m

    def save_state(self, path: str) -> None:
        """Checkpoint the grid (absent in the reference — its only snapshot
        is the destructive ``process``; survey §5.4)."""
        self.drain()
        with self._glock:
            arrays = {f: np.asarray(getattr(self._grid, f))
                      for f in self._grid._fields}
        np.savez_compressed(path, **arrays)

    def load_state(self, path: str) -> None:
        z = np.load(path)
        state = GridState(**{f: z[f] for f in GridState._fields})
        with self._glock:
            self._grid = self.pipeline.put_state(state)

    def close(self) -> None:
        self._shutdown = True
        self._wake.set()
        self._worker.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
