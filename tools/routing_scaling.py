"""Measure the routed-ingest scaling claim on the virtual CPU mesh.

parallel/routing.py's design claim: routing points to owner slabs over an
all_to_all shrinks every per-device lane space to ~1/d of the frame
(throughput scaling), where the replicate path gives d chips ~dx capacity
at ~0x throughput.  Real multi-chip hardware is unavailable here (one
tunneled v5e chip), so this tool substantiates the claim with what IS
measurable (VERDICT r4 missing #5):

1. **Live per-device lane counts** — the host recomputes each frame's
   owner-slab targeting (same boundary arithmetic as routing.owner_of_x)
   and reports per-device live points (slab + halo band) for the routed
   path vs the full frame every device frontends under replication.
2. **Wall per dispatch on the 8-virtual-CPU mesh** — with all devices
   multiplexed onto ONE core, wall time measures TOTAL work across the
   mesh: replicated work is ~d x frame, routed is ~frame + d x halo, so
   the routed/replicated wall ratio directly exhibits the ~1/d per-device
   work shrink without needing d physical chips.
3. **A modeled v5e projection** from the measured single-chip cost
   (PERF.md §13: integrate 193.7 ms per K=8 batch at NA = 2.46M lanes,
   sort/scan-bound => ~linear in lanes) plus the all_to_all bytes over
   ICI.

Usage: python tools/routing_scaling.py   (pins the CPU backend itself)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

N_DEVS = tuple(int(x) for x in os.environ.get("ROUTE_DEVS",
                                              "4,8").split(","))
ROUNDS = int(os.environ.get("ROUTE_ROUNDS", 3))
# Frame size: 32768 keeps compiles CPU-tractable; larger values (e.g.
# 131072) make per-dispatch work dominate the mesh's fixed overheads so
# the routed/replicated wall ratio reflects lane-space work, not
# dispatch costs.
POINTS = int(os.environ.get("ROUTE_POINTS", 32768))


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
                    f"{max(N_DEVS)}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from hifi_fusion_tpu.config import FusionConfig
    from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep

    K = 2
    scale = max(POINTS // 32768, 1)
    cfg = FusionConfig(
        bbox=(-0.35, 0.35, -0.35, 0.35, 0.0, 0.4),
        resolution=(0.001, 0.001, 0.001),
        capacity_log2=17 + max(scale.bit_length() - 1, 0),
        max_points=POINTS,
        max_active_points=POINTS,
        buffer_capacity_log2=17 + max(scale.bit_length() - 1, 0),
        max_refine_candidates=(1 << 15) * scale,
        max_unique_per_frame=(1 << 14) * scale,
        max_hit_voxels=(1 << 14) * scale,
        max_replay_active=(1 << 15) * scale,
        max_replay_hits=(1 << 18) * scale,
        max_batch_frames=K,
        refine_every=K,
        z_clip=(0.28, 0.6),
        dep_width_tiers=(8,),
        refine_tiers=(((1 << 12) * scale, (1 << 14) * scale,
                       (1 << 13) * scale, (1 << 15) * scale),),
        replay_tiers=((1 << 10) * scale, (1 << 15) * scale),
    )
    width = 256
    height = POINTS // width
    rays = camera_rays(width, height, fx=360.0 * (height / 128) ** 0.5,
                       fy=360.0 * (height / 128) ** 0.5)
    frames = make_depth_sweep(cfg, 4, width=width, height=height,
                              srays=rays, seed=0, noise_sd=3e-4,
                              camera_height=0.4)

    # host-side owner targeting (same slab/halo arithmetic as
    # routing.owner_of_x) for the LIVE per-device lane counts
    def live_counts(n_dev, halo_cells):
        W = -(-cfg.global_x_cells // n_dev)       # slab width (ceil)
        res = np.float32(cfg.resolution[0])
        ox = np.float32(cfg.origin[0])
        per_dev = np.zeros(n_dev, np.int64)
        total = 0
        for f in frames:
            pts = f.points_f32
            pose = np.asarray(f.pose, np.float32)
            w = pose[:3, :3] @ pts + pose[:3, 3:4]
            zok = (pts[2] > cfg.z_clip[0]) & (pts[2] < cfg.z_clip[1])
            b = cfg.bbox
            inb = ((w[0] > b[0]) & (w[0] < b[1]) & (w[1] > b[2])
                   & (w[1] < b[3]) & (w[2] > b[4]) & (w[2] < b[5]))
            ok = zok & inb & (f.depth_q > 0)
            cx = np.floor((w[0][ok] - ox) / res).astype(np.int64)
            own = np.minimum(cx // W, n_dev - 1)
            total += ok.sum()
            for d in range(n_dev):
                lo, hi = d * W, (d + 1) * W
                per_dev[d] += int(((cx >= lo - halo_cells)
                                   & (cx < hi + halo_cells)).sum())
        return per_dev / len(frames), total / len(frames)

    results = []
    for n_dev in N_DEVS:
        from hifi_fusion_tpu.parallel.sharding import ShardedFusion
        row = {"n_dev": n_dev}
        for route in (False, True):
            sf = ShardedFusion(cfg, n_devices=n_dev, route=route)
            srays = sf.put_rays(rays)
            grid = sf.init()
            stacks = []
            for b in range(0, len(frames), K):
                fb = frames[b:b + K]
                stacks.append((
                    jnp.asarray(np.stack([f.depth_q for f in fb])),
                    jnp.asarray(np.stack([f.rgb565 for f in fb])),
                    jnp.asarray(np.asarray([f.count for f in fb],
                                           np.int32)),
                    jnp.asarray(np.stack([f.pose for f in fb]))))
            # warm (compile) on the first batch
            t0 = time.monotonic()
            grid = sf.step_batch_depth(grid, *stacks[0], srays)
            jax.block_until_ready(jax.tree_util.tree_leaves(grid)[0])
            compile_s = time.monotonic() - t0
            walls = []
            for r in range(ROUNDS):
                for s in stacks:
                    t0 = time.monotonic()
                    grid = sf.step_batch_depth(grid, *s, srays)
                    jax.block_until_ready(
                        jax.tree_util.tree_leaves(grid)[0])
                    walls.append(time.monotonic() - t0)
            tag = "routed" if route else "replicated"
            row[f"{tag}_wall_ms"] = round(
                1e3 * float(np.median(walls)), 1)
            row[f"{tag}_compile_s"] = round(compile_s, 1)
            if route:
                row["send_lanes_tiers"] = list(sf.send_lanes_tiers)
                per_dev, tot = live_counts(n_dev, sf.halo)
                row["live_pts_per_dev_mean"] = int(per_dev.mean())
                row["live_pts_per_dev_max"] = int(per_dev.max())
                row["live_pts_frame"] = int(tot)
                row["live_shrink"] = round(float(tot / per_dev.max()), 2)
        row["wall_ratio_routed_over_repl"] = round(
            row["routed_wall_ms"] / row["replicated_wall_ms"], 3)
        results.append(row)
        print(json.dumps(row), flush=True)

    # modeled v5e projection: single-chip K=8 integrate is 193.7 ms at
    # NA = 2.46M lanes (PERF.md §13), sort/scan-bound => ~NA-linear;
    # routed per-device NA shrinks by live_shrink; all_to_all bytes =
    # K * 7ch * 4B * d * Bs over ~45 GB/s ICI per link.
    for row in results:
        if "live_shrink" not in row:
            continue
        base_ms = 193.7
        proj = base_ms / row["live_shrink"]
        bs = row["send_lanes_tiers"][0]
        a2a_mb = 8 * 7 * 4 * row["n_dev"] * bs / 1e6
        row_p = {"n_dev": row["n_dev"],
                 "projected_integrate_ms_per_K8_batch": round(proj, 1),
                 "projected_speedup": round(base_ms / proj, 2),
                 "all_to_all_MB_per_batch_first_tier": round(a2a_mb, 1),
                 "all_to_all_ms_at_45GBps": round(a2a_mb / 45, 2)}
        print(json.dumps(row_p), flush=True)


if __name__ == "__main__":
    main()
