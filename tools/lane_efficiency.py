"""Lane-efficiency audit of the bench workload (PERF.md §8, VERDICT r2 #7).

For each steady-state batch of the bench sweep this reports LIVE lane
counts against the STATIC budgets each phase actually dispatches, i.e. how
much of every sort/scan/scatter lane space does real work:

* active    — clip+bbox surviving points vs the NA = K * max_active budget
* unique    — distinct cells hit vs the batch unique-lane budget
* pairs     — Σ dep_count over active points vs the pair-lane budget P
              (the (NA x DW) expansion the pair sort compacts into P)
* hits      — distinct dependant owners hit vs the hit-lane budget UH
* refine    — live candidates / buffered points vs the tier that covers

Run on the TPU (uses the persistent .jax_cache).  One extra analysis
program compiles on first use.  Output: one line per batch + a summary.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from bench import BATCH, REFINE_TIERS, bench_config, bench_rays
    from hifi_fusion_tpu.grid import quick_counts
    from hifi_fusion_tpu.models.pipeline import (FusionPipeline,
                                                 batch_lane_budgets,
                                                 refine_due)
    from hifi_fusion_tpu.ops import geometry
    from hifi_fusion_tpu.ops.hashing import lookup
    from hifi_fusion_tpu.ops.scatter import segment_starts
    from hifi_fusion_tpu.utils.synthetic import make_depth_sweep

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = bench_config()
    K = BATCH
    n_frames = int(os.environ.get("LANES_FRAMES", 32))
    n_frames = max((n_frames // K) * K, K)
    frames = make_depth_sweep(cfg, n_frames, 640, cfg.max_points // 640,
                              srays=bench_rays(), seed=0,
                              noise_sd=3e-4, camera_height=0.4)
    jrays = jnp.asarray(bench_rays())
    pipe = FusionPipeline(cfg)
    grid = pipe.init()
    budgets = batch_lane_budgets(cfg, K)
    _BIG = jnp.iinfo(jnp.int32).max

    @partial(jax.jit, static_argnames=())
    def audit(grid, dq, r565, counts, poses):
        """Live lane counts for THIS batch against the current grid."""
        from hifi_fusion_tpu.ops.integrate import _unpack_inputs
        i32 = jnp.int32
        p, c, m = _unpack_inputs(dq, r565, counts, None, jrays)
        zmin, zmax = cfg.z_clip
        zclip = (p[:, 2] > zmin) & (p[:, 2] < zmax)
        world = jax.vmap(geometry.transform_points)(p, poses)
        wpl = world.transpose(1, 0, 2)
        coords = geometry.cell_coords(wpl, cfg)
        valid = (m & zclip & geometry.valid_points(wpl, cfg)
                 & geometry.valid_coords(coords, cfg))
        ids = geometry.cell_id(coords, cfg).reshape(-1)
        v = valid.reshape(-1)
        n_active = jnp.sum(v.astype(i32))
        sid = jnp.sort(jnp.where(v, ids, _BIG))
        starts = segment_starts(sid, sid != _BIG)
        n_unique = jnp.sum(starts.astype(i32))
        # dep fan-in of each unique cell (the pair lanes its points expand)
        uids = jnp.sort(jnp.where(starts, sid, _BIG))[
            :budgets["unique_lanes"]]
        uvalid = uids != _BIG
        slot = lookup(grid.key, jnp.where(uvalid, uids, 0), uvalid,
                      cfg.max_probes, cfg.capacity)
        dep_u = jnp.where(uvalid & (slot >= 0),
                          grid.dep_count[jnp.clip(slot, 0,
                                                  cfg.capacity - 1)], 0)
        n_hit_owners = jnp.sum((dep_u > 0).astype(i32))
        # pairs = Σ over unique cells of dep_count * points-in-cell
        seg = jnp.cumsum(starts.astype(i32)) - 1
        per_seg = jnp.zeros((budgets["unique_lanes"],), i32).at[
            jnp.clip(seg, 0, budgets["unique_lanes"] - 1)].add(
            (sid != _BIG).astype(i32))
        n_pairs = jnp.sum(per_seg * dep_u)
        max_dep = jnp.max(dep_u)
        return n_active, n_unique, n_pairs, n_hit_owners, max_dep

    done = 0
    print(f"budgets: NA={K * cfg.max_active_points} "
          f"U={budgets['unique_lanes']} P={budgets['pair_lanes']} "
          f"UH={budgets['hit_lanes']} dep_tiers={cfg.dep_width_tiers}",
          flush=True)
    rows = []
    for b in range(n_frames // K):
        fb = frames[b * K:(b + 1) * K]
        dq = jnp.asarray(np.stack([f.depth_q for f in fb]))
        rc = jnp.asarray(np.stack([f.rgb565 for f in fb]))
        cn = jnp.asarray(np.asarray([f.count for f in fb], np.int32))
        ps = jnp.asarray(np.stack([f.pose for f in fb]))
        na, nu, npair, nho, mdep = (int(x) for x in jax.device_get(
            audit(grid, dq, rc, cn, ps)))
        grid = pipe.step_batch_depth(grid, dq, rc, cn, ps, jrays)
        done += K
        qc = None
        if refine_due(done, K, cfg):
            qc = quick_counts(grid, cfg)   # live counts the tier switch saw
            grid = pipe.refine(grid)
        row = dict(batch=b, active=na, unique=nu, pairs=npair,
                   hit_owners=nho, max_dep=mdep,
                   cand=(qc or {}).get("refine_candidates"),
                   buffered=(qc or {}).get("buffered_points"))
        rows.append(row)
        print(f"batch {b}: active {na}/{K*cfg.max_active_points} "
              f"({na/(K*cfg.max_active_points):.0%})  "
              f"unique {nu}/{budgets['unique_lanes']} "
              f"({nu/budgets['unique_lanes']:.0%})  "
              f"pairs {npair}/{budgets['pair_lanes']} "
              f"({npair/budgets['pair_lanes']:.0%}; expansion "
              f"{npair/max(na*max(mdep,1),1):.0%} of NAxmax_dep)  "
              f"hit_owners {nho}/{budgets['hit_lanes']} "
              f"({nho/budgets['hit_lanes']:.0%})  max_dep {mdep}"
              + (f"  refine: cand {row['cand']} buf {row['buffered']} "
                 f"(tiers {REFINE_TIERS and [t[0] for t in REFINE_TIERS]})"
                 if qc else ""), flush=True)
    tail = rows[len(rows) // 2:]
    print(f"steady means: active {np.mean([r['active'] for r in tail]):,.0f}"
          f"  unique {np.mean([r['unique'] for r in tail]):,.0f}"
          f"  pairs {np.mean([r['pairs'] for r in tail]):,.0f}"
          f"  hit_owners {np.mean([r['hit_owners'] for r in tail]):,.0f}",
          flush=True)


if __name__ == "__main__":
    main()
