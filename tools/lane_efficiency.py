"""Lane-efficiency audit of the bench workload (PERF.md §9, VERDICT r2 #7).

For each steady-state batch of the bench sweep this reports LIVE lane
counts against the STATIC budgets each phase actually dispatches, i.e. how
much of every sort/scan/scatter lane space does real work:

* active    — clip+bbox surviving points vs the NA = K * max_active budget
* unique    — distinct cells hit vs the batch unique-lane budget U
* partials  — live (cell, dep-lane) pair-partial lanes (Σ dep_count over
              unique cells) vs the U*DW partial space the pair block scans
              (ops/integrate.py — the design never expands point-pair
              lanes physically; the NA*DW elementwise space is always
              fully dispatched and its live fraction equals active/NA)
* owners    — DISTINCT dependant owners this batch streams into vs the
              hit-lane budget UH (sizes the owner-constant dedup)
* refine    — live candidates / buffered points vs the tier that covers

Run on the TPU (uses the persistent .jax_cache).  One extra analysis
program compiles on first use.  Output: one line per batch + a summary.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from bench import (BATCH, FRAMES, REFINE_TIERS, bench_config,
                       bench_rays, make_frames)
    from hifi_fusion_tpu.grid import quick_counts
    from hifi_fusion_tpu.models.pipeline import (FusionPipeline,
                                                 batch_lane_budgets,
                                                 refine_due)
    from hifi_fusion_tpu.ops import geometry
    from hifi_fusion_tpu.ops.hashing import lookup
    from hifi_fusion_tpu.ops.scatter import rows, segment_starts

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    cfg = bench_config()
    K = BATCH
    n_frames = int(os.environ.get("LANES_FRAMES", 32))
    n_frames = max((n_frames // K) * K, K)
    # the bench sweep EXACTLY (same-density prefix of the nominal arc,
    # same disk cache) — a spread arc over n_frames sees ~1.5x more fresh
    # surface per cadence and reports the wrong live counts
    frames = make_frames(cfg, n_frames, arc_frames=FRAMES)
    jrays = jnp.asarray(bench_rays())
    pipe = FusionPipeline(cfg)
    grid = pipe.init()
    budgets = batch_lane_budgets(cfg, K)
    U = budgets["unique_lanes"]
    UH = budgets["hit_lanes"]
    DW = max(cfg.dep_width_tiers or (cfg.max_dependants,))
    NA = K * cfg.max_active_points
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
        # dep fan-in of each unique cell (live (cell, lane) partial lanes)
        uids = jnp.sort(jnp.where(starts, sid, _BIG))[:U]
        uvalid = uids != _BIG
        slot = lookup(grid.key, jnp.where(uvalid, uids, 0), uvalid,
                      cfg.max_probes, cfg.capacity)
        us = jnp.clip(slot, 0, cfg.capacity - 1)
        ok = uvalid & (slot >= 0)
        dep_u = jnp.where(ok, grid.dep_count[us], 0)
        n_partials = jnp.sum(dep_u)
        max_dep = jnp.max(dep_u)
        # points-per-cell weighted dep histogram: how many POINT lanes
        # live in cells of each dep count (the pair block's scan space is
        # point-lane x dep-width, so this is the stratification payoff).
        # Segment lengths from start positions: starts are ascending, the
        # virtual next start after the last live segment is n_live.
        ucnt = segment_starts(sid, sid != _BIG)
        n_live = jnp.sum((sid != _BIG).astype(i32))
        spos = jnp.flatnonzero(ucnt, size=U, fill_value=0)
        live_u = jnp.arange(U, dtype=i32) < n_unique
        nxt = jnp.where(jnp.arange(U, dtype=i32) + 1 < n_unique,
                        jnp.roll(spos, -1), n_live)
        seg_n = jnp.where(live_u, nxt - spos, 0)  # (U,) pts per unique cell
        hist = jnp.zeros((13,), i32).at[jnp.clip(dep_u, 0, 12)].add(
            jnp.where(live_u, seg_n, 0).astype(i32))
        # DISTINCT owners: unique values in the unique cells' dep rows
        D = cfg.max_dependants
        drows = rows(grid.dep, D, us)[:, :DW]              # (U,DW)
        jlane = jnp.arange(DW, dtype=i32)[None, :]
        dmask = ok[:, None] & (jlane < dep_u[:, None]) & (drows >= 0)
        flat = jnp.sort(jnp.where(dmask, drows, _BIG).reshape(-1))
        n_owners = jnp.sum(segment_starts(flat, flat != _BIG).astype(i32))
        return n_active, n_unique, n_partials, n_owners, max_dep, hist

    done = 0
    print(f"budgets: NA={NA} U={U} partials={U * DW} UH={UH} "
          f"dep_tiers={cfg.dep_width_tiers}", flush=True)
    rows_out = []
    for b in range(n_frames // K):
        fb = frames[b * K:(b + 1) * K]
        dq = jnp.asarray(np.stack([f.depth_q for f in fb]))
        rc = jnp.asarray(np.stack([f.rgb565 for f in fb]))
        cn = jnp.asarray(np.asarray([f.count for f in fb], np.int32))
        ps = jnp.asarray(np.stack([f.pose for f in fb]))
        *scalars, hist = jax.device_get(audit(grid, dq, rc, cn, ps))
        na, nu, npart, now, mdep = (int(x) for x in scalars)
        hist = np.asarray(hist)
        grid = pipe.step_batch_depth(grid, dq, rc, cn, ps, jrays)
        done += K
        qc = None
        if refine_due(done, K, cfg):
            qc = quick_counts(grid, cfg)   # live counts the tier switch saw
            grid = pipe.refine(grid)
        row = dict(batch=b, active=na, unique=nu, partials=npart,
                   owners=now, max_dep=mdep,
                   cand=(qc or {}).get("refine_candidates"),
                   buffered=(qc or {}).get("buffered_points"))
        rows_out.append(row)
        print(f"batch {b}: active {na}/{NA} ({na/NA:.0%})  "
              f"unique {nu}/{U} ({nu/U:.0%})  "
              f"partials {npart}/{U*DW} ({npart/(U*DW):.0%})  "
              f"owners {now}/{UH} ({now/UH:.0%})  max_dep {mdep}"
              + (f"  refine: cand {row['cand']} buf {row['buffered']} "
                 f"(tiers {REFINE_TIERS and [t[0] for t in REFINE_TIERS]})"
                 if qc else ""), flush=True)
        tot = max(int(hist.sum()), 1)
        cum = np.cumsum(hist) / tot
        print(f"   pts-weighted dep histogram: "
              + " ".join(f"{d}:{100*h/tot:.0f}%" for d, h in
                         enumerate(hist) if h) +
              f"   cum<=2 {cum[2]:.0%} <=4 {cum[4]:.0%}", flush=True)
    tail = rows_out[len(rows_out) // 2:]
    print(f"steady means: active {np.mean([r['active'] for r in tail]):,.0f}"
          f"  unique {np.mean([r['unique'] for r in tail]):,.0f}"
          f"  partials {np.mean([r['partials'] for r in tail]):,.0f}"
          f"  owners {np.mean([r['owners'] for r in tail]):,.0f}",
          flush=True)


if __name__ == "__main__":
    main()
