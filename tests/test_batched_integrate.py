"""K-frame batched integrate must match sequential frame-by-frame integration.

PERF.md §4 item (5): batching K frames into one integrate dispatch
amortizes the per-dispatch fixed machinery (hash insert, unique
compaction, dep-row gather, full-array scatter passes).  Correctness
contract (ops/integrate.py docstring): integer state (occupancy, counts,
frames) is bit-identical to sequential integration; f32 sums differ only
in addition order (different scan association); first-occupancy
viewpoints resolve to the earliest frame, exactly as sequential.

Hash slot ASSIGNMENT may differ (insertion order differs), so comparisons
go through extraction — keyed by dense cell id — never raw slot arrays.
"""
import jax.numpy as jnp
import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import make_grid, grid_metrics
from hifi_fusion_tpu.ops.extract import extract, to_host
from hifi_fusion_tpu.ops.integrate import integrate_frame
from hifi_fusion_tpu.ops.refine import refine_pass
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

CFG = small_test_config()


def _frames(n, seed=7):
    fs = [pad_frame(f, CFG.max_points)
          for f in make_sweep(CFG, n, 2048, seed=seed, surface_frac=0.6)]
    return fs


def _stack(fs):
    return (jnp.asarray(np.stack([f.points_cam for f in fs])),
            jnp.asarray(np.stack([f.rgb for f in fs])),
            jnp.asarray(np.stack([f.mask for f in fs])),
            jnp.asarray(np.stack([f.pose for f in fs])))


def _seq(grid, fs):
    for f in fs:
        grid = integrate_frame(grid, jnp.asarray(f.points_cam),
                               jnp.asarray(f.rgb), jnp.asarray(f.mask),
                               jnp.asarray(f.pose), config=CFG)
    return grid


def _x(grid):
    return to_host(extract(grid, config=CFG))


def _assert_equiv(a, b):
    assert a["cell"].shape == b["cell"].shape
    for k in a:
        if a[k].dtype.kind == "i":
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        else:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-5, atol=2e-6,
                                       err_msg=k)


def test_batched_matches_sequential_fresh_grid():
    fs = _frames(4)
    seq = _seq(make_grid(CFG), fs)
    bat = integrate_frame(make_grid(CFG), *_stack(fs), config=CFG)
    assert int(bat.frames) == int(seq.frames) == 4
    for k, v in grid_metrics(bat, CFG).items():
        if k.startswith("overflow"):
            assert v == 0, (k, v)
    _assert_equiv(_x(seq), _x(bat))


def test_batched_matches_sequential_with_dependants():
    # refine first so dependants exist -> the cylinder stream path runs
    fs = _frames(6, seed=11)
    g0 = _seq(make_grid(CFG), fs[:2])
    g0 = refine_pass(g0, config=CFG)
    seq = _seq(g0, fs[2:])
    # rebuild the SAME pre-batch state (g0 was donated by seq's integrate)
    g0b = _seq(make_grid(CFG), fs[:2])
    g0b = refine_pass(g0b, config=CFG)
    bat = integrate_frame(g0b, *_stack(fs[2:]), config=CFG)
    _assert_equiv(_x(seq), _x(bat))


def test_batched_viewpoint_is_earliest_frame():
    # two frames from different poses hitting overlapping cells: the
    # batched viewpoint stamp must equal the sequential one exactly
    fs = _frames(2, seed=23)
    seq = _seq(make_grid(CFG), fs)
    bat = integrate_frame(make_grid(CFG), *_stack(fs), config=CFG)
    # compare the per-voxel viewpoint stamps keyed by cell id
    def vp_by_cell(g):
        # slice to capacity: every grid array carries a scatter scratch
        # tail past C whose contents are garbage by design (ops/scatter.py)
        C = CFG.capacity
        key = np.asarray(g.key)[:C]
        occ = np.asarray(g.n_pts)[:C] > 0
        vs = np.asarray(g.viewpoint).reshape(-1, 3)[:C]
        d = {int(k): tuple(vs[i]) for i, k in enumerate(key)
             if occ[i]}
        return d
    a, b = vp_by_cell(seq), vp_by_cell(bat)
    assert set(a) == set(b)
    for c in a:
        np.testing.assert_array_equal(np.asarray(a[c]), np.asarray(b[c]),
                                      err_msg=f"cell {c}")


def test_batched_budget_overrides_and_overflow():
    fs = _frames(3, seed=5)
    # generous explicit budgets: still exact
    bat = integrate_frame(make_grid(CFG), *_stack(fs), config=CFG,
                          active_lanes=3 * CFG.max_points,
                          unique_lanes=4096, hit_lanes=1 << 12)
    seq = _seq(make_grid(CFG), fs)
    _assert_equiv(_x(seq), _x(bat))
    # a too-small active budget must COUNT the dropped lanes, not hide them
    tiny = integrate_frame(make_grid(CFG), *_stack(fs), config=CFG,
                           active_lanes=128)
    m = grid_metrics(tiny, CFG)
    assert m["overflow_active"] > 0


def test_batched_depth_wire_matches_sequential_depth():
    """Batched DEPTH-wire ingest ((K,N) u16 + (K,) counts + shared rays)
    must be equivalent to per-frame depth ingest — the bench's production
    combination (depth wire + K-frame batching + narrowed budgets)."""
    from hifi_fusion_tpu.utils.synthetic import camera_rays, make_depth_sweep
    dcfg = small_test_config(z_clip=(0.05, 0.99), capacity_log2=16,
                             max_probes=64)
    rays = camera_rays(64, 48, fx=50.0)
    jr = jnp.asarray(rays)
    dfs = make_depth_sweep(dcfg, 4, width=64, height=48, seed=9, srays=rays)

    seq = make_grid(dcfg)
    for f in dfs:
        seq = integrate_frame(seq, jnp.asarray(f.depth_q),
                              jnp.asarray(f.rgb565),
                              jnp.asarray(np.int32(f.count)),
                              jnp.asarray(f.pose), config=dcfg, rays=jr)
    seq = refine_pass(seq, config=dcfg)

    bat = make_grid(dcfg)
    bat = integrate_frame(
        bat, jnp.asarray(np.stack([f.depth_q for f in dfs])),
        jnp.asarray(np.stack([f.rgb565 for f in dfs])),
        jnp.asarray(np.asarray([f.count for f in dfs], np.int32)),
        jnp.asarray(np.stack([f.pose for f in dfs])),
        config=dcfg, rays=jr, dep_width=8,
        unique_lanes=4096, hit_lanes=4096)
    bat = refine_pass(bat, config=dcfg)

    ms, mb = grid_metrics(seq, dcfg), grid_metrics(bat, dcfg)
    for k in ("occupied_voxels", "normals_found", "frames",
              "buffered_points"):
        assert ms[k] == mb[k], (k, ms[k], mb[k])
    for k, v in mb.items():
        if k.startswith("overflow"):
            assert v == 0, (k, v)
    a = to_host(extract(seq, config=dcfg))
    b = to_host(extract(bat, config=dcfg))
    assert a["cell"].shape == b["cell"].shape
    for k in a:
        if a[k].dtype.kind == "i":
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        else:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-5, atol=2e-6,
                                       err_msg=k)
