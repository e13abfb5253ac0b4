"""Adaptive-budget variants must be bit-identical to full-budget runs.

Round-2 perf work (PERF.md §4) sizes refine candidate / buffer / replay
budgets and the extract cap to live counts instead of static worst cases.
Any sufficiently large budget must produce EXACTLY the state the full
budget produces — these tests pin that, plus the guarded degradation
(overflow counters, never silence) when a budget is genuinely too small.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import make_grid, grid_metrics, quick_counts
from hifi_fusion_tpu.ops.extract import extract, to_host
from hifi_fusion_tpu.ops.integrate import integrate_frame
from hifi_fusion_tpu.ops.refine import refine_pass
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

CFG = small_test_config()


def _fuse(n_frames=4, refine_budgets=None):
    grid = make_grid(CFG)
    frames = make_sweep(CFG, n_frames, 2048, seed=3, surface_frac=0.6)
    kw = refine_budgets or {}
    for i, fr in enumerate(frames):
        pf = pad_frame(fr, CFG.max_points)
        grid = integrate_frame(grid, jnp.asarray(pf.points_cam),
                               jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                               jnp.asarray(pf.pose), config=CFG)
        if (i + 1) % 2 == 0:
            grid = refine_pass(grid, config=CFG, **kw)
    grid = refine_pass(grid, config=CFG, **kw)
    return grid


def _extract_np(grid, cap=None):
    return to_host(extract(grid, config=CFG, cap=cap))


def test_refine_budget_variants_bit_identical():
    full = _fuse()
    qc = quick_counts(full, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    # generous-but-smaller budgets (>= live counts at every pass)
    tight = _fuse(refine_budgets=dict(
        cand_lanes=2048, buf_lanes=1 << 14, replay_runs=1 << 13,
        replay_lanes=1 << 15))
    for k, v in grid_metrics(tight, CFG).items():
        if k.startswith("overflow"):
            assert v == 0, (k, v)
    a, b = _extract_np(full), _extract_np(tight)
    assert a["cell"].shape == b["cell"].shape
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_extract_cap_prefix_identical():
    grid = _fuse()
    full = _extract_np(grid)
    n = full["cell"].shape[0]
    assert n > 0
    capped = _extract_np(grid, cap=1 << 12)
    assert (1 << 12) >= n
    for k in full:
        np.testing.assert_array_equal(full[k], capped[k], err_msg=k)


def test_extract_cap_too_small_raises():
    grid = _fuse()
    r = extract(grid, config=CFG, cap=8)
    assert int(r.n_valid) > 8
    with pytest.raises(RuntimeError, match="extract cap"):
        to_host(r)


def test_small_buf_lanes_guard_counts_not_silent():
    # buf_lanes far below buf_count: the pass must keep the buffer intact
    # and count overflow_replay instead of silently dropping/wiping
    grid0 = make_grid(CFG)
    frames = make_sweep(CFG, 2, 2048, seed=3, surface_frac=0.6)
    for fr in frames:
        pf = pad_frame(fr, CFG.max_points)
        grid0 = integrate_frame(grid0, jnp.asarray(pf.points_cam),
                                jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                                jnp.asarray(pf.pose), config=CFG)
    before = int(grid0.buf_count)
    assert before > 64
    before_slot = np.asarray(grid0.buf_slot).copy()
    g = refine_pass(grid0, config=CFG, buf_lanes=64)
    assert int(g.overflow_replay) >= before - 64
    assert int(g.buf_count) == before          # buffer untouched
    np.testing.assert_array_equal(np.asarray(g.buf_slot), before_slot)


def test_quick_counts_matches_grid_metrics():
    grid = _fuse()
    qc = quick_counts(grid, CFG)
    m = grid_metrics(grid, CFG)
    for k, v in qc.items():
        if k in m:
            assert m[k] == v, (k, v, m[k])
    assert qc["refine_candidates"] <= m["occupied_voxels"]


def _fuse_dw(dep_width):
    """Fuse alternating integrate/refine with a dep_width-narrowed
    integrate variant (ops/integrate.py): exact whenever dep_width covers
    the live max(dep_count), counted in overflow_hits otherwise."""
    grid = make_grid(CFG)
    frames = make_sweep(CFG, 6, 2048, seed=7, surface_frac=0.6)
    for i, fr in enumerate(frames):
        pf = pad_frame(fr, CFG.max_points)
        kw = {} if dep_width is None else dict(dep_width=dep_width)
        grid = integrate_frame(grid, jnp.asarray(pf.points_cam),
                               jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                               jnp.asarray(pf.pose), config=CFG, **kw)
        if (i + 1) % 2 == 0:
            grid = refine_pass(grid, config=CFG)
    return refine_pass(grid, config=CFG)


def test_dep_width_variant_bit_identical_when_covering():
    full = _fuse_dw(None)
    qc = quick_counts(full, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    live_max = qc["max_dependants_used"]
    assert 0 < live_max <= CFG.max_dependants
    narrow = _fuse_dw(min(live_max + 1, CFG.max_dependants))
    for k, v in grid_metrics(narrow, CFG).items():
        if k.startswith("overflow"):
            assert v == 0, (k, v)
    a, b = _extract_np(full), _extract_np(narrow)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_dep_width_too_narrow_counts_overflow_hits():
    full = _fuse_dw(None)
    live_max = quick_counts(full, CFG)["max_dependants_used"]
    if live_max < 2:
        pytest.skip("sweep produced no multi-dependant cells")
    starved = _fuse_dw(1)
    assert int(starved.overflow_hits) > 0


def _fuse_hl(hit_lanes):
    grid = make_grid(CFG)
    frames = make_sweep(CFG, 6, 2048, seed=7, surface_frac=0.6)
    kw = {} if hit_lanes is None else dict(hit_lanes=hit_lanes)
    for i, fr in enumerate(frames):
        pf = pad_frame(fr, CFG.max_points)
        grid = integrate_frame(grid, jnp.asarray(pf.points_cam),
                               jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                               jnp.asarray(pf.pose), config=CFG, **kw)
        if (i + 1) % 2 == 0:
            grid = refine_pass(grid, config=CFG)
    return refine_pass(grid, config=CFG)


def test_hit_lane_starvation_counts_and_degrades_prefix_exactly():
    """Starving the pair-block's owner budget (UH < live hit owners) must
    (a) count overflow_hits, never silently drop, and (b) leave every
    SURVIVING owner's cylinder stats bit-identical to the full run — the
    stale-fill gate keeps dropped runs out of the scatter (the owner
    threshold form of ``fill_ok``, ops/integrate.py pair block)."""
    full = _fuse_hl(None)
    assert int(full.overflow_hits) == 0
    starved = _fuse_hl(64)     # << live hit owners on this sweep
    assert int(starved.overflow_hits) > 0
    # surviving voxels: counts either equal the full run's (owner kept on
    # every integrate) or are strictly smaller (run dropped in some pass)
    # — never larger, never NaN/garbage from a stale fill
    C = CFG.capacity
    f_cnt = np.round(np.asarray(full.cyl_stats[4::5][:C]))
    s_cnt = np.round(np.asarray(starved.cyl_stats[4::5][:C]))
    assert np.all(s_cnt <= f_cnt + 1e-6)
    s_stats = np.asarray(starved.cyl_stats).reshape(-1, 5)[:C]
    assert np.all(np.isfinite(s_stats))
    # where counts match, the whole 5-channel stat row matches bit-exactly
    same = s_cnt == f_cnt
    f_stats = np.asarray(full.cyl_stats).reshape(-1, 5)[:C]
    np.testing.assert_array_equal(s_stats[same], f_stats[same])
