"""Stratified dependant residual (ops/integrate.py _resid_block).

The dense (point x dep-lane) scans run at the first dep_width_tiers width
and deeper cells' extra lanes ride the compact side path — every
(point, lane) pair computed exactly once, so integer outputs must be
BIT-IDENTICAL to the full-width pair block (PERF.md §9: >=99.9% of point
lanes live in cells with <= 4 dependants, so the bench runs dense width 4
instead of the batch max 6)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import grid_metrics, make_grid
from hifi_fusion_tpu.ops.extract import extract, to_host
from hifi_fusion_tpu.ops.integrate import integrate_frame
from hifi_fusion_tpu.ops.refine import refine_pass
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

BASE = small_test_config(max_dependants=12)
FRAMES = [pad_frame(f, BASE.max_points)
          for f in make_sweep(BASE, 8, 1200, seed=7)]


def _fuse(cfg, dep_kwargs, expect_overflow=False):
    g = make_grid(cfg)
    for i, pf in enumerate(FRAMES):
        g = integrate_frame(g, jnp.asarray(pf.points_cam),
                            jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                            jnp.asarray(pf.pose), config=cfg, **dep_kwargs)
        if (i + 1) % 2 == 0:
            g = refine_pass(g, config=cfg)
    g = refine_pass(g, config=cfg)
    m = grid_metrics(g, cfg)
    if expect_overflow:
        assert m["overflow_hits"] > 0, m
    else:
        assert all(v == 0 for k, v in m.items()
                   if k.startswith("overflow")), m
    return to_host(extract(g, config=cfg))


def test_residual_bit_identical_to_full_width():
    ref = _fuse(BASE, {})
    cfg = dataclasses.replace(BASE, dep_resid_cells=1 << 10,
                              dep_resid_pairs=1 << 14).validate()
    for width in (2, 4):
        out = _fuse(cfg, {"dep_width_tiers": (width,)})
        np.testing.assert_array_equal(ref["cell"], out["cell"])
        np.testing.assert_array_equal(ref["count"], out["count"])
        np.testing.assert_array_equal(ref["n_pts"], out["n_pts"])
        np.testing.assert_allclose(ref["centroid"], out["centroid"],
                                   atol=2e-6)
        np.testing.assert_allclose(ref["mean_dist"], out["mean_dist"],
                                   atol=1e-6)
    assert ref["count"].sum() > 0


def test_residual_overrun_is_counted_never_silent():
    """A starved residual pair budget must raise overflow_hits (and the
    kept pairs still match the reference where complete — not asserted
    here; the counter is the contract)."""
    cfg = dataclasses.replace(BASE, dep_resid_cells=4,
                              dep_resid_pairs=32).validate()
    _fuse(cfg, {"dep_width_tiers": (1,)}, expect_overflow=True)
