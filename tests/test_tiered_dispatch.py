"""Device-side tier dispatch must equal the host-side variant policy.

Round-2 perf work moves the budget-variant choice ON DEVICE (lax.switch on
live counts) so the steady-state sweep runs with zero host round-trips:

* ``refine_pass(..., tiers=...)`` replaces quick_counts -> pick budgets,
* ``integrate_frame(..., dep_width_tiers=...)`` replaces the post-refine
  quick_counts -> dep_width fetch.

Both must be bit-identical to the explicit-budget calls they replace, and
the tier CONDITIONS must match the host policy in bench.py exactly (a tier
is chosen iff its budgets cover the live counts).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """XLA:CPU AOT deserialization of this module's largest program (the
    composed replay+outer tier switch) segfaulted twice at _cache_read
    (2026-08-19, jax 0.9/XLA CPU); compile it fresh rather than load the
    flaky artifact.  Everything else keeps the shared cache."""
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)
from hifi_fusion_tpu.grid import make_grid, grid_metrics, quick_counts
from hifi_fusion_tpu.ops.extract import extract, to_host
from hifi_fusion_tpu.ops.integrate import integrate_frame
from hifi_fusion_tpu.ops.refine import refine_pass
from hifi_fusion_tpu.utils.synthetic import make_sweep, pad_frame

CFG = small_test_config()

# generous steady budgets (cover the live counts of the small sweep) and a
# deliberately starved first tier (never covers anything)
STEADY = (2048, 1 << 14, 1 << 13, 1 << 15)
TINY = (8, 16, 16, 32)


def _frames(n=6, seed=11):
    return [pad_frame(f, CFG.max_points)
            for f in make_sweep(CFG, n, 2048, seed=seed, surface_frac=0.6)]


def _fuse(refine_kw=None, integrate_kw=None, n=6, seed=11):
    grid = make_grid(CFG)
    for i, pf in enumerate(_frames(n, seed)):
        grid = integrate_frame(grid, jnp.asarray(pf.points_cam),
                               jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                               jnp.asarray(pf.pose), config=CFG,
                               **(integrate_kw or {}))
        if (i + 1) % 2 == 0:
            grid = refine_pass(grid, config=CFG, **(refine_kw or {}))
    return refine_pass(grid, config=CFG, **(refine_kw or {}))


def _host(grid):
    return to_host(extract(grid, config=CFG))


def _assert_state_equal(a, b):
    ha, hb = _host(a), _host(b)
    for k in ha:
        np.testing.assert_array_equal(ha[k], hb[k], err_msg=k)
    ma, mb = grid_metrics(a, CFG), grid_metrics(b, CFG)
    assert ma == mb, (ma, mb)


def test_refine_tiers_pick_covering_tier_bit_identical():
    explicit = _fuse(refine_kw=dict(cand_lanes=STEADY[0],
                                    buf_lanes=STEADY[1],
                                    replay_runs=STEADY[2],
                                    replay_lanes=STEADY[3]))
    tiered = _fuse(refine_kw=dict(tiers=(STEADY,)))
    qc = quick_counts(tiered, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    _assert_state_equal(explicit, tiered)


def test_refine_tiers_skip_starved_tier():
    # the tiny tier never covers the live counts -> the switch must fall
    # through to the steady tier, still bit-identical, zero overflow
    tiered = _fuse(refine_kw=dict(tiers=(TINY, STEADY)))
    qc = quick_counts(tiered, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    explicit = _fuse(refine_kw=dict(cand_lanes=STEADY[0],
                                    buf_lanes=STEADY[1],
                                    replay_runs=STEADY[2],
                                    replay_lanes=STEADY[3]))
    _assert_state_equal(explicit, tiered)


def test_refine_tiers_fall_back_to_full_budgets():
    # only the starved tier listed -> every pass escalates to the full
    # config budgets; must equal the plain full-budget run exactly
    tiered = _fuse(refine_kw=dict(tiers=(TINY,)))
    qc = quick_counts(tiered, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    _assert_state_equal(_fuse(), tiered)


def test_dep_width_tiers_bit_identical():
    full = _fuse()
    live_max = quick_counts(full, CFG)["max_dependants_used"]
    assert 0 < live_max <= CFG.max_dependants
    dw = min(live_max + 1, CFG.max_dependants)
    tiered = _fuse(integrate_kw=dict(dep_width_tiers=(dw,)))
    qc = quick_counts(tiered, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    _assert_state_equal(full, tiered)


def test_dep_width_tiers_escalate_past_narrow():
    # a 1-wide first tier cannot cover multi-dependant cells: the switch
    # must escalate to the next width; zero overflow, bit-identical
    full = _fuse()
    live_max = quick_counts(full, CFG)["max_dependants_used"]
    if live_max < 2:
        import pytest
        pytest.skip("sweep produced no multi-dependant cells")
    tiered = _fuse(integrate_kw=dict(dep_width_tiers=(1, CFG.max_dependants)))
    qc = quick_counts(tiered, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    _assert_state_equal(full, tiered)


def test_combined_tiers_end_to_end():
    combined = _fuse(refine_kw=dict(tiers=(TINY, STEADY)),
                     integrate_kw=dict(dep_width_tiers=(2,)))
    qc = quick_counts(combined, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    _assert_state_equal(_fuse(), combined)


def test_replay_tiers_bit_identical():
    # the inner replay-expansion switch (on live t_rep) must be bit-exact
    # vs the single full-width replay block, with zero overflow (a tier is
    # selected only when t_rep fits it)
    tiered = _fuse(refine_kw=dict(replay_tiers=(64, 1024)))
    qc = quick_counts(tiered, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    _assert_state_equal(_fuse(), tiered)


def _compose_check():
    combined = _fuse(refine_kw=dict(tiers=(TINY, STEADY),
                                    replay_tiers=(64, 1024)),
                     integrate_kw=dict(dep_width_tiers=(2,)))
    qc = quick_counts(combined, CFG)
    assert all(v == 0 for k, v in qc.items() if k.startswith("overflow")), qc
    _assert_state_equal(_fuse(), combined)


def test_replay_tiers_compose_with_outer_tiers():
    """Run the composition check in a FRESH interpreter: XLA:CPU segfaulted
    three times (2026-08-19) compiling this program — the largest switch
    composition in the suite — inside a long-lived pytest process, while
    the identical check passes every time in a fresh process.  Subprocess
    isolation keeps the suite green AND keeps the coverage."""
    import os
    import subprocess
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--compose"],
                       capture_output=True, text=True, timeout=900,
                       env=env)
    assert r.returncode == 0, f"compose check failed:\n{r.stdout}\n{r.stderr}"


if __name__ == "__main__":
    if "--compose" in sys.argv:
        # the container's sitecustomize pins the TPU platform; re-pin CPU
        # before the first jax op initializes a backend
        jax.config.update("jax_platforms", "cpu")
        _compose_check()
        print("compose check ok")
