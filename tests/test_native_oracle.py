"""C++ oracle vs Python oracle vs device pipeline three-way parity."""

import numpy as np
import pytest

from hifi_fusion_tpu.config import small_test_config
from hifi_fusion_tpu.oracle import OracleGrid
from hifi_fusion_tpu.oracle import native as oracle_native

CFG = small_test_config()


@pytest.fixture(scope="module")
def sweep():
    from hifi_fusion_tpu.utils.synthetic import make_sweep
    return make_sweep(CFG, 5, 600, seed=11)


def test_native_oracle_matches_python(sweep):
    if not oracle_native.available():
        pytest.skip("oracle native lib not built")
    py = OracleGrid(CFG)
    cc = oracle_native.NativeOracle(CFG)
    for i, fr in enumerate(sweep):
        py.integrate_frame(fr.points_cam, fr.rgb, fr.pose)
        cc.integrate_frame(fr.points_cam, fr.rgb, fr.pose)
        if (i + 1) % 2 == 0:
            py.refine()
            cc.refine()
    py.refine()
    cc.refine()
    a = py.extract()
    b = cc.extract()
    np.testing.assert_array_equal(a["cell"], b["cell"])
    np.testing.assert_array_equal(a["count"], b["count"])
    dots = np.sum(a["normal"] * b["normal"], axis=1)
    assert (dots > 0.99999).all()
    np.testing.assert_allclose(a["centroid"], b["centroid"], atol=1e-5)
    np.testing.assert_allclose(a["sd"], b["sd"], atol=1e-12)
    np.testing.assert_allclose(a["mean_dist"], b["mean_dist"], atol=1e-7)


def test_tsan_clean(tmp_path):
    """Race detection on the native layer (survey §5.2): concurrent
    decode/clip/export under ThreadSanitizer must report zero races (the
    reference's equivalents race, FUSION.cpp:135, 398)."""
    import shutil
    import subprocess
    from hifi_fusion_tpu.runtime import native as rt_native

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    d = rt_native._DIR
    r = subprocess.run(["make", "-C", d, "tsan_check"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"TSAN build unavailable: {r.stderr[-200:]}")
    r = subprocess.run([f"{d}/tsan_check", str(tmp_path)],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, f"TSAN reported races:\n{r.stderr[-2000:]}"


def test_native_oracle_matches_device(sweep):
    if not oracle_native.available():
        pytest.skip("oracle native lib not built")
    import jax.numpy as jnp
    from hifi_fusion_tpu.grid import make_grid
    from hifi_fusion_tpu.ops import integrate_frame, refine_pass, extract, \
        to_host
    from hifi_fusion_tpu.utils.synthetic import pad_frame

    cc = oracle_native.NativeOracle(CFG)
    grid = make_grid(CFG)
    for i, fr in enumerate(sweep):
        pf = pad_frame(fr, CFG.max_points)
        grid = integrate_frame(grid, jnp.asarray(pf.points_cam),
                               jnp.asarray(pf.rgb), jnp.asarray(pf.mask),
                               jnp.asarray(pf.pose), config=CFG)
        cc.integrate_frame(fr.points_cam, fr.rgb, fr.pose)
        if (i + 1) % 2 == 0:
            grid = refine_pass(grid, config=CFG)
            cc.refine()
    grid = refine_pass(grid, config=CFG)
    cc.refine()
    dev = to_host(extract(grid, config=CFG))
    ref = cc.extract()
    np.testing.assert_array_equal(dev["cell"].astype(np.int64), ref["cell"])
    np.testing.assert_array_equal(dev["count"].astype(np.int64),
                                  ref["count"])
    np.testing.assert_allclose(dev["centroid"], ref["centroid"], atol=2e-5)
    np.testing.assert_allclose(dev["sd"], ref["sd"], atol=1e-9)
