"""The Pallas in-block segmented scan must match the XLA ladder
bit-for-bit (ops/scatter.segment_reduce dispatches between them; parity
everywhere relies on them being interchangeable lane-for-lane)."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from hifi_fusion_tpu.ops.pallas_segscan import block_segscan
from hifi_fusion_tpu.ops import scatter


def _blocked(keys, vals):
    n = keys.shape[-1]
    starts = np.asarray(scatter.segment_starts(
        jnp.asarray(keys), jnp.ones(n, bool)))
    k = vals.shape[0]
    nb = n // 512
    return (jnp.asarray(vals.reshape(k, nb, 512)),
            jnp.asarray(starts.reshape(nb, 512)))


@pytest.mark.parametrize("kind", ["add", "first", "or"])
def test_block_segscan_matches_xla_ladder(kind):
    rng = np.random.default_rng(3)
    n = 3 * 512
    keys = np.sort(rng.integers(0, 29, n))
    if kind == "or":
        vals = rng.integers(0, 2 ** 31, (2, n)).astype(np.uint32)
        op = jnp.bitwise_or
    elif kind == "add":
        vals = rng.standard_normal((3, n)).astype(np.float32)
        op = jnp.add
    else:
        vals = rng.integers(-5, 99, (4, n)).astype(np.int32)
        op = None
    vb, fb = _blocked(keys, vals)

    # reference: force the XLA ladder through segment_reduce's own path
    os.environ["HIFI_SEGSCAN"] = "0"
    try:
        if kind == "first":
            ref = scatter.segment_fill(jnp.asarray(vals),
                                       fb.reshape(-1))
        elif kind == "add":
            ref = scatter.segment_sums(jnp.asarray(vals), fb.reshape(-1))
        else:
            ref = scatter.segment_reduce(jnp.asarray(vals),
                                         fb.reshape(-1), op, kind="or")
    finally:
        del os.environ["HIFI_SEGSCAN"]

    sv, sf = block_segscan(vb, fb, kind=kind, interpret=True)
    # combine phase (copied from segment_reduce) applied to kernel output
    k = vals.shape[0]
    nb = n // 512
    svs = sv[:, :, -1]
    sfs = sf[:, -1]
    # inter-block ladder on summaries (tiny)
    vvb, ffb = svs, sfs
    s = 1
    while s < nb:
        pad_v = jnp.zeros_like(vvb[:, :s])
        pad_f = jnp.zeros_like(ffb[:s])
        vsh = jnp.concatenate([pad_v, vvb[:, :-s]], axis=1)
        fsh = jnp.concatenate([pad_f, ffb[:-s]])
        if kind == "add":
            comb = vsh + vvb
        elif kind == "or":
            comb = vsh | vvb
        else:
            comb = vsh
        vvb = jnp.where(ffb, vvb, comb)
        ffb = ffb | fsh
        s *= 2
    ev = jnp.concatenate([jnp.zeros_like(vvb[:, :1]), vvb[:, :-1]], axis=1)
    if kind == "add":
        out = jnp.where(sf[None], sv, ev[:, :, None] + sv)
    elif kind == "or":
        out = jnp.where(sf[None], sv, ev[:, :, None] | sv)
    else:
        out = jnp.where(sf[None], sv, ev[:, :, None])
    out = out.reshape(k, n)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
