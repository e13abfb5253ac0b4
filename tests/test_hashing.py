"""Unit tests for the sort-election spatial hash (survey §4 unit tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifi_fusion_tpu.ops import hashing


def _table(C=1024, tail=256):
    return jnp.full((C + tail,), -1, jnp.int32)


def test_insert_then_lookup_roundtrip():
    C = 1024
    table = _table(C)
    ids = jnp.asarray([5, 99, 123456, 7, 5, 99], jnp.int32)
    active = jnp.ones(ids.shape, bool)
    table, slot, failed = hashing.lookup_or_insert(table, ids, active, 32, C)
    assert int(failed) == 0
    slot = np.asarray(slot)
    assert (slot >= 0).all()
    assert (slot < C).all()
    # duplicates resolve to the same slot
    assert slot[0] == slot[4]
    assert slot[1] == slot[5]
    # distinct keys get distinct slots
    assert len({slot[0], slot[1], slot[2], slot[3]}) == 4
    # table contains the keys at those slots
    tk = np.asarray(table)
    assert (tk[slot] == np.asarray(ids)).all()
    # lookup finds them again without modification
    found = hashing.lookup(table, ids, active, 32, C)
    assert (np.asarray(found) == slot).all()


def test_lookup_missing_returns_minus1():
    C = 1024
    table = _table(C)
    ids = jnp.asarray([42, 43], jnp.int32)
    table, _, _ = hashing.lookup_or_insert(
        table, ids, jnp.ones(2, bool), 32, C)
    probe = hashing.lookup(table, jnp.asarray([44, 42], jnp.int32),
                           jnp.ones(2, bool), 32, C)
    assert int(probe[0]) == -1
    assert int(probe[1]) >= 0


def test_inactive_lanes_untouched():
    C = 1024
    table = _table(C)
    ids = jnp.asarray([10, 11], jnp.int32)
    active = jnp.asarray([True, False])
    table, slot, failed = hashing.lookup_or_insert(table, ids, active, 32, C)
    assert int(failed) == 0
    assert int(slot[1]) == -1
    # only one live slot used (tail scratch doesn't count)
    assert int(jnp.sum(table[:C] != -1)) == 1


def test_collision_resolution_determinism():
    C = 256
    rng = np.random.default_rng(0)
    ids = rng.choice(100000, size=128, replace=False).astype(np.int32)
    t1, s1, f1 = hashing.lookup_or_insert(
        _table(C, 128), jnp.asarray(ids), jnp.ones(128, bool), 64, C)
    assert int(f1) == 0
    found = hashing.lookup(t1, jnp.asarray(ids), jnp.ones(128, bool), 64, C)
    assert (np.asarray(found) >= 0).all()
    live = np.asarray(t1[:C])
    assert set(live[live != -1]) == set(ids.tolist())
    # Same batch twice: idempotent
    t2, s2, f2 = hashing.lookup_or_insert(
        t1, jnp.asarray(ids), jnp.ones(128, bool), 64, C)
    assert int(f2) == 0
    assert (np.asarray(t2[:C]) == live).all()
    assert (np.asarray(s2) == np.asarray(found)).all()
    # Re-running from scratch gives the identical table (determinism)
    t3, _, _ = hashing.lookup_or_insert(
        _table(C, 128), jnp.asarray(ids), jnp.ones(128, bool), 64, C)
    assert (np.asarray(t3[:C]) == live).all()


def test_overflow_reported_when_full():
    C = 8
    ids = jnp.arange(16, dtype=jnp.int32) * 977
    table, slot, failed = hashing.lookup_or_insert(
        _table(C, 16), ids, jnp.ones(16, bool), 64, C)
    assert int(failed) == 8        # only 8 live slots exist
    assert int(jnp.sum(table[:C] != -1)) == 8


def test_staged_path_matches_semantics_at_scale():
    """Batches above 2*_STRAGGLERS take the staged (unrolled + compacted
    straggler loop) path; its results must satisfy the same invariants and
    be idempotent on re-insert.  High load (87%) exercises chains deeper
    than the unrolled prefix, i.e. the straggler loop itself."""
    U = hashing._STRAGGLERS * 2 + 8192      # forces the staged path
    C = 1 << (U - 1).bit_length()           # ~87% max load
    rng = np.random.default_rng(1)
    uniq = rng.choice(1 << 27, size=U - 2048, replace=False).astype(np.int32)
    ids = np.concatenate([uniq, np.full(U - uniq.size, -1, np.int32)])
    active = ids >= 0
    t1, s1, f1 = hashing.lookup_or_insert(
        jnp.full((C + U,), -1, jnp.int32), jnp.asarray(ids),
        jnp.asarray(active), 256, C, unique_ids=True)
    assert int(f1) == 0
    t1n, s1n = np.asarray(t1), np.asarray(s1)
    assert (t1n[s1n[active]] == ids[active]).all()
    assert len(set(s1n[active].tolist())) == int(active.sum())
    # second call: pure lookups; table's probe region unchanged
    t2, s2, f2 = hashing.lookup_or_insert(
        t1, jnp.asarray(ids), jnp.asarray(active), 256, C, unique_ids=True)
    assert int(f2) == 0
    np.testing.assert_array_equal(np.asarray(s2)[active], s1n[active])
    np.testing.assert_array_equal(np.asarray(t2)[:C], t1n[:C])


def test_hash_u32_mixes():
    ids = jnp.arange(4096, dtype=jnp.int32)
    h = np.asarray(hashing.hash_u32(ids))
    counts = np.bincount(h & 0xFF, minlength=256)
    assert counts.std() < counts.mean()
