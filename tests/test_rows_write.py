"""ops.pallas.rows_write: in-place scattered row writes (lazy-Adam
write-back).  Interpret mode here; hardware parity in
scripts/tpu_kernel_parity.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.ops.pallas.rows_write import (
    merge_lane_blocks,
    rows_write,
    rows_write_reference,
)


def _mk(v, w, n, key=0, tile_boundary_ids=()):
    ks = jax.random.split(jax.random.key(key), 3)
    dst = jax.random.normal(ks[0], (v, w))
    ids = jax.random.choice(ks[1], v, (n,), replace=False)
    ids = jnp.sort(jnp.concatenate([ids, jnp.asarray(tile_boundary_ids, ids.dtype)]))
    # unique-ify after injecting boundary ids
    ids = jnp.unique(ids, size=ids.shape[0], fill_value=v + 10**6)
    vals = jax.random.normal(ks[2], (ids.shape[0], w))
    return dst, ids.astype(jnp.int32), vals


@pytest.mark.parametrize("v,w,n,tile_v", [(300, 128, 40, 64), (1000, 256, 100, 256)])
def test_rows_write_full_rows(v, w, n, tile_v):
    """bits = all-blocks-live writes whole rows; untouched rows unchanged."""
    dst, ids, vals = _mk(v, w, n, key=1, tile_boundary_ids=(0, v - 1))
    d = 64
    full = (1 << (w // d)) - 1
    bits = jnp.where(ids < v, full, 0).astype(jnp.int32)
    out = rows_write(dst, ids, bits, vals, block_dim=d, tile_v=tile_v)
    ref = rows_write_reference(dst, ids, bits, vals, d)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_rows_write_partial_lane_blocks():
    """Partner lane blocks of a physical row survive a masked write."""
    v, w, d = 128, 128, 32  # P = 4 lane blocks per row
    dst = jax.random.normal(jax.random.key(2), (v, w))
    ids = jnp.array([3, 17, 17 + 64, 90], jnp.int32)  # NB: sorted, unique
    ids = jnp.sort(ids)
    bits = jnp.array([0b0001, 0b1010, 0b0100, 0b1111], jnp.int32)
    vals = jax.random.normal(jax.random.key(3), (4, w))
    out = rows_write(dst, ids, bits, vals, block_dim=d, tile_v=64)
    ref = rows_write_reference(dst, ids, bits, vals, d)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # spot: row 3 keeps blocks 1..3 from dst
    np.testing.assert_array_equal(np.asarray(out[3, d:]), np.asarray(dst[3, d:]))
    np.testing.assert_array_equal(np.asarray(out[3, :d]), np.asarray(vals[0, :d]))


def test_rows_write_dead_slots_dropped():
    v, w = 200, 128
    dst = jax.random.normal(jax.random.key(4), (v, w))
    ids = jnp.array([5, 60, jnp.iinfo(jnp.int32).max, jnp.iinfo(jnp.int32).max], jnp.int32)
    bits = jnp.array([1, 3, 0, 0], jnp.int32)
    vals = jnp.ones((4, w))
    out = rows_write(dst, ids, bits, vals, block_dim=64, tile_v=128)
    ref = rows_write_reference(dst, ids, bits, vals, 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_rows_write_empty_updates():
    v, w = 100, 128
    dst = jax.random.normal(jax.random.key(5), (v, w))
    big = jnp.iinfo(jnp.int32).max
    ids = jnp.full((8,), big, jnp.int32)
    out = rows_write(dst, ids, jnp.zeros((8,), jnp.int32), jnp.zeros((8, w)), 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dst))


@pytest.mark.parametrize("pack,d", [(2, 64), (4, 32)])
def test_merge_lane_blocks(pack, d):
    """merge_lane_blocks turns sorted logical updates (dups marked) into the
    physical-row stream rows_write consumes; composed, they equal a logical
    .at[].set with dups dropped."""
    v_logical = 64
    v_phys = v_logical // pack
    table = jax.random.normal(jax.random.key(6), (v_phys, pack * d))
    # logical ids: include partners sharing a physical row AND duplicates
    sorted_ids = jnp.array([0, 1, 1, 8, 9, 30, 30, 63], jnp.int32)
    dup = jnp.array([0, 0, 1, 0, 0, 0, 1, 0], bool)
    new_rows = jax.random.normal(jax.random.key(7), (8, d))

    phys_ids, bits, vals = merge_lane_blocks(sorted_ids, dup, new_rows, pack)
    out = rows_write(table, phys_ids, bits, vals, block_dim=d, tile_v=16)

    # logical-space oracle
    logical = table.reshape(v_logical, d)
    keep = ~dup
    w_idx = jnp.where(keep, sorted_ids, v_logical)
    expect = logical.at[w_idx].set(new_rows, mode="drop").reshape(v_phys, pack * d)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(expect))


def test_merge_lane_blocks_first_slot_contract():
    phys_ids, bits, vals = merge_lane_blocks(
        jnp.array([4, 5, 6], jnp.int32), jnp.zeros((3,), bool),
        jnp.ones((3, 64)), 2,
    )
    # ids 4,5 share physical row 2 (merged at the run's FIRST slot);
    # id 6 -> row 3; the run's second slot is a masked no-op (bits 0)
    np.testing.assert_array_equal(np.asarray(phys_ids), [2, 2, 3])
    np.testing.assert_array_equal(np.asarray(bits), [0b11, 0, 0b01])
    np.testing.assert_array_equal(np.asarray(vals[0]), np.ones(128))


def test_merge_lane_blocks_partner_behind_duplicates():
    """A partner id's first slot can sit arbitrarily far behind duplicate
    slots of the other id — the searchsorted merge must still find it."""
    ids = jnp.array([8, 8, 8, 8, 9], jnp.int32)
    dup = jnp.array([0, 1, 1, 1, 0], bool)
    rows = jnp.arange(5 * 64, dtype=jnp.float32).reshape(5, 64)
    phys_ids, bits, vals = merge_lane_blocks(ids, dup, rows, 2)
    np.testing.assert_array_equal(np.asarray(phys_ids), [4] * 5)
    assert int(bits[0]) == 0b11 and not np.any(np.asarray(bits[1:]))
    np.testing.assert_array_equal(np.asarray(vals[0, :64]), np.asarray(rows[0]))
    np.testing.assert_array_equal(np.asarray(vals[0, 64:]), np.asarray(rows[4]))
