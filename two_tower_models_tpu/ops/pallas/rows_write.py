"""In-place scattered row writes that scale with the UPDATE count.

The lazy-Adam table update (training.sparse_tables) computes new values for
the ~139k touched rows in O(N) — but writing them back with XLA's
scatter-SET costs O(V) with a large constant (measured 235 ms standalone for
139k rows into a 4M-row table; the whole lazy step regressed to 143.9 ms vs
dense 79.1 ms — BASELINE.md round-2 follow-up).  This kernel restores
O(N + V_stream) write-back:

  grid over table tiles; every program copies its tile through (DMA from the
  ALIASED input — untouched tiles cost one tile DMA in/out, nothing else),
  then overwrites its touched rows, streamed from HBM in sorted order
  exactly like ops.pallas.scatter_add reads its updates.

Rows are written at LANE-BLOCK granularity: with 128-lane-packed tables
(nn.packed_table) P = 128/D logical rows share a physical row, and a
physical row's update must leave un-touched partners' lanes intact.  Each
update row carries an int32 bitmask of live P-blocks; the kernel blends
``row = old * (1-m) + new * m`` with the mask expanded from the bitmask —
no masks are streamed from HBM, only one extra int32 per row in SMEM.

The table, not the update set, bounds VMEM: tiles stream through a
[tile_v, W] block, updates through _SUB-row pieces.  Used by
``training.sparse_tables.apply_sparse_adam`` for packed tables (the XLA
scatter stays for small/unpacked tables and non-TPU backends).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_tower_models_tpu.ops.pallas.fused_softmax import _interpret

_CHUNK = 1024  # ids/bits DMA granule (Mosaic 1-D int32 HBM tiling)
_SUB = 128  # update-row DMA granule


def _kernel(
    starts_ref,  # SMEM [n_tiles + 1] int32 (scalar prefetch)
    ids_ref,  # HBM [Np] int32: physical row per update, sorted, unique
    bits_ref,  # HBM [Np] int32: live lane-block bitmask per update
    vals_ref,  # HBM [Np, W]: new row values (dead lanes arbitrary)
    dst_ref,  # VMEM [tile_v, W] — current tile (ALIASED to the output)
    out_ref,  # VMEM [tile_v, W] — this program's table tile
    ids_smem,  # SMEM [CHUNK] int32
    bits_smem,  # SMEM [CHUNK] int32
    vals_vmem,  # VMEM [SUB, W]
    sem_ids,
    sem_bits,
    sem_rows,
    *,
    tile_v: int,
    block_dim: int,
):
    i = pl.program_id(0)
    base = i * tile_v
    # copy-through: untouched rows pass unchanged (dst streams in via the
    # block pipeline; the alias keeps HBM usage at one buffer)
    out_ref[...] = dst_ref[...]

    start = starts_ref[i]
    end = starts_ref[i + 1]
    a0 = (start // _CHUNK) * _CHUNK

    w = out_ref.shape[-1]
    # lane -> its P-block index, for expanding the bitmask
    blk = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) // block_dim

    def chunk_body(c, _):
        off = a0 + c * _CHUNK
        cp_i = pltpu.make_async_copy(ids_ref.at[pl.ds(off, _CHUNK)], ids_smem, sem_ids)
        cp_b = pltpu.make_async_copy(bits_ref.at[pl.ds(off, _CHUNK)], bits_smem, sem_bits)
        cp_i.start()
        cp_b.start()
        cp_i.wait()
        cp_b.wait()

        def sub_body(s, _):
            soff = off + s * _SUB
            lo = jnp.maximum(start, soff)
            hi = jnp.minimum(end, soff + _SUB)

            @pl.when(hi > lo)
            def _live():
                cp_r = pltpu.make_async_copy(
                    vals_ref.at[pl.ds(soff, _SUB), :], vals_vmem, sem_rows
                )
                cp_r.start()
                cp_r.wait()

                def row_body(k, _):
                    r = ids_smem[s * _SUB + k] - base
                    m = ((bits_smem[s * _SUB + k] >> blk) & 1).astype(out_ref.dtype)
                    old = out_ref[pl.ds(r, 1), :]
                    new = vals_vmem[pl.ds(k, 1), :]
                    out_ref[pl.ds(r, 1), :] = old * (1 - m) + new * m
                    return 0

                jax.lax.fori_loop(lo - soff, hi - soff, row_body, 0)

            return 0

        jax.lax.fori_loop(0, _CHUNK // _SUB, sub_body, 0)
        return 0

    n_chunks = jnp.where(end > start, pl.cdiv(end - a0, _CHUNK), 0)
    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def rows_write(
    dst: jnp.ndarray,  # [V, W], W % 128 == 0
    ids: jnp.ndarray,  # [N] int32: physical rows, SORTED, unique among live
    bits: jnp.ndarray,  # [N] int32: live lane-block bitmask (0 = dead slot)
    vals: jnp.ndarray,  # [N, W]: new values (dead lanes arbitrary)
    block_dim: int,  # logical row width D (lane blocks are D wide)
    tile_v: int = 2048,
) -> jnp.ndarray:
    """Functional in-place write: out[ids[n], lanes in bits[n]] = vals[n].

    Dead slots (ids[n] >= V) are dropped.  ``ids`` must be sorted ascending
    with live entries unique; the caller merges duplicates (lane blocks of
    one physical row) into a single entry.
    """
    v, w = dst.shape
    n = ids.shape[0]
    assert w % 128 == 0 and w % block_dim == 0, (w, block_dim)
    assert vals.shape == (n, w)
    assert vals.dtype == dst.dtype, (vals.dtype, dst.dtype)

    vp = -(-v // tile_v) * tile_v
    n_tiles = vp // tile_v
    dstp = jnp.pad(dst, ((0, vp - v), (0, 0))) if vp != v else dst

    # pad the update stream so chunked DMAs stay in bounds; pad ids land at
    # vp == the last boundary -> excluded by searchsorted(side='left')
    ids_p = jnp.pad(ids.astype(jnp.int32), (0, _CHUNK), constant_values=vp)
    bits_p = jnp.pad(bits.astype(jnp.int32), (0, _CHUNK))
    vals_p = jnp.pad(vals, ((0, _CHUNK), (0, 0)))
    # dead slots (ids >= v) must also sort to the exclusion zone
    boundaries = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_v
    starts = jnp.searchsorted(
        jnp.minimum(ids_p[:n], vp), boundaries, side="left"
    ).astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_v=tile_v, block_dim=block_dim),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # ids
                pl.BlockSpec(memory_space=pl.ANY),  # bits
                pl.BlockSpec(memory_space=pl.ANY),  # vals
                pl.BlockSpec(
                    (tile_v, w), lambda i, starts: (i, 0),
                    memory_space=pltpu.VMEM,
                ),  # dst (aliased to out)
            ],
            out_specs=pl.BlockSpec(
                (tile_v, w), lambda i, starts: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.SMEM((_CHUNK,), jnp.int32),
                pltpu.SMEM((_CHUNK,), jnp.int32),
                pltpu.VMEM((_SUB, w), dst.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((vp, w), dst.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # operand 4 = after scalar prefetch, ids, bits, vals
        input_output_aliases={4: 0},
        interpret=_interpret(),
    )(starts, ids_p, bits_p, vals_p, dstp)
    return out[:v]


def lane_block_plan(
    sorted_ids: jnp.ndarray,  # [N] int32: LOGICAL ids, sorted (dups adjacent)
    dup_mask: jnp.ndarray,  # [N] bool: slot repeats the previous slot's id
    pack: int,  # P = physical width / D
):
    """Id-dependent half of merge_lane_blocks: (phys_ids [N], bits [N],
    pos [P, N], found [P, N], keep [N]).  Depends only on the id set, so one
    plan serves every row array written back for the same batch (table, mu,
    nu on the lazy-Adam path).

    Scatter- AND searchsorted-free: the P lane partners of a physical row
    are the consecutive LOGICAL-run first slots inside that row's run of
    equal ``ids // pack`` — already adjacent in the sorted order (nothing
    sorts between phys*P and phys*P + P - 1).  So each partner is reached
    by hopping the next-first-slot chain from the phys run's start:
    P cheap int32 gathers instead of P searchsorted passes, whose ~log2(N)
    serial gather rounds measured 39.5 ms of the 110 ms lazy step at
    N=135k (scripts/decompose_lazy.py).
    """
    n = sorted_ids.shape[0]
    ids = sorted_ids.astype(jnp.int32)
    phys = ids // pack
    iota = jnp.arange(n, dtype=jnp.int32)
    firsts_log = ~dup_mask
    # first slot of this slot's PHYS run
    phys_dup = jnp.concatenate([jnp.zeros((1,), bool), phys[1:] == phys[:-1]])
    phys_first = jax.lax.cummax(jnp.where(phys_dup, jnp.int32(-1), iota))
    # next logical-run first slot STRICTLY AFTER i: reverse-cummin of first
    # positions, shifted left (n at the end = "none")
    rn = jax.lax.cummin(
        jnp.where(firsts_log, iota, jnp.int32(n)), reverse=True
    )
    next_first = jnp.concatenate([rn[1:], jnp.full((1,), n, jnp.int32)])

    pos_c = [jnp.zeros((n,), jnp.int32) for _ in range(pack)]
    found_c = [jnp.zeros((n,), bool) for _ in range(pack)]
    bits = jnp.zeros((n,), jnp.int32)
    j = phys_first  # hop 0: the phys run's first slot (always in bounds)
    for _ in range(pack):
        jc = jnp.minimum(j, n - 1)
        valid = (j < n) & (jnp.take(phys, jc) == phys)
        c_j = jnp.take(ids, jc) - phys * pack  # lane block of this partner
        for c in range(pack):
            hit = valid & (c_j == c)
            pos_c[c] = jnp.where(hit, jc, pos_c[c])
            found_c[c] = found_c[c] | hit
            bits = bits | jnp.where(hit, jnp.int32(1) << c, 0)
        j = jnp.take(next_first, jc)  # hop to the next logical run
    bits = jnp.where(~phys_dup, bits, 0)  # non-first run slots: masked no-ops
    return phys, bits, jnp.stack(pos_c), jnp.stack(found_c), ~dup_mask


def merge_rows(plan, sorted_ids, new_rows):
    """Value half: merge [N, D] logical rows into [N, P*D] physical rows per
    a lane_block_plan."""
    phys, bits, pos, found, keep = plan
    n, d = new_rows.shape
    pack = pos.shape[0]
    blk = sorted_ids.astype(jnp.int32) % pack
    oh = jax.nn.one_hot(blk, pack, dtype=new_rows.dtype) * keep[:, None]
    contrib = (oh[:, :, None] * new_rows[:, None, :]).reshape(n, pack * d)
    # contributions live only at each id's FIRST slot (dups carry zeros and
    # searchsorted(side='left') never lands on them)
    vals = jnp.zeros_like(contrib)
    for c in range(pack):
        row = jnp.take(contrib, pos[c], axis=0)
        vals = vals + jnp.where(found[c][:, None], row, 0)
    return vals


def merge_lane_blocks(
    sorted_ids: jnp.ndarray,  # [N] int32: LOGICAL ids, sorted (dups adjacent)
    dup_mask: jnp.ndarray,  # [N] bool: slot repeats the previous slot's id
    new_rows: jnp.ndarray,  # [N, D]: new logical-row values
    pack: int,  # P = physical width / D
):
    """Merge logical-row updates into per-PHYSICAL-row (ids, bits, vals).

    Returns (phys_ids [N], bits [N], vals [N, P*D]), SORTED by physical row:
    the first slot of each run of equal physical rows carries the merged
    value and lane bitmask; later slots of the run keep the same physical id
    with bits == 0 (rows_write applies them as masked no-ops).  Duplicate
    logical slots contribute nothing.  (Convenience wrapper: callers writing
    several row arrays for one id set should build lane_block_plan once and
    merge_rows each.)
    """
    plan = lane_block_plan(sorted_ids, dup_mask, pack)
    return plan[0], plan[1], merge_rows(plan, sorted_ids, new_rows)


def rows_write_reference(dst, ids, bits, vals, block_dim):
    """Pure-XLA semantics oracle for rows_write (tests).

    Slots with ``bits == 0`` (merge_lane_blocks' masked no-ops, which share
    their physical id with the run's live first slot) must be DROPPED before
    the scatter: with duplicate indices XLA's scatter-SET order is
    unspecified, and on TPU hardware the no-op slot's merged row (== the
    original row) can land after the live slot's update and erase it — the
    kernel's in-order masked blend has no such ambiguity."""
    v, w = dst.shape
    lanes = jnp.arange(w) // block_dim
    m = ((bits[:, None] >> lanes[None, :]) & 1).astype(dst.dtype)
    old = jnp.take(dst, jnp.minimum(ids, v - 1), axis=0)
    merged = old * (1 - m) + vals * m
    live = (ids < v) & (bits != 0)
    return dst.at[jnp.where(live, ids, v)].set(merged, mode="drop")
