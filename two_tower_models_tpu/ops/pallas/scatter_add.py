"""Row scatter-add that scales with the UPDATE count, not the table size.

The embedding-table backward reduces N looked-up-row gradients into a
[V, D] table gradient.  XLA:TPU's scatter-add lowering pays a cost
proportional to V (measured: 1.7 ms at V=65k but 27 ms at V=1M and ~50 ms
at V=4M for the SAME 131k updates — BASELINE.md), which makes large-table
training scatter-bound.  This kernel restores O(N + V_write) scaling:

  host-side (XLA) prep:  sort ids, gather rows into sorted order, and
  binary-search each table tile's [start, end) range in the sorted ids;
  kernel:  grid over table tiles; each program zeroes its tile and streams
  ONLY its own sorted-update range from HBM (dynamic-offset chunked DMA,
  ids to SMEM for scalar indexing, rows to VMEM), applying row += update.

Cost: one zeros-write of the dense gradient (unavoidable — the optimizer
consumes a dense table grad) + ~N row-adds + the sort.  Used by
``embedding_lookup``'s VJP above a table-size threshold; the plain XLA
scatter stays for small tables where it is faster.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_tower_models_tpu.ops.pallas.fused_softmax import _interpret

# Sorted ids DMA in _CHUNK blocks (1024 = Mosaic's HBM tiling for 1-D
# int32 — dynamic DMA offsets/sizes must align to it; 4 KB each, cheap);
# update ROWS DMA in _SUB-row pieces so sparse tiles move only live data.
_CHUNK = 1024
_SUB = 128


def _kernel(
    starts_ref,  # SMEM [n_tiles + 1] int32 (scalar prefetch)
    ids_ref,  # HBM [Np] int32, sorted
    rows_ref,  # HBM [Np, D] f32, in sorted-id order
    init_ref,  # HBM [Vp, D] f32 — zeros, ALIASED to the output (never read;
    #            the alias stops Mosaic allocating a separate lane-padded
    #            [Vp, 128] buffer, which doubled HBM and blocked >2^22 rows)
    out_ref,  # VMEM [tile_v, D] f32 — this program's table tile
    ids_smem,  # SMEM [CHUNK] int32 scratch
    rows_vmem,  # VMEM [CHUNK, D] f32 scratch
    sem_ids,
    sem_rows,
    *,
    tile_v: int,
):
    i = pl.program_id(0)
    base = i * tile_v
    start = starts_ref[i]
    end = starts_ref[i + 1]
    out_ref[...] = jnp.zeros_like(out_ref)

    # DMA offsets must be _CHUNK-aligned: start from the aligned floor of
    # `start` and guard each row against the true [start, end) range.
    a0 = (start // _CHUNK) * _CHUNK

    d = out_ref.shape[-1]

    def chunk_body(c, _):
        off = a0 + c * _CHUNK
        cp_ids = pltpu.make_async_copy(
            ids_ref.at[pl.ds(off, _CHUNK)], ids_smem, sem_ids
        )
        cp_ids.start()
        cp_ids.wait()

        # Rows stream in _SUB-row pieces so a sparse tile (large V: few live
        # rows per tile) doesn't DMA a full chunk of dead rows.
        def sub_body(s, _):
            soff = off + s * _SUB
            lo = jnp.maximum(start, soff)
            hi = jnp.minimum(end, soff + _SUB)

            @pl.when(hi > lo)
            def _live():
                cp_rows = pltpu.make_async_copy(
                    rows_ref.at[pl.ds(soff, _SUB), :], rows_vmem, sem_rows
                )
                cp_rows.start()
                cp_rows.wait()

                def row_body(k, _):
                    # smem holds ids[off:off+_CHUNK]; vmem rows[soff:soff+_SUB]
                    r = ids_smem[s * _SUB + k] - base
                    # rows scratch is lane-padded to 128 (DMA alignment);
                    # slice the VALUE back to the true row width.
                    out_ref[pl.ds(r, 1), :] += rows_vmem[pl.ds(k, 1), :][:, :d]
                    return 0

                jax.lax.fori_loop(lo - soff, hi - soff, row_body, 0)

            return 0

        jax.lax.fori_loop(0, _CHUNK // _SUB, sub_body, 0)
        return 0

    n_chunks = jnp.where(end > start, pl.cdiv(end - a0, _CHUNK), 0)
    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)


def rows_scatter_add(
    ids: jnp.ndarray,  # [N] int32, values in [0, num_rows)
    rows: jnp.ndarray,  # [N, D] f32
    num_rows: int,
    tile_v: int = 2048,
) -> jnp.ndarray:
    """out[v] = sum over {n : ids[n] == v} of rows[n]; out is [num_rows, D]."""
    n, d = rows.shape
    dp = -(-d // 128) * 128  # DMA'd slices need 128-lane alignment
    order = jnp.argsort(ids)
    s_ids = ids[order].astype(jnp.int32)
    s_rows = rows[order].astype(jnp.float32)
    # Pad rows so any in-range chunked DMA stays in bounds (the [start, end)
    # guards skip padded entries) and to the lane-aligned width.
    s_ids = jnp.pad(s_ids, (0, _CHUNK), constant_values=jnp.int32(0))
    s_rows = jnp.pad(s_rows, ((0, _CHUNK), (0, dp - d)))

    vp = -(-num_rows // tile_v) * tile_v
    n_tiles = vp // tile_v
    boundaries = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_v
    starts = jnp.searchsorted(s_ids[:n], boundaries, side="left").astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_v=tile_v),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # sorted ids (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # sorted rows (HBM)
                pl.BlockSpec(memory_space=pl.ANY),  # zeros, aliased to out
            ],
            out_specs=pl.BlockSpec(
                (tile_v, d), lambda i, starts: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.SMEM((_CHUNK,), jnp.int32),
                pltpu.VMEM((_SUB, dp), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((vp, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        # Alias the zeros operand into the output: the kernel fully rewrites
        # every tile it visits (zeros + adds), and the alias lets the output
        # reuse XLA's tight [Vp, D] buffer instead of a fresh Mosaic
        # allocation (lane-padded to [Vp, 128] — 2x HBM).  Operand index 3 =
        # after the scalar-prefetch arg, ids, and rows.
        input_output_aliases={3: 0},
        interpret=_interpret(),
    )(starts, s_ids, s_rows, jnp.zeros((vp, d), jnp.float32))
    return out[:num_rows]


def rows_scatter_add_reference(ids, rows, num_rows):
    """Plain XLA scatter (for parity tests and the small-table fast path)."""
    return (
        jnp.zeros((num_rows, rows.shape[-1]), jnp.float32)
        .at[ids]
        .add(rows.astype(jnp.float32))
    )
