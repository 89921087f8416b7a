"""128-lane-packed embedding-table storage for very large single-chip tables.

Why this exists (round-2 root cause, BASELINE.md "large-table scaling"):
Mosaic assigns a Pallas kernel's [V, D] output the T(8,128) tiled layout.
For D < 128 that layout is LANE-PADDED (a [V, 64] f32 output occupies
[V, 128] — 2x), and XLA's layout propagation then materializes 2x-padded
HLO-temp copies of every large array in the consuming cluster: at 2x 4M-row
tables the Adam cluster (params/mu/nu per table) gained ~6 GB of padded
copies and the step OOMed.  Capping the scatter kernel below 2^22 rows
avoided the OOM but left 4M-row training on XLA's O(V) scatter (79 ms/step).

The fix is to make the kernel-facing layout the STORAGE layout: a [V, D]
table with D | 128 packs P = 128/D logical rows into each physical
128-lane row, stored as [ceil(V/P), 128].  That shape's natural XLA layout
IS Mosaic's tiling — zero padding, zero layout conversions, and the Pallas
scatter-add kernel (ops.pallas.scatter_add) applies at ANY table size:

  id v  ->  physical row v // P, lane block (v % P) * D.

Lookups gather the 128-wide physical row and slice the lane block out
(the extra lanes ride along in the same HBM burst); the backward widens
each [*, D] gradient into its lane block of a [*, 128] row (other lanes
exactly zero) and scatter-adds physical rows — bit-identical sums, since
lane blocks of distinct ids are disjoint and zeros add exactly.

Packing is numerics-neutral end to end: Adam is elementwise, padded tail
rows receive zero gradient and never change, and `unpack_table` restores
the logical [V, D] array bit-for-bit (tested).

The reference has no counterpart (its `nn.Embedding` tables are tiny,
two_tower_base_retrieval.py:70, 97); this is at-scale systems work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from two_tower_models_tpu.nn import layers as _layers
from two_tower_models_tpu.nn.layers import _SCATTER_KERNEL_MIN_ROWS

LANES = 128


def pack_factor(dim: int) -> int:
    """How many logical rows share one 128-lane physical row (1 = no pack)."""
    if dim < LANES and LANES % dim == 0:
        return LANES // dim
    return 1


def packed_shape(vocab: int, dim: int):
    p = pack_factor(dim)
    return (-(-vocab // p), dim * p)


def is_packed(table: jnp.ndarray, dim: int) -> bool:
    """A table leaf is packed iff its lane width isn't the logical dim."""
    return table.shape[-1] != dim


def pack_table(table: jnp.ndarray) -> jnp.ndarray:
    """[V, D] -> [ceil(V/P), P*D], padding the tail with zero rows."""
    v, d = table.shape
    p = pack_factor(d)
    if p == 1:
        return table
    vp = -(-v // p) * p
    if vp != v:
        table = jnp.pad(table, ((0, vp - v), (0, 0)))
    return table.reshape(vp // p, p * d)


def unpack_table(packed: jnp.ndarray, vocab: int, dim: int) -> jnp.ndarray:
    """Inverse of pack_table: [Vp/P, P*D] -> [vocab, dim]."""
    if not is_packed(packed, dim):
        return packed
    p = packed.shape[-1] // dim
    return packed.reshape(packed.shape[0] * p, dim)[:vocab]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _plookup_impl(packed, ids, dim: int, dtype_name: str):
    return _plookup_fwd(packed, ids, dim, dtype_name)[0]


def _packed_gather(packed, ids, dim):
    p = packed.shape[-1] // dim
    rows = jnp.take(packed, ids // p, axis=0)  # [..., P*D]
    rows = rows.reshape(*ids.shape, p, dim)
    sub = jnp.take_along_axis(rows, (ids % p)[..., None, None], axis=-2)
    return sub.reshape(*ids.shape, dim)


def _plookup_fwd(packed, ids, dim, dtype_name):
    # Residuals hold ONLY ids (+ static shape info): keeping `packed` alive
    # into the backward would block buffer donation through the train step
    # (same rule as layers._lookup_fwd).
    return _packed_gather(packed, ids, dim), (ids, packed.shape)


def packed_rows_scatter_add(
    ids: jnp.ndarray,  # [N] LOGICAL row ids (may repeat / be out of range)
    rows: jnp.ndarray,  # [N, dim] logical-row values
    rows_p: int,  # physical rows of the packed output
    width: int,  # physical lane width (P * dim)
) -> jnp.ndarray:
    """out f32 [rows_p, width] with rows[n] added into logical row ids[n]'s
    lane block.  One_hot widening keeps the other lanes exact zeros, so sums
    are bit-identical to the plain-layout scatter; out-of-range logical ids
    map to out-of-range physical rows and are dropped by both routes."""
    dim = rows.shape[-1]
    p = width // dim
    ids_flat = ids.reshape(-1)
    gf = rows.reshape(-1, dim).astype(jnp.float32)
    oh = jax.nn.one_hot(ids_flat % p, p, dtype=jnp.float32)  # [N, P]
    g128 = (oh[:, :, None] * gf[:, None, :]).reshape(-1, width)
    prow = jnp.where(
        (ids_flat >= 0) & (ids_flat < rows_p * p), ids_flat // p, rows_p
    )
    # The packed layout neutralizes the layout-infection issue, so the O(N)
    # Pallas scatter applies with NO upper size cap; XLA's O(V) scatter
    # stays for small tables (where it wins) and non-TPU backends.
    if (
        _layers._scatter_kernel_enabled
        and rows_p * p >= _SCATTER_KERNEL_MIN_ROWS
        and jax.default_backend() == "tpu"
    ):
        from two_tower_models_tpu.ops.pallas.scatter_add import rows_scatter_add

        return rows_scatter_add(prow, g128, rows_p)
    return jnp.zeros((rows_p, width), jnp.float32).at[prow].add(g128)


def _plookup_bwd(dim, dtype_name, res, g):
    ids, pshape = res
    rows_p, width = pshape
    dpacked = packed_rows_scatter_add(ids, g.reshape(-1, dim), rows_p, width)
    return dpacked.astype(jnp.dtype(dtype_name)), None


_plookup_impl.defvjp(_plookup_fwd, _plookup_bwd)


def packed_embedding_lookup(packed: jnp.ndarray, ids: jnp.ndarray, dim: int):
    """Lookup logical [*, dim] rows from a 128-lane-packed table."""
    return _plookup_impl(packed, ids, dim, str(packed.dtype))


def table_lookup(table: jnp.ndarray, ids: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Dispatch on the storage layout: packed tables route through the packed
    gather/scatter VJP, plain tables through nn.layers.embedding_lookup."""
    from two_tower_models_tpu.nn.layers import embedding_lookup

    if is_packed(table, dim):
        return packed_embedding_lookup(table, ids, dim)
    return embedding_lookup(table, ids)
