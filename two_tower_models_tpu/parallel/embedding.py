"""Row-sharded embedding lookup with explicit collectives.

The reference replicates its ``nn.Embedding`` tables on one device
(two_tower_base_retrieval.py:70, 97).  At production scale the tables are the
model — they must shard.  Two lookup strategies, both for use inside
``shard_map`` over the ``model`` axis:

``psum_lookup`` (default): every device gathers the rows it owns (others
contribute zeros) and a single ``psum`` combines.  Comms: one [B, D]
all-reduce over ICI.  Dense, collective-friendly, trivially differentiable —
the backward pass is the transpose gather-add, which XLA derives.  Best when
B*D is modest (the retrieval regime: D <= a few hundred).

``all_to_all_lookup``: bucket ids by owner shard, exchange id buckets
(all_to_all [n, B] ints), gather locally, exchange embeddings back
(all_to_all [n, B, D]).  Comms: 2 small all_to_alls instead of a [B, D]
psum — wins when the ``model`` axis is wide (psum moves n*B*D total,
all_to_all moves ~2*B*D).  Capacity-bounded: each shard answers up to B ids
per peer (exact here since every peer sends exactly its padded bucket).

Both strategies accept 128-lane-PACKED shards (nn.packed_table: [V/(n·P),
P·D] physical rows; pass the logical ``dim``): packing maps logical id v to
physical row v // P, so a contiguous logical range shards as a contiguous
physical range and the owner arithmetic works in LOGICAL rows throughout.
Local gathers route through ``nn.packed_table.table_lookup`` (the custom-VJP
dispatch), so the backward scatter-add uses the O(updates) Pallas kernel in
its window on either layout instead of ``jnp.take``'s O(V_shard) XLA
scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from two_tower_models_tpu.nn.packed_table import table_lookup


def _logical_rows(table_shard: jnp.ndarray, dim: int) -> int:
    """Logical rows this shard holds (== physical rows unless packed)."""
    return table_shard.shape[0] * (table_shard.shape[-1] // dim)


def psum_lookup(
    table_shard: jnp.ndarray,  # [V/n, D] (or packed [V/(n·P), P·D])
    ids: jnp.ndarray,  # [B] global ids, replicated along the shard axis
    axis_name: str,
    dim: int | None = None,  # logical embedding dim (defaults to lane width)
) -> jnp.ndarray:
    """Masked local gather + psum.  Returns [B, dim] on every shard."""
    dim = dim or table_shard.shape[-1]
    shard = jax.lax.axis_index(axis_name)
    v_local = _logical_rows(table_shard, dim)
    local = ids - shard * v_local
    valid = (local >= 0) & (local < v_local)
    safe = jnp.where(valid, local, 0)
    rows = table_lookup(table_shard, safe, dim)  # [B, dim]
    rows = jnp.where(valid[:, None], rows, jnp.zeros_like(rows))
    return jax.lax.psum(rows, axis_name)


def all_to_all_lookup(
    table_shard: jnp.ndarray,  # [V/n, D] (or packed [V/(n·P), P·D])
    ids: jnp.ndarray,  # [B] global ids, replicated along the shard axis
    axis_name: str,
    dim: int | None = None,  # logical embedding dim (defaults to lane width)
) -> jnp.ndarray:
    """Owner-bucketed all-to-all exchange.  Returns [B, D] on every shard.

    Steps (all static shapes; sort-based bucketing keeps it XLA-friendly):
      1. owner[b] = ids[b] // (V/n)
      2. stable-sort ids by owner -> contiguous buckets, padded to B each
         (buckets can't overflow: total ids == B).
      3. all_to_all the [n, B] request matrix: shard s receives the ids each
         peer wants from s.
      4. local gather answers them: [n, B, D].
      5. all_to_all back + unsort.
    """
    dim = dim or table_shard.shape[-1]
    n = jax.lax.axis_size(axis_name)
    B = ids.shape[0]
    v_local = _logical_rows(table_shard, dim)

    owner = jnp.clip(ids // v_local, 0, n - 1)  # [B]
    order = jnp.argsort(owner, stable=True)  # positions sorted by owner
    sorted_ids = ids[order]
    sorted_owner = owner[order]

    # Slot each sorted id into its owner's B-wide request row.
    # rank within bucket = sorted position - first position of that owner
    # (owners are contiguous after the stable sort).
    first_pos = jnp.searchsorted(sorted_owner, sorted_owner, side="left")
    rank = jnp.arange(B) - first_pos  # [B]
    req = jnp.full((n, B), 0, dtype=ids.dtype)
    req = req.at[sorted_owner, rank].set(sorted_ids)
    req_mask = jnp.zeros((n, B), jnp.bool_).at[sorted_owner, rank].set(True)

    # 3. exchange requests: recv[p, :] = ids peer p wants from me.
    recv = jax.lax.all_to_all(req, axis_name, split_axis=0, concat_axis=0)
    recv_mask = jax.lax.all_to_all(req_mask, axis_name, split_axis=0, concat_axis=0)

    # 4. answer with local rows.
    shard = jax.lax.axis_index(axis_name)
    local_idx = jnp.clip(recv - shard * v_local, 0, v_local - 1)
    answers = table_lookup(table_shard, local_idx.reshape(-1), dim).reshape(
        n, B, -1
    )
    answers = jnp.where(recv_mask[:, :, None], answers, 0)

    # 5. send back: my row p of answers returns to peer p.
    returned = jax.lax.all_to_all(answers, axis_name, split_axis=0, concat_axis=0)
    # returned[p, j] = embedding for my request row p slot j.
    gathered_sorted = returned[sorted_owner, rank]  # [B, D]

    # unsort to original batch order.
    out = jnp.zeros_like(gathered_sorted).at[order].set(gathered_sorted)
    return out


def sharded_embedding_lookup(
    table_shard: jnp.ndarray,
    ids: jnp.ndarray,
    axis_name: str,
    strategy: str = "psum",
    dim: int | None = None,
) -> jnp.ndarray:
    if strategy == "psum":
        return psum_lookup(table_shard, ids, axis_name, dim)
    if strategy == "all_to_all":
        return all_to_all_lookup(table_shard, ids, axis_name, dim)
    raise ValueError(f"unknown lookup strategy {strategy!r}")
