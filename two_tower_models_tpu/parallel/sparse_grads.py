"""Sparse cross-chip embedding-table gradients (VERDICT r3 #2).

A train batch touches O(B·(1+H) + B') rows of a V-row id table — ~139k of 4M
at the production anchor (BASELINE.md) — yet the explicit sharded step used
to all-reduce the DENSE [V_shard, D] table grad over the ``data`` axis:
1.6 GB/chip/step at 4M rows / model=2, capping predicted scaling efficiency
at 44% (scripts/scaling_prediction.py).  This module replaces that psum with
a dedup'd sparse exchange:

  1. each data chip lists the table ids its OWN batch rows touched (a static
     function of the batch schema — user_id for the user table; item_id +
     history ids + mixed-negative ids for the item table);
  2. sorts them, masks duplicates and rows owned by other ``model`` shards,
     and extracts the surviving rows from its local dense autodiff grad
     (dedup is a correctness requirement: the dense grad row already SUMS a
     duplicated id's contributions, so re-extracting it per occurrence would
     double-count);
  3. all_gathers (ids, rows) over ``data`` — (n_d−1)·U·(D+1)·4 wire bytes vs
     the dense all-reduce's 2·(n_d−1)/n_d·V_shard·D·4;
  4. scatter-adds every chip's rows into one [V_shard, D] grad, through the
     O(updates) Pallas kernel inside its window (nn.layers.scatter_add_rows).

The result equals the dense psum up to f32 summation order (parity-tested on
the virtual mesh, tests/test_sparse_grads.py).  The decision is per-table,
static, and shared with the comms accounting (``sparse_exchange_wins``), so
``tests/test_comms.py`` can validate the predicted bytes against the
collectives XLA actually emits.

Reference surface: the reference replicates its ``nn.Embedding`` tables on
one device (two_tower_base_retrieval.py:70, 97); this is what those tables
need at production scale.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import ModelConfig
from two_tower_models_tpu.nn.layers import scatter_add_rows


def table_touched_ids(model_cfg: ModelConfig, batch) -> Dict[str, jnp.ndarray]:
    """Per-table vector of GLOBAL ids this chip's batch rows touch (static
    shape; duplicates allowed — the exchange dedups).  Must list every id
    whose lookup feeds the loss: the table grad is exactly the sum of the
    lookup VJP's scatter rows, so completeness here is loss-path completeness
    (the parity test guards it)."""
    item_ids = [batch.item_id.reshape(-1)]
    if model_cfg.history_encoder is not None:
        item_ids.append(batch.user_history.reshape(-1))
    if batch.neg_item_id is not None:
        item_ids.append(batch.neg_item_id.reshape(-1))
    return {
        "user_id_table": batch.user_id.reshape(-1),
        "item_id_table": jnp.concatenate(item_ids),
    }


def touched_id_counts(model_cfg: ModelConfig, b_local: int) -> Dict[str, int]:
    """Shape-only mirror of ``table_touched_ids`` for the comms accounting
    (same formula, no batch needed; consistency asserted in
    tests/test_sparse_grads.py)."""
    h = model_cfg.history_len if model_cfg.history_encoder is not None else 0
    return {
        "user_id_table": b_local,
        "item_id_table": b_local * (1 + h) + int(model_cfg.mixed_negatives),
    }


def sparse_exchange_wins(
    u_ids: int, v_shard: int, dim: int, n_data: int
) -> bool:
    """Static per-table decision: does the sparse exchange move fewer wire
    bytes than the dense grad all-reduce?  Ring-algorithm costs per chip:

      dense:  all_reduce([V_shard, D] f32)        = 2·(n−1)/n·V_shard·D·4
      sparse: all_gather([U] i32) + ([U, D] f32)  = (n−1)·U·(D+1)·4

    i.e. sparse wins iff U·(D+1)·n < 2·V_shard·D.  At the production anchor
    (U≈139k, V_shard=2M, D=64, n=4) that's a 7.4x wire reduction; at bench
    scale (V=65k) the item table stays dense and the user table (U=B_l)
    still flips sparse."""
    return u_ids * (dim + 1) * n_data < 2 * v_shard * dim


def sparse_table_grad_names(
    model_cfg: ModelConfig, mesh_cfg, batch, params
) -> set:
    """Tables whose data-axis grad reduction should run sparse, per
    ``MeshConfig.sparse_table_grads`` ("auto"/"on"/"off").  Shapes here are
    the PER-CHIP ones (call inside shard_map); packed leaves compare on
    LOGICAL rows (the exchange moves logical [U, D] rows either way)."""
    mode = mesh_cfg.sparse_table_grads
    if mode == "off" or mesh_cfg.data <= 1:
        return set()
    if mode not in ("auto", "on"):
        raise ValueError(f"sparse_table_grads must be auto|on|off, got {mode!r}")
    ids_map = table_touched_ids(model_cfg, batch)
    dims = {
        "user_id_table": model_cfg.user_id_embedding_dim,
        "item_id_table": model_cfg.item_id_embedding_dim,
    }
    out = set()
    for name, ids in ids_map.items():
        table, dim = params[name], dims[name]
        pack = table.shape[-1] // dim
        if mode == "on" or sparse_exchange_wins(
            ids.size, table.shape[0] * pack, dim, mesh_cfg.data
        ):
            out.add(name)
    return out


def sparse_grad_exchange(
    g_dense: jnp.ndarray,  # this chip's local table grad (plain or packed)
    ids: jnp.ndarray,  # [U] global ids touched by this chip's batch
    data_axis: str,
    model_axis: str,
    dim: int | None = None,  # logical embedding dim (packed leaves)
) -> jnp.ndarray:
    """Equivalent of ``psum(g_dense, data_axis)`` for a row-sharded table
    whose per-chip grad is supported on ``ids``.  Runs inside shard_map with
    both mesh axes bound.  Packed leaves ([V_s/P, P·D], nn.packed_table)
    exchange LOGICAL [U, D] rows — same wire bytes as plain storage — and
    scatter back through the lane-block widening (exact zeros, bit-identical
    sums)."""
    dim = dim or g_dense.shape[-1]
    pack = g_dense.shape[-1] // dim
    v_shard = g_dense.shape[0] * pack  # logical rows this shard owns
    offset = jax.lax.axis_index(model_axis) * v_shard

    s = jnp.sort(ids.reshape(-1))
    first = jnp.concatenate(
        [jnp.ones((1,), bool), s[1:] != s[:-1]]
    )  # first occurrence of each distinct id
    local = s - offset
    owned = (local >= 0) & (local < v_shard)
    keep = first & owned
    safe = jnp.where(keep, local, 0).astype(jnp.int32)
    if pack == 1:
        rows = jnp.take(g_dense, safe, axis=0)
    else:
        from two_tower_models_tpu.nn.packed_table import _packed_gather

        rows = _packed_gather(g_dense, safe, dim)
    rows = rows * keep[:, None].astype(g_dense.dtype)
    # dropped slots: zero row AND out-of-range sentinel id (both scatter
    # routes drop out-of-range ids — belt and braces)
    ex_ids = jnp.where(keep, safe, v_shard).astype(jnp.int32)

    gids = jax.lax.all_gather(ex_ids, data_axis, tiled=True)  # [n_d·U]
    grows = jax.lax.all_gather(rows, data_axis, tiled=True)  # [n_d·U, D]
    if pack == 1:
        out = scatter_add_rows(gids, grows, v_shard)
    else:
        from two_tower_models_tpu.nn.packed_table import packed_rows_scatter_add

        out = packed_rows_scatter_add(
            gids, grows, g_dense.shape[0], g_dense.shape[-1]
        )
    return out.astype(g_dense.dtype)
