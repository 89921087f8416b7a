"""Row-sparse (lazy-Adam) embedding-table updates.

Dense training differentiates through the table lookup, which materializes a
full [V, D] gradient (plus a full Adam moment pass) every step — at 4M-row
tables that is >6 GB of dense traffic and an O(V) scatter for ~139k touched
rows, and the step collapses to ~113 ms (BASELINE.md large-table table).
This module makes the table update O(touched rows):

  1. ``build_minibatch``: sort each sparse table's batch ids, gather the
     touched rows into a MINITABLE [N, D] (N = lookups, duplicates
     included), and remap the batch's id fields to minitable slots via
     ``searchsorted`` — every duplicate id maps to its FIRST slot, so
     autodiff accumulates that id's whole gradient there and duplicate
     slots receive exactly zero gradient.
  2. The unchanged model/loss runs on {params with table := minitable} —
     its lookup backward scatters into [N, D], never [V, D].
  3. ``apply_sparse_adam``: Adam on the touched rows only (gather mu/nu
     rows, update, write back with duplicate slots DROPPED via
     out-of-bounds indices), with global-step bias correction.

SEMANTICS — this is *lazy* Adam (the industry-standard large-table variant:
torch SparseAdam, TF lazy_adam): moments of untouched rows do not decay
between the steps that touch them, so trajectories differ slightly from
dense Adam for rows with intermittent gradients (rows touched every step
match exactly; see tests/test_sparse_tables.py).  Off by default
(``TrainConfig.lazy_table_adam``); the dense path remains reference-exact.

The reference has no counterpart (its tables are tiny, replicated
``nn.Embedding``s — two_tower_base_retrieval.py:70, 97); this is part of
the at-scale systems layer.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import ModelConfig, TrainConfig
from two_tower_models_tpu.models.two_tower import Batch

SPARSE_TABLE_KEYS = ("user_id_table", "item_id_table")


def split_params(params: Dict) -> Tuple[Dict, Dict]:
    """(dense subtree, sparse-table subtree) — tables are top-level keys."""
    dense = {k: v for k, v in params.items() if k not in SPARSE_TABLE_KEYS}
    tables = {k: params[k] for k in SPARSE_TABLE_KEYS if k in params}
    return dense, tables


def init_table_moments(params: Dict) -> Dict:
    """Adam moment buffers for the sparse tables (our own, outside optax)."""
    _, tables = split_params(params)
    zeros = lambda: jax.tree_util.tree_map(
        lambda t: jnp.zeros(t.shape, jnp.float32), tables
    )
    return {"mu": zeros(), "nu": zeros()}


def build_minibatch(
    model_cfg: ModelConfig, params: Dict, batch: Batch
) -> Tuple[Dict, Batch, Dict]:
    """Swap each sparse table for its touched-row minitable and remap the
    batch ids to minitable slots.

    Returns (params2, batch2, meta) where meta[name] = (sorted_ids [N],
    dup_mask [N]) — dup_mask marks slots whose id equals the previous slot's
    (zero gradient by the first-slot remapping; dropped at write-back).
    """
    user_ids = batch.user_id.reshape(-1)
    item_parts = [batch.item_id.reshape(-1)]
    if model_cfg.history_encoder is not None:
        # history ids embed through the ITEM table
        # (two_tower_with_user_history_encoder.py:105)
        item_parts.append(batch.user_history.reshape(-1))
    if batch.neg_item_id is not None:
        # mixed negatives embed through the item table too
        item_parts.append(batch.neg_item_id.reshape(-1))
    item_ids = jnp.concatenate(item_parts)

    params2 = dict(params)
    meta = {}
    dims = {
        "user_id_table": model_cfg.user_id_embedding_dim,
        "item_id_table": model_cfg.item_id_embedding_dim,
    }

    def prep(name, ids):
        """Sort + gather the minitable + remap every original occurrence.

        The remap (occurrence -> FIRST sorted slot of its id) used to be
        ``searchsorted(s, field)`` per field, but XLA lowers searchsorted
        to ~log2(N) serial gather rounds — measured 20 ms for the B*H
        history remap alone at 4M-row tables (scripts/decompose_lazy.py).
        The argsort already knows every occurrence's slot: invert it and
        push each slot to its run's first index (one cummax), which is
        bit-identical to the searchsorted result for present ids.
        """
        from two_tower_models_tpu.nn.packed_table import _packed_gather, is_packed

        n = ids.shape[0]
        order = jnp.argsort(ids)
        s = jnp.take(ids, order)
        dup = jnp.concatenate([jnp.zeros((1,), bool), s[1:] == s[:-1]])
        iota = jnp.arange(n, dtype=jnp.int32)
        first_sorted = jax.lax.cummax(jnp.where(dup, jnp.int32(-1), iota))
        # inverse permutation: argsort of a permutation is its inverse (an
        # int32 sort beats an XLA scatter-SET here)
        inv = jnp.argsort(order)
        remap_all = jnp.take(first_sorted, inv)  # slot per ORIGINAL position
        table = params[name]
        if is_packed(table, dims[name]):
            # minitables are LOGICAL [N, D] rows regardless of storage layout
            params2[name] = _packed_gather(table, s, dims[name])
        else:
            params2[name] = jnp.take(table, s, axis=0)  # [N, D]
        meta[name] = (s, dup)
        return remap_all

    remap_user = prep("user_id_table", user_ids)
    remap_item = prep("item_id_table", item_ids)

    b = batch.item_id.shape[0]
    batch2 = batch._replace(
        user_id=remap_user.reshape(batch.user_id.shape),
        item_id=remap_item[:b],
    )
    off = b
    if model_cfg.history_encoder is not None:
        h = batch.user_history.size
        batch2 = batch2._replace(
            user_history=remap_item[off : off + h].reshape(
                batch.user_history.shape
            )
        )
        off += h
    if batch.neg_item_id is not None:
        batch2 = batch2._replace(
            neg_item_id=remap_item[off:].reshape(batch.neg_item_id.shape)
        )
    return params2, batch2, meta


def apply_sparse_adam(
    table: jnp.ndarray,  # [V, D]
    mu: jnp.ndarray,  # [V, D] f32
    nu: jnp.ndarray,  # [V, D] f32
    mini_rows: jnp.ndarray,  # [N, D] — rows gathered by build_minibatch
    g_mini: jnp.ndarray,  # [N, D] — gradient wrt the minitable
    sorted_ids: jnp.ndarray,  # [N]
    dup_mask: jnp.ndarray,  # [N] bool
    t: jnp.ndarray,  # scalar — global step AFTER this update (optax count)
    train_cfg: TrainConfig,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
):
    """One lazy-Adam update of the touched rows; returns (table, mu, nu).

    Identical math to optax.adam per touched row (bias correction by the
    GLOBAL step, the standard lazy-Adam choice); duplicate slots carry zero
    gradient and are dropped at write-back (their first slot holds the full
    accumulated row gradient).

    Write-back: for 128-lane-packed tables (nn.packed_table) the touched
    rows stream through the O(updates) Pallas in-place writer
    (ops.pallas.rows_write) — XLA's scatter-SET costs O(V) (235 ms
    standalone at 4M rows for 139k updates, BASELINE.md) and was the whole
    reason lazy Adam measured SLOWER than dense in round 2.  Plain tables
    keep the XLA scatter (small-table path).
    """
    d = g_mini.shape[-1]
    g = g_mini.astype(jnp.float32)
    packed = table.shape[-1] != d
    if packed:
        from two_tower_models_tpu.nn.packed_table import _packed_gather

        rows_mu = _packed_gather(mu, sorted_ids, d)
        rows_nu = _packed_gather(nu, sorted_ids, d)
    else:
        rows_mu = jnp.take(mu, sorted_ids, axis=0)
        rows_nu = jnp.take(nu, sorted_ids, axis=0)
    mu2 = b1 * rows_mu + (1.0 - b1) * g
    nu2 = b2 * rows_nu + (1.0 - b2) * (g * g)
    t = t.astype(jnp.float32)
    mu_hat = mu2 / (1.0 - b1**t)
    nu_hat = nu2 / (1.0 - b2**t)
    upd = train_cfg.learning_rate * mu_hat / (jnp.sqrt(nu_hat) + eps)
    new_rows = mini_rows.astype(jnp.float32) - upd

    if packed:
        from two_tower_models_tpu.ops.pallas.rows_write import (
            lane_block_plan,
            merge_rows,
            rows_write,
        )

        pack = table.shape[-1] // d
        # one plan (the searchsorted passes) serves all three row arrays —
        # pids/bits depend only on the id set, not the values
        plan = lane_block_plan(sorted_ids, dup_mask, pack)
        pids, bits = plan[0], plan[1]
        for_each = (
            (table, new_rows.astype(table.dtype)),
            (mu, mu2),
            (nu, nu2),
        )
        out = []
        for dst, rows in for_each:
            vals = merge_rows(plan, sorted_ids, rows)
            out.append(rows_write(dst, pids, bits, vals, block_dim=d))
        return tuple(out)

    v = table.shape[0]
    w = jnp.where(dup_mask, v, sorted_ids)  # out-of-bounds => dropped
    table = table.at[w].set(new_rows.astype(table.dtype), mode="drop")
    mu = mu.at[w].set(mu2, mode="drop")
    nu = nu.at[w].set(nu2, mode="drop")
    return table, mu, nu
