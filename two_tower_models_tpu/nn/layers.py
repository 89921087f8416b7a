"""Minimal pytree NN primitives.

Params are plain nested dicts of ``jnp.ndarray`` — fully transparent to
``jax.tree_util``, ``optax``, ``orbax``, and ``NamedSharding`` annotation.
No module framework: every layer is an ``init(key, ...) -> params`` plus an
``apply(params, x) -> y`` pair of pure functions, so the whole model stays a
single traced computation under ``jit``/``pjit``.

Initialization follows the same distributions PyTorch defaults to (the
reference relies on them implicitly): Linear weights/biases ~
U(-1/sqrt(fan_in), 1/sqrt(fan_in)); Embedding ~ N(0, 1).  This keeps loss
curves statistically comparable with the reference without copying any code.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Sequence

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    """Dense layer params. Weight stored [in_dim, out_dim] (x @ W + b) — the
    natural layout for XLA; no transpose at apply time."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, jnp.float32))
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear_apply(params: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + b.astype(y.dtype)


def mlp_init(key, dims: Sequence[int], dtype=jnp.float32) -> list:
    """MLP with ReLU between layers (reference feature arch:
    two_tower_base_retrieval.py:76-80 = Linear(IU,256)/ReLU/Linear(256,DU))."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        linear_init(k, din, dout, dtype)
        for k, din, dout in zip(keys, dims[:-1], dims[1:])
    ]


def mlp_apply(params: list, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    for i, layer in enumerate(params):
        x = linear_apply(layer, x, compute_dtype)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def embedding_init(key, vocab: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """ID-embedding table ~ N(0,1) (torch nn.Embedding default)."""
    return jax.random.normal(key, (vocab, dim), dtype)


# XLA's scatter-add lowering costs O(table size), not O(updates) — fine at
# 65k rows (~1.7ms/step at bench scale) but 27ms at 1M for the SAME update
# count.  In this window the custom Pallas scatter (ops.pallas.scatter_add,
# sorted-updates + per-tile ranges) takes over: 4.3x faster at 1M rows
# (BASELINE.md).  Below the window XLA wins outright.  Above it (root-caused
# round 2): the kernel's D=64 output takes Mosaic's T(8,128) tiled layout,
# and layout propagation then forces 2x-PADDED HLO-temp copies of the
# table's params/mu/nu through the whole Adam cluster — +6 GB at 2x 4M-row
# tables, over a 16 GB chip (the grad buffer itself is aliased and tight).
# Tables that size belong on the row-sharded multi-chip path (parallel/),
# where per-shard tables re-enter this window; TrainConfig.lazy_table_adam
# is the single-chip alternative (O(touched-rows) semantics).
_SCATTER_KERNEL_MIN_ROWS = 1 << 18
_SCATTER_KERNEL_MAX_ROWS = 1 << 22


# Trace-time switch: the GSPMD train step traces the single-chip program
# under XLA's SPMD partitioner, which cannot partition pallas_calls — it
# disables the scatter kernel while tracing (parallel.train_step).
_scatter_kernel_enabled = True


@contextlib.contextmanager
def disable_scatter_kernel():
    global _scatter_kernel_enabled
    prev = _scatter_kernel_enabled
    _scatter_kernel_enabled = False
    try:
        yield
    finally:
        _scatter_kernel_enabled = prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_impl(table, ids, vocab: int, dtype_name: str):
    return jnp.take(table, ids, axis=0)


def _lookup_fwd(table, ids, vocab, dtype_name):
    # Residuals hold ONLY ids: keeping `table` alive into the backward would
    # block XLA from donating the param buffer through the train step
    # (measured: ~12ms/step of param+moment copies at 2x 1M-row tables).
    return jnp.take(table, ids, axis=0), ids


def scatter_add_rows(ids: jnp.ndarray, rows: jnp.ndarray, vocab: int) -> jnp.ndarray:
    """out[v] = Σ_{n: ids[n]==v} rows[n], out f32 [vocab, D].  Routes through
    the O(updates) Pallas kernel inside its validated table-size window on
    TPU (XLA's scatter-add costs O(vocab) — BASELINE.md), XLA elsewhere.
    Out-of-range ids are dropped on both routes (usable as pad sentinels)."""
    dim = rows.shape[-1]
    if (
        _scatter_kernel_enabled
        and _SCATTER_KERNEL_MIN_ROWS <= vocab < _SCATTER_KERNEL_MAX_ROWS
        and jax.default_backend() == "tpu"
    ):
        from two_tower_models_tpu.ops.pallas.scatter_add import rows_scatter_add

        return rows_scatter_add(
            ids.reshape(-1), rows.reshape(-1, dim).astype(jnp.float32), vocab
        )
    return (
        jnp.zeros((vocab, dim), jnp.float32)
        .at[ids.reshape(-1)]
        .add(rows.reshape(-1, dim).astype(jnp.float32))
    )


def _lookup_bwd(vocab, dtype_name, ids, g):
    dtable = scatter_add_rows(ids, g, vocab)
    return dtable.astype(jnp.dtype(dtype_name)), None


_lookup_impl.defvjp(_lookup_fwd, _lookup_bwd)


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Replicated-table lookup.  For row-sharded tables use
    two_tower_models_tpu.parallel.embedding.sharded_embedding_lookup.

    Custom VJP: the adjoint scatter-add routes through the update-count-
    scaling Pallas kernel for large tables (see _SCATTER_KERNEL_MIN_ROWS)."""
    return _lookup_impl(table, ids, table.shape[0], str(table.dtype))
