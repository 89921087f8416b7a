"""Train state: one explicit pytree holding everything that evolves.

The reference scatters mutable state across module attributes, some invisible
to ``state_dict`` (SURVEY §2.4).  Here params, optimizer state, step count,
and the RNG key live in a single NamedTuple — donated through the jitted step
(buffer reuse), annotated with shardings, and checkpointed atomically.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from two_tower_models_tpu.config import ModelConfig, TrainConfig
from two_tower_models_tpu.models.two_tower import init_params


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Dict
    opt_state: Any
    rng: jax.Array
    # streaming item-frequency estimator (training.freq_estimator), present
    # only with TrainConfig.streaming_logq — None otherwise (absent leaf)
    logq_state: Any = None


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam, matching the reference driver (train/train.py:179); optional
    global-norm clipping upstream of it (TrainConfig.grad_clip_norm)."""
    adam = optax.adam(train_cfg.learning_rate)
    clip = getattr(train_cfg, "grad_clip_norm", None)
    if clip:
        if train_cfg.fused_adam:
            raise ValueError(
                "grad_clip_norm is incompatible with fused_adam (the kernel "
                "hardcodes plain-Adam semantics)"
            )
        if train_cfg.lazy_table_adam:
            raise NotImplementedError(
                "grad_clip_norm with lazy_table_adam would clip on the "
                "dense subtree's norm only (table grads live outside "
                "optax) — use the dense path"
            )
        return optax.chain(optax.clip_by_global_norm(clip), adam)
    return adam


def maybe_pack_tables(
    params: Dict,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    model_shards: int = 1,
) -> Dict:
    """Swap big id tables to 128-lane-packed storage (nn.packed_table) when
    eligible.  Numerics-neutral; model code dispatches on the leaf layout.
    On a mesh (``model_shards`` > 1) a table packs only if its packed
    PHYSICAL rows split evenly over the model axis — packing maps logical id
    v to physical row v // P, so each shard's physical range stays a
    contiguous logical range and the explicit lookup exchange works
    unchanged (parallel.embedding)."""
    from two_tower_models_tpu.nn.packed_table import (
        pack_factor,
        pack_table,
        packed_shape,
    )

    if not train_cfg.pack_tables:
        return params
    out = dict(params)
    for name, vocab, dim in (
        ("user_id_table", model_cfg.user_id_hash_size, model_cfg.user_id_embedding_dim),
        ("item_id_table", model_cfg.item_id_hash_size, model_cfg.item_id_embedding_dim),
    ):
        if vocab >= train_cfg.pack_tables_min_rows and pack_factor(dim) > 1:
            if packed_shape(vocab, dim)[0] % model_shards:
                continue  # would not row-shard evenly; keep plain storage
            out[name] = pack_table(out[name])
    return out


def create_train_state(
    key: jax.Array,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    pack: bool = True,
    model_shards: int = 1,
    catalog_size: int | None = None,
) -> TrainState:
    """``pack=False`` keeps tables in plain [V, D] storage.  Both mesh paths
    row-shard packed storage (the explicit shard_map path exchanges in
    logical rows; GSPMD partitions the packed gather/scatter directly) —
    pass ``model_shards`` = the model-axis size so packing skips tables whose
    packed shape wouldn't split evenly.  The lazy-Adam path composes with
    packing: minitables gather logically and the write-back streams through
    the Pallas in-place row writer (training.sparse_tables)."""
    k_params, k_rng = jax.random.split(key)
    params = init_params(k_params, model_cfg)
    if pack:
        params = maybe_pack_tables(params, model_cfg, train_cfg, model_shards)
    tx = make_optimizer(train_cfg)
    if train_cfg.lazy_table_adam:
        # Sparse tables keep their Adam moments outside optax (row-gathered
        # updates, training.sparse_tables); optax covers the dense subtree.
        from two_tower_models_tpu.training.sparse_tables import (
            init_table_moments,
            split_params,
        )

        dense, _ = split_params(params)
        opt_state = {"dense": tx.init(dense), "tables": init_table_moments(params)}
    else:
        opt_state = tx.init(params)
    logq_state = None
    if train_cfg.streaming_logq:
        if not model_cfg.logq_correction:
            raise ValueError(
                "streaming_logq estimates frequencies FOR the logQ "
                "correction — set ModelConfig.logq_correction too"
            )
        if catalog_size is None:
            raise ValueError(
                "streaming_logq needs catalog_size (the number of catalog "
                "items the estimator tracks)"
            )
        from two_tower_models_tpu.training.freq_estimator import (
            init_freq_estimator,
        )

        logq_state = init_freq_estimator(catalog_size)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=k_rng,
        logq_state=logq_state,
    )
