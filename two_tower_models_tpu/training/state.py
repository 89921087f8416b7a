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


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam, matching the reference driver (train/train.py:179)."""
    return optax.adam(train_cfg.learning_rate)


def create_train_state(
    key: jax.Array, model_cfg: ModelConfig, train_cfg: TrainConfig
) -> TrainState:
    k_params, k_rng = jax.random.split(key)
    params = init_params(k_params, model_cfg)
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
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=k_rng,
    )
