"""Test harness: force an 8-virtual-device CPU backend before JAX imports.

Multi-chip sharding paths (mesh, shard_map collectives, sharded embedding
lookup, global-negative loss) are exercised on fake devices — no TPU needed —
mirroring SURVEY §4's test strategy.
"""

import os

# Unconditional: the container presets JAX_PLATFORMS=axon (one real TPU);
# tests run on the 8-virtual-device CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config update
# wins over the plugin.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from two_tower_models_tpu.config import ModelConfig  # noqa: E402
from two_tower_models_tpu.models.two_tower import Batch  # noqa: E402


def make_batch(
    key,
    cfg: ModelConfig,
    batch_size: int = 32,
    num_label_cols: int | None = None,
) -> Batch:
    """Random batch with valid id ranges and [B, T] labels."""
    ks = jax.random.split(key, 7)
    t = num_label_cols or cfg.num_tasks
    return Batch(
        user_id=jax.random.randint(ks[0], (batch_size,), 0, cfg.user_id_hash_size),
        user_features=jax.random.normal(ks[1], (batch_size, cfg.user_features_size)),
        user_history=jax.random.randint(
            ks[2], (batch_size, cfg.history_len), 0, cfg.item_id_hash_size
        ),
        item_id=jax.random.randint(ks[3], (batch_size,), 0, cfg.item_id_hash_size),
        item_features=jax.random.normal(ks[4], (batch_size, cfg.item_features_size)),
        position=jax.random.randint(ks[5], (batch_size,), 0, cfg.position_table_size),
        labels=jax.random.bernoulli(ks[6], 0.5, (batch_size, t)).astype(np.float32),
    )


@pytest.fixture
def rng():
    return jax.random.key(42)
