"""Sparse cross-chip table gradients (parallel.sparse_grads, VERDICT r3 #2).

The dedup'd (touched ids, grad rows) all_gather exchange must produce the
same training trajectory as the dense [V_shard, D] grad psum it replaces —
verified end to end on the virtual 8-device mesh — and its static byte
accounting must agree with the formula the train step actually uses."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_batch
from two_tower_models_tpu.config import (
    Debias,
    HistoryEncoderConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from two_tower_models_tpu.parallel.mesh import make_mesh
from two_tower_models_tpu.parallel.sharding import shard_state
from two_tower_models_tpu.parallel.train_step import make_sharded_train_step
from two_tower_models_tpu.parallel.sparse_grads import (
    sparse_exchange_wins,
    table_touched_ids,
    touched_id_counts,
)
from two_tower_models_tpu.training.data import extend_batch, make_synthetic_data
from two_tower_models_tpu.training.state import create_train_state

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

CFG = ModelConfig(
    user_id_hash_size=256,
    user_id_embedding_dim=16,
    item_id_hash_size=256,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    feature_hidden_dim=16,
    user_value_weights=(1.0, 0.5),
    history_len=4,
    history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
    debias=Debias.BOTH,
)


def _run_steps(model_cfg, mesh_cfg, batch, n_steps=3, batch_size=64):
    mesh = make_mesh(mesh_cfg)
    tcfg = TrainConfig(batch_size=batch_size, donate_state=False)
    state = shard_state(
        create_train_state(jax.random.key(0), model_cfg, tcfg, pack=False), mesh
    )
    step = make_sharded_train_step(model_cfg, tcfg, mesh, mesh_cfg)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return state, losses


@requires_8
@pytest.mark.parametrize(
    "mesh_shape", [(4, 2), (8, 1), (2, 4)], ids=["4x2", "8x1", "2x4"]
)
def test_sparse_matches_dense_exchange(mesh_shape):
    """Forcing the sparse exchange ON for every table must reproduce the
    dense-psum trajectory (same math, different f32 summation order)."""
    d, m = mesh_shape
    batch = make_batch(jax.random.key(1), CFG, 64)
    dense_state, dense_losses = _run_steps(
        CFG, MeshConfig(data=d, model=m, sparse_table_grads="off"), batch
    )
    sparse_state, sparse_losses = _run_steps(
        CFG, MeshConfig(data=d, model=m, sparse_table_grads="on"), batch
    )
    np.testing.assert_allclose(dense_losses, sparse_losses, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
        jax.device_get(dense_state.params),
        jax.device_get(sparse_state.params),
    )


@requires_8
def test_sparse_with_mixed_negatives_and_logq():
    """Negative ids ride the item table's exchange (they are replicated
    across data shards but each chip's grad carries only its CE rows'
    contribution, summed by the exchange like everything else)."""
    cfg = dataclasses.replace(CFG, mixed_negatives=8, logq_correction=True)
    from two_tower_models_tpu.config import DataConfig

    data = make_synthetic_data(
        DataConfig(
            num_samples=256, num_users=cfg.user_id_hash_size,
            num_items=cfg.item_id_hash_size, feature_dim=8,
            history_len=cfg.history_len, num_tasks=2,
        )
    )
    batch = extend_batch(
        cfg, data, make_batch(jax.random.key(1), cfg, 64), jax.random.key(2)
    )
    # make_batch draws features independently of the catalog; only shapes and
    # id ranges matter for this parity check
    dense_state, dense_losses = _run_steps(
        cfg, MeshConfig(data=4, model=2, sparse_table_grads="off"), batch
    )
    sparse_state, sparse_losses = _run_steps(
        cfg, MeshConfig(data=4, model=2, sparse_table_grads="on"), batch
    )
    np.testing.assert_allclose(dense_losses, sparse_losses, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
        jax.device_get(dense_state.params),
        jax.device_get(sparse_state.params),
    )


def test_touched_counts_match_batch_ids():
    """The comms accounting's shape-only formula must equal the id vectors
    the train step actually exchanges — for every feature combination."""
    for cfg in (
        CFG,
        dataclasses.replace(CFG, history_encoder=None),
        dataclasses.replace(CFG, mixed_negatives=8, logq_correction=True),
    ):
        batch = make_batch(jax.random.key(1), cfg, 16)
        if cfg.mixed_negatives:
            from two_tower_models_tpu.config import DataConfig

            data = make_synthetic_data(
                DataConfig(
                    num_samples=64, num_users=cfg.user_id_hash_size,
                    num_items=cfg.item_id_hash_size, feature_dim=8,
                    history_len=cfg.history_len, num_tasks=2,
                )
            )
            batch = extend_batch(cfg, data, batch, jax.random.key(2))
        ids = table_touched_ids(cfg, batch)
        counts = touched_id_counts(cfg, 16)
        assert {k: v.size for k, v in ids.items()} == counts


def test_sparse_decision_formula():
    # production anchor: item table, 4M rows / model=2, B_l=4096, H=32,
    # B'=64 -> sparse wins by ~7x wire bytes
    assert sparse_exchange_wins(4096 * 33 + 64, 2**21, 64, 4)
    # bench scale (65k tables, data=8): item table stays dense...
    assert not sparse_exchange_wins(4096 * 33, 65536, 64, 8)
    # ...and the user table (U = B_l) flips sparse
    assert sparse_exchange_wins(4096, 65536, 64, 8)
