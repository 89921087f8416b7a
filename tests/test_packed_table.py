"""128-lane-packed table storage (nn.packed_table): layout round-trips,
lookup/gradient parity with plain storage, and end-to-end train-step
equivalence with packing forced on.

The packed layout exists so the Pallas scatter-add kernel stays layout-clean
at >2^22-row tables (BASELINE.md "large-table scaling"); these tests pin the
numerics-neutrality claim at toy sizes on the CPU backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.config import (
    DataConfig,
    ModelConfig,
    TrainConfig,
    preset,
)
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.nn.layers import embedding_lookup
from two_tower_models_tpu.nn.packed_table import (
    is_packed,
    pack_factor,
    pack_table,
    packed_embedding_lookup,
    packed_shape,
    table_lookup,
    unpack_table,
)
from two_tower_models_tpu.training.data import gather_batch, make_synthetic_data
from two_tower_models_tpu.training.state import create_train_state
from two_tower_models_tpu.training.step import make_train_step


@pytest.mark.parametrize("v,d", [(64, 32), (63, 32), (10, 64), (7, 16), (5, 128)])
def test_pack_unpack_roundtrip(v, d):
    table = jax.random.normal(jax.random.key(0), (v, d))
    packed = pack_table(table)
    p = pack_factor(d)
    assert packed.shape == packed_shape(v, d)
    if p > 1:
        assert is_packed(packed, d)
    np.testing.assert_array_equal(
        np.asarray(unpack_table(packed, v, d)), np.asarray(table)
    )


@pytest.mark.parametrize("ids_shape", [(9,), (4, 5)])
def test_packed_lookup_matches_plain(ids_shape):
    v, d = 50, 32
    table = jax.random.normal(jax.random.key(1), (v, d))
    ids = jax.random.randint(jax.random.key(2), ids_shape, 0, v)
    plain = embedding_lookup(table, ids)
    packed = packed_embedding_lookup(pack_table(table), ids, d)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(plain))
    # table_lookup dispatches by storage layout
    np.testing.assert_array_equal(
        np.asarray(table_lookup(pack_table(table), ids, d)), np.asarray(plain)
    )
    np.testing.assert_array_equal(
        np.asarray(table_lookup(table, ids, d)), np.asarray(plain)
    )


def test_packed_lookup_grad_matches_plain():
    """The widened lane-block scatter accumulates the SAME sums as the plain
    [V, D] scatter — including duplicate ids and ids sharing a physical row."""
    v, d = 40, 32
    table = jax.random.normal(jax.random.key(3), (v, d))
    # duplicates + same-physical-row pairs (ids 8,9,10,11 share rows at P=4)
    ids = jnp.array([0, 1, 8, 9, 10, 11, 8, 8, 39, 0])
    g_out = jax.random.normal(jax.random.key(4), (ids.shape[0], d))

    def loss_plain(t):
        return jnp.sum(embedding_lookup(t, ids) * g_out)

    def loss_packed(tp):
        return jnp.sum(packed_embedding_lookup(tp, ids, d) * g_out)

    g_plain = jax.grad(loss_plain)(table)
    g_packed = jax.grad(loss_packed)(pack_table(table))
    np.testing.assert_array_equal(
        np.asarray(unpack_table(g_packed, v, d)), np.asarray(g_plain)
    )


def _run_steps(model_cfg, train_cfg, n_steps=4, batch=16):
    data = make_synthetic_data(
        DataConfig(num_samples=64, num_users=48, num_items=40, history_len=4),
        label_cols=model_cfg.num_tasks,
    )
    state = create_train_state(jax.random.key(0), model_cfg, train_cfg)
    step = make_train_step(model_cfg, train_cfg)
    for i in range(n_steps):
        idx = jax.random.randint(jax.random.key(100 + i), (batch,), 0, 64)
        state, metrics = step(state, data, idx)
    return state, metrics


def test_train_step_packed_matches_unpacked():
    """End-to-end: forcing packed storage must not change the trajectory —
    params, metrics, and the unpacked tables agree after several Adam steps."""
    model_cfg = preset(
        "two_tower_with_user_history_encoder",
        user_id_hash_size=48,
        user_id_embedding_dim=32,
        item_id_hash_size=40,
        item_id_embedding_dim=32,
        user_features_size=8,
        item_features_size=8,
        feature_hidden_dim=16,
        history_len=4,
    )
    cfg_plain = TrainConfig(pack_tables=False, donate_state=False)
    cfg_packed = TrainConfig(pack_tables=True, pack_tables_min_rows=0, donate_state=False)
    s_plain, m_plain = _run_steps(model_cfg, cfg_plain)
    s_packed, m_packed = _run_steps(model_cfg, cfg_packed)

    assert is_packed(s_packed.params["user_id_table"], 32)
    for name, vocab in (("user_id_table", 48), ("item_id_table", 40)):
        np.testing.assert_allclose(
            np.asarray(unpack_table(s_packed.params[name], vocab, 32)),
            np.asarray(s_plain.params[name]),
            rtol=1e-6,
            atol=1e-7,
        )
    # non-table leaves see identical gradients -> identical trajectories
    np.testing.assert_allclose(
        np.asarray(s_packed.params["item_tower_head"]["w"]),
        np.asarray(s_plain.params["item_tower_head"]["w"]),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        float(m_packed["loss"]), float(m_plain["loss"]), rtol=1e-6
    )


def test_eval_paths_accept_packed_params():
    """Corpus refresh + recall eval route through table_lookup and accept a
    packed state transparently."""
    from two_tower_models_tpu.retrieval.mips import refresh_corpus
    from two_tower_models_tpu.training.step import make_eval_recall_fn

    model_cfg = preset(
        "two_tower_base_retrieval",
        user_id_hash_size=48,
        user_id_embedding_dim=32,
        item_id_hash_size=40,
        item_id_embedding_dim=32,
        user_features_size=8,
        item_features_size=8,
        feature_hidden_dim=16,
    )
    train_cfg = TrainConfig(pack_tables=True, pack_tables_min_rows=0)
    state = create_train_state(jax.random.key(0), model_cfg, train_cfg)
    data = make_synthetic_data(
        DataConfig(num_samples=32, num_users=48, num_items=40), label_cols=1
    )
    corpus = refresh_corpus(
        state.params, model_cfg, data.catalog_ids, data.catalog_features
    )
    assert corpus.shape == (40, 32)
    recall = make_eval_recall_fn(model_cfg, top_k=10)
    batch = gather_batch(data, jnp.arange(16))
    r = float(recall(state.params, corpus, batch))
    assert 0.0 <= r <= 1.0
