"""Row-sparse (lazy-Adam) table updates vs the dense reference path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_batch
from two_tower_models_tpu.config import (
    HistoryEncoderConfig,
    ModelConfig,
    TrainConfig,
)
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.training.data import SyntheticRecData
from two_tower_models_tpu.training.sparse_tables import (
    build_minibatch,
    split_params,
)
from two_tower_models_tpu.training.state import create_train_state
from two_tower_models_tpu.training.step import make_train_step

CFG = ModelConfig(
    user_id_hash_size=256,
    user_id_embedding_dim=16,
    item_id_hash_size=256,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    feature_hidden_dim=32,
    user_value_weights=(1.0, 0.5),
    history_len=8,
    history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
)


def _data_from(batch, cfg):
    return SyntheticRecData(
        user_ids=batch.user_id,
        user_features=batch.user_features,
        user_history=batch.user_history,
        item_ids=batch.item_id,
        item_features=batch.item_features,
        positions=batch.position,
        labels=batch.labels,
        catalog_ids=jnp.arange(4),
        catalog_features=jnp.zeros((4, cfg.item_features_size)),
    )


def test_minibatch_loss_matches_full_tables():
    """train_loss on (minitables, remapped batch) == train_loss on the full
    tables: the remap is semantically invisible to the model."""
    params = two_tower.init_params(jax.random.key(0), CFG)
    batch = make_batch(jax.random.key(1), CFG, 32)
    params2, batch2, meta = build_minibatch(CFG, params, batch)

    ref, _ = two_tower.train_loss(params, CFG, batch)
    got, _ = two_tower.train_loss(params2, CFG, batch2)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    # minitables hold one slot per lookup
    assert params2["user_id_table"].shape[0] == 32
    assert params2["item_id_table"].shape[0] == 32 + 32 * CFG.history_len


def test_first_step_matches_dense_adam_exactly():
    """From zero moments, one lazy step == one dense optax.adam step on every
    row (untouched rows get zero update from zero moments in both)."""
    tcfg_d = TrainConfig(batch_size=32, learning_rate=1e-3, donate_state=False)
    tcfg_l = dataclasses.replace(tcfg_d, lazy_table_adam=True)
    batch = make_batch(jax.random.key(1), CFG, 32)
    data = _data_from(batch, CFG)
    idx = jnp.arange(32)

    s_d = create_train_state(jax.random.key(0), CFG, tcfg_d)
    s_l = create_train_state(jax.random.key(0), CFG, tcfg_l)
    s_d2, m_d = make_train_step(CFG, tcfg_d)(s_d, data, idx)
    s_l2, m_l = make_train_step(CFG, tcfg_l)(s_l, data, idx)

    np.testing.assert_allclose(float(m_l["loss"]), float(m_d["loss"]), rtol=1e-6)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_l2.params),
        jax.tree_util.tree_leaves_with_path(s_d2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_rows_touched_every_step_track_dense_adam():
    """Across several steps, always-touched rows stay close to dense Adam.
    (Not exact past step 1: intermittently-touched rows receive dense
    moment-decay updates that lazy Adam skips, and that deviation feeds back
    through shared activations — the documented lazy-Adam semantics.)"""
    tcfg_d = TrainConfig(batch_size=16, learning_rate=1e-3, donate_state=False)
    tcfg_l = dataclasses.replace(tcfg_d, lazy_table_adam=True)

    batches = [make_batch(jax.random.key(i), CFG, 16) for i in range(3)]
    # force a fixed always-touched id set: user id 7, item id 9 in every batch
    batches = [
        b._replace(
            user_id=b.user_id.at[0].set(7),
            item_id=b.item_id.at[0].set(9),
        )
        for b in batches
    ]
    s_d = create_train_state(jax.random.key(0), CFG, tcfg_d)
    s_l = create_train_state(jax.random.key(0), CFG, tcfg_l)
    step_d = make_train_step(CFG, tcfg_d)
    step_l = make_train_step(CFG, tcfg_l)
    for b in batches:
        data = _data_from(b, CFG)
        idx = jnp.arange(16)
        s_d, _ = step_d(s_d, data, idx)
        s_l, _ = step_l(s_l, data, idx)

    np.testing.assert_allclose(
        np.asarray(s_l.params["user_id_table"][7]),
        np.asarray(s_d.params["user_id_table"][7]),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(s_l.params["item_id_table"][9]),
        np.asarray(s_d.params["item_id_table"][9]),
        rtol=1e-4, atol=1e-7,
    )
    # dense subtree stays close (drift enters only through the lazy rows'
    # feedback into shared activations — small over a few steps)
    d_l, _ = split_params(s_l.params)
    d_d, _ = split_params(s_d.params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(d_l),
        jax.tree_util.tree_leaves_with_path(d_d),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.2, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_lazy_training_learns():
    """Loss decreases over steps with steps_per_dispatch>1 on the lazy path."""
    tcfg = TrainConfig(
        batch_size=32, learning_rate=1e-2, lazy_table_adam=True,
        steps_per_dispatch=2,
    )
    state = create_train_state(jax.random.key(0), CFG, tcfg)
    batch = make_batch(jax.random.key(3), CFG, 32)
    data = _data_from(batch, CFG)
    idx = jnp.tile(jnp.arange(32)[None], (2, 1))
    step = make_train_step(CFG, tcfg)
    losses = []
    for _ in range(5):
        state, metrics = step(state, data, idx)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 10


def test_lazy_guards():
    with pytest.raises(ValueError, match="exclusive"):
        make_train_step(
            CFG, TrainConfig(lazy_table_adam=True, fused_adam=True)
        )


def test_lazy_without_history_encoder():
    """Base preset (no history ids feed the item table) trains on the lazy
    path and matches dense Adam on step 1."""
    base_cfg = dataclasses.replace(CFG, history_encoder=None)
    tcfg_d = TrainConfig(batch_size=16, learning_rate=1e-3, donate_state=False)
    tcfg_l = dataclasses.replace(tcfg_d, lazy_table_adam=True)
    batch = make_batch(jax.random.key(5), base_cfg, 16)
    data = _data_from(batch, base_cfg)
    idx = jnp.arange(16)
    s_d, _ = make_train_step(base_cfg, tcfg_d)(
        create_train_state(jax.random.key(0), base_cfg, tcfg_d), data, idx
    )
    s_l, _ = make_train_step(base_cfg, tcfg_l)(
        create_train_state(jax.random.key(0), base_cfg, tcfg_l), data, idx
    )
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_l.params),
        jax.tree_util.tree_leaves_with_path(s_d.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )


def test_lazy_packed_matches_lazy_plain():
    """Lazy Adam over 128-lane-packed tables (minitable gather + Pallas
    rows_write write-back) follows the SAME trajectory as lazy Adam over
    plain storage, duplicates and partner-lane rows included."""
    from two_tower_models_tpu.nn.packed_table import is_packed, unpack_table

    tcfg_plain = TrainConfig(
        batch_size=16, learning_rate=1e-3, donate_state=False,
        lazy_table_adam=True, pack_tables=False,
    )
    tcfg_packed = dataclasses.replace(
        tcfg_plain, pack_tables=True, pack_tables_min_rows=0
    )
    s_pl = create_train_state(jax.random.key(0), CFG, tcfg_plain)
    s_pk = create_train_state(jax.random.key(0), CFG, tcfg_packed)
    assert is_packed(s_pk.params["user_id_table"], CFG.user_id_embedding_dim)
    step_pl = make_train_step(CFG, tcfg_plain)
    step_pk = make_train_step(CFG, tcfg_packed)
    for i in range(3):
        batch = make_batch(jax.random.key(10 + i), CFG, 16)
        # force duplicates + adjacent ids sharing a physical row (P=8 at D=16)
        batch = batch._replace(
            user_id=batch.user_id.at[0].set(7).at[1].set(7).at[2].set(6),
            item_id=batch.item_id.at[0].set(9).at[1].set(10),
        )
        data = _data_from(batch, CFG)
        idx = jnp.arange(16)
        s_pl, m_pl = step_pl(s_pl, data, idx)
        s_pk, m_pk = step_pk(s_pk, data, idx)
    np.testing.assert_allclose(float(m_pk["loss"]), float(m_pl["loss"]), rtol=1e-6)
    for name, vocab, dim in (
        ("user_id_table", CFG.user_id_hash_size, CFG.user_id_embedding_dim),
        ("item_id_table", CFG.item_id_hash_size, CFG.item_id_embedding_dim),
    ):
        np.testing.assert_allclose(
            np.asarray(unpack_table(s_pk.params[name], vocab, dim)),
            np.asarray(s_pl.params[name]),
            rtol=1e-6, atol=1e-7, err_msg=name,
        )
        np.testing.assert_allclose(
            np.asarray(
                unpack_table(s_pk.opt_state["tables"]["nu"][name], vocab, dim)
            ),
            np.asarray(s_pl.opt_state["tables"]["nu"][name]),
            rtol=1e-6, atol=1e-7, err_msg=name + ":nu",
        )


def test_lazy_all_duplicate_ids():
    """Worst-case duplication: every lookup hits the SAME id — the whole
    gradient must land on one row, once (dup slots dropped)."""
    tcfg_d = TrainConfig(batch_size=16, learning_rate=1e-3, donate_state=False)
    tcfg_l = dataclasses.replace(tcfg_d, lazy_table_adam=True)
    batch = make_batch(jax.random.key(6), CFG, 16)
    batch = batch._replace(
        user_id=jnp.full_like(batch.user_id, 3),
        item_id=jnp.full_like(batch.item_id, 5),
        user_history=jnp.full_like(batch.user_history, 5),
    )
    data = _data_from(batch, CFG)
    idx = jnp.arange(16)
    s_d, m_d = make_train_step(CFG, tcfg_d)(
        create_train_state(jax.random.key(0), CFG, tcfg_d), data, idx
    )
    s_l, m_l = make_train_step(CFG, tcfg_l)(
        create_train_state(jax.random.key(0), CFG, tcfg_l), data, idx
    )
    np.testing.assert_allclose(float(m_l["loss"]), float(m_d["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_l.params["user_id_table"]),
        np.asarray(s_d.params["user_id_table"]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(s_l.params["item_id_table"]),
        np.asarray(s_d.params["item_id_table"]),
        rtol=1e-5, atol=1e-7,
    )
