"""128-lane-packed tables on the explicit mesh path (VERDICT r3 #3).

Round 3 made packed storage and the mesh mutually exclusive; these tests
verify the lifted restriction on BOTH mesh paths: packed [Vp/P, P·D] leaves
row-shard over the model axis (explicit shard_map exchange in logical rows;
GSPMD partitions the packed gather/scatter directly), the trajectory is
bit-compatible with plain storage, and the sharded refresh/recall path
accepts packed params."""

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
from two_tower_models_tpu.nn.packed_table import is_packed, packed_shape
from two_tower_models_tpu.parallel.mesh import make_mesh
from two_tower_models_tpu.parallel.sharding import shard_state
from two_tower_models_tpu.parallel.train_step import (
    check_mesh_tables,
    make_sharded_train_step,
)
from two_tower_models_tpu.training.state import create_train_state, maybe_pack_tables
from two_tower_models_tpu.models.two_tower import init_params

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

PACKED_TCFG = TrainConfig(
    batch_size=64, pack_tables=True, pack_tables_min_rows=0, donate_state=False
)
PLAIN_TCFG = TrainConfig(batch_size=64, pack_tables=False, donate_state=False)


def _trajectory(tcfg, mesh_cfg, batch, model_shards, n_steps=3):
    mesh = make_mesh(mesh_cfg)
    state = shard_state(
        create_train_state(
            jax.random.key(0), CFG, tcfg, model_shards=model_shards
        ),
        mesh,
    )
    step = make_sharded_train_step(CFG, tcfg, mesh, mesh_cfg)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return state, losses


@requires_8
@pytest.mark.parametrize(
    "mesh_shape,strategy,sparse",
    [
        ((4, 2), "psum", "off"),
        ((2, 4), "psum", "on"),
        ((4, 2), "all_to_all", "off"),
        ((8, 1), "psum", "auto"),
    ],
    ids=["4x2-psum", "2x4-psum-sparse", "4x2-a2a", "8x1-psum-auto"],
)
def test_packed_mesh_matches_plain(mesh_shape, strategy, sparse):
    """Packed row-sharded tables must reproduce the plain-storage sharded
    trajectory (packing is numerics-neutral: same rows, same sums)."""
    d, m = mesh_shape
    mesh_cfg = MeshConfig(data=d, model=m, sparse_table_grads=sparse)
    batch = make_batch(jax.random.key(1), CFG, 64)

    mesh = make_mesh(mesh_cfg)
    plain_state = shard_state(
        create_train_state(jax.random.key(0), CFG, PLAIN_TCFG), mesh
    )
    packed_state = shard_state(
        create_train_state(jax.random.key(0), CFG, PACKED_TCFG, model_shards=m),
        mesh,
    )
    assert is_packed(packed_state.params["item_id_table"], CFG.item_id_embedding_dim)
    step_plain = make_sharded_train_step(
        CFG, PLAIN_TCFG, mesh, mesh_cfg, lookup_strategy=strategy
    )
    step_packed = make_sharded_train_step(
        CFG, PACKED_TCFG, mesh, mesh_cfg, lookup_strategy=strategy
    )
    for _ in range(3):
        plain_state, pm = step_plain(plain_state, batch)
        packed_state, km = step_packed(packed_state, batch)
        np.testing.assert_allclose(
            float(pm["loss"]), float(km["loss"]), rtol=1e-6
        )
    from two_tower_models_tpu.nn.packed_table import unpack_table

    np.testing.assert_allclose(
        np.asarray(
            unpack_table(
                jax.device_get(packed_state.params["item_id_table"]),
                CFG.item_id_hash_size,
                CFG.item_id_embedding_dim,
            )
        ),
        np.asarray(jax.device_get(plain_state.params["item_id_table"])),
        rtol=1e-6,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(
            unpack_table(
                jax.device_get(packed_state.params["user_id_table"]),
                CFG.user_id_hash_size,
                CFG.user_id_embedding_dim,
            )
        ),
        np.asarray(jax.device_get(plain_state.params["user_id_table"])),
        rtol=1e-6,
        atol=1e-7,
    )


@requires_8
def test_packed_sharded_refresh_recall():
    """The sharded corpus refresh + recall eval accept packed params (their
    lookups ride the same packed-aware exchange)."""
    from two_tower_models_tpu.parallel.retrieval import (
        make_sharded_recall_fn,
        make_sharded_refresh_fn,
        pad_catalog,
    )

    mesh_cfg = MeshConfig(data=4, model=2)
    mesh = make_mesh(mesh_cfg)
    state = shard_state(
        create_train_state(jax.random.key(0), CFG, PACKED_TCFG, model_shards=2),
        mesh,
    )
    c = CFG.item_id_hash_size
    ids, feats, valid = pad_catalog(
        jnp.arange(c), jax.random.normal(jax.random.key(3), (c, 8)), mesh
    )
    corpus = make_sharded_refresh_fn(CFG, mesh)(state.params, ids, feats)
    batch = make_batch(jax.random.key(1), CFG, 64)
    r = float(
        make_sharded_recall_fn(CFG, mesh, 10)(state.params, corpus, batch, valid)
    )
    assert 0.0 <= r <= 1.0


@requires_8
@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)], ids=["4x2", "2x4"])
def test_packed_gspmd_matches_plain(mesh_shape):
    """Packed tables on the GSPMD path (round 4): the SPMD partitioner
    partitions the packed gather/scatter over P('model', None) physical rows
    exactly like a plain table's — packed and plain states must produce the
    same loss trajectory and the same final table values."""
    from two_tower_models_tpu.parallel.train_step import make_gspmd_train_step

    d, m = mesh_shape
    mesh_cfg = MeshConfig(data=d, model=m, explicit_collectives=False)
    mesh = make_mesh(mesh_cfg)
    batch = make_batch(jax.random.key(1), CFG, 64)

    plain_state = shard_state(
        create_train_state(jax.random.key(0), CFG, PLAIN_TCFG), mesh
    )
    packed_state = shard_state(
        create_train_state(jax.random.key(0), CFG, PACKED_TCFG, model_shards=m),
        mesh,
    )
    assert is_packed(packed_state.params["item_id_table"], CFG.item_id_embedding_dim)
    step_plain = make_gspmd_train_step(CFG, PLAIN_TCFG, mesh, mesh_cfg)
    step_packed = make_gspmd_train_step(CFG, PACKED_TCFG, mesh, mesh_cfg)
    for _ in range(3):
        plain_state, pm = step_plain(plain_state, batch)
        packed_state, km = step_packed(packed_state, batch)
        np.testing.assert_allclose(
            float(pm["loss"]), float(km["loss"]), rtol=1e-6
        )
    from two_tower_models_tpu.nn.packed_table import unpack_table

    for name, vocab, dim in (
        ("item_id_table", CFG.item_id_hash_size, CFG.item_id_embedding_dim),
        ("user_id_table", CFG.user_id_hash_size, CFG.user_id_embedding_dim),
    ):
        np.testing.assert_allclose(
            np.asarray(
                unpack_table(
                    jax.device_get(packed_state.params[name]), vocab, dim
                )
            ),
            np.asarray(jax.device_get(plain_state.params[name])),
            rtol=1e-6,
            atol=1e-7,
        )


def test_pack_skips_indivisible_shards():
    """A table whose packed physical rows don't divide the model axis stays
    plain (and check_mesh_tables accepts the result)."""
    cfg = dataclasses.replace(CFG, user_id_hash_size=200, item_id_hash_size=256)
    params = init_params(jax.random.key(0), cfg)
    # user table: packed_shape(200, 16) = (25, 128); 25 % 2 != 0 -> plain
    assert packed_shape(200, 16)[0] % 2 == 1
    packed = maybe_pack_tables(params, cfg, PACKED_TCFG, model_shards=2)
    assert not is_packed(packed["user_id_table"], cfg.user_id_embedding_dim)
    assert is_packed(packed["item_id_table"], cfg.item_id_embedding_dim)


def test_check_mesh_tables_raises_on_indivisible():
    params = init_params(jax.random.key(0), CFG)
    packed = maybe_pack_tables(params, CFG, PACKED_TCFG, model_shards=1)
    # packed user table: 32 physical rows; n_model=5 does not divide
    with pytest.raises(ValueError, match="not divisible"):
        check_mesh_tables(packed, CFG, 5)
    check_mesh_tables(packed, CFG, 2)  # divides fine
