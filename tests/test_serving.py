"""Serving engine: query parity with the core retrieve(), corpus building
from trained params, refresh semantics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from two_tower_models_tpu.config import HistoryEncoderConfig, ModelConfig
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.serving import RetrievalEngine

CFG = ModelConfig(
    user_id_hash_size=64,
    user_id_embedding_dim=16,
    item_id_hash_size=96,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    user_value_weights=(1.0,),
    history_len=4,
    num_items=5,
)


def _inputs(b=8, seed=2):
    ks = jax.random.split(jax.random.key(seed), 3)
    return (
        jax.random.randint(ks[0], (b,), 0, CFG.user_id_hash_size),
        jax.random.normal(ks[1], (b, CFG.user_features_size)),
        jax.random.randint(ks[2], (b, CFG.history_len), 0, CFG.item_id_hash_size),
    )


def test_query_matches_core_retrieve():
    params = two_tower.init_params(jax.random.key(0), CFG)
    corpus = jax.random.normal(jax.random.key(1), (128, 16))
    eng = RetrievalEngine(params, CFG, corpus)
    uid, feat, hist = _inputs()
    got = eng.query(uid, feat, hist)
    want = two_tower.retrieve(params, CFG, corpus, uid, feat, hist)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_from_params_builds_trained_corpus():
    params = two_tower.init_params(jax.random.key(0), CFG)
    catalog_ids = jnp.arange(96)
    catalog_features = jax.random.normal(jax.random.key(3), (96, 8))
    eng = RetrievalEngine.from_params(params, CFG, catalog_ids, catalog_features)
    # corpus rows == item tower outputs
    want = two_tower.compute_item_embeddings(params, CFG, catalog_ids, catalog_features)
    np.testing.assert_allclose(
        np.asarray(eng.corpus), np.asarray(want), rtol=1e-5, atol=1e-6
    )
    uid, feat, hist = _inputs()
    idx = eng.query(uid, feat, hist)
    assert idx.shape == (8, CFG.num_items)
    assert int(idx.min()) >= 0 and int(idx.max()) < 96


def test_query_honors_history_len():
    """Serving exposes per-example history lengths: masked query equals
    core retrieve() with the same lengths and differs from the unmasked
    query when real lengths < H."""
    cfg = dataclasses.replace(
        CFG, history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1)
    )
    params = two_tower.init_params(jax.random.key(0), cfg)
    corpus = jax.random.normal(jax.random.key(1), (128, 16))
    eng = RetrievalEngine(params, cfg, corpus)
    uid, feat, hist = _inputs()
    lens = jnp.array([1, 2, 3, 4, 1, 2, 3, 4], jnp.int32)

    got = eng.query(uid, feat, hist, history_len=lens)
    want = two_tower.retrieve(
        params, cfg, corpus, uid, feat, hist, history_len=lens
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    unmasked = eng.query(uid, feat, hist)
    assert (np.asarray(got) != np.asarray(unmasked)).any()


def test_refresh_swaps_params_without_retrace():
    params = two_tower.init_params(jax.random.key(0), CFG)
    catalog_ids = jnp.arange(96)
    catalog_features = jax.random.normal(jax.random.key(3), (96, 8))
    eng = RetrievalEngine.from_params(params, CFG, catalog_ids, catalog_features)
    eng.warmup(8)
    uid, feat, hist = _inputs()
    before = np.asarray(eng.query(uid, feat, hist))

    new_params = two_tower.init_params(jax.random.key(9), CFG)
    eng.refresh(new_params, catalog_ids, catalog_features)
    after = np.asarray(eng.query(uid, feat, hist))
    want = np.asarray(
        two_tower.retrieve(new_params, CFG, eng.corpus, uid, feat, hist)
    )
    np.testing.assert_array_equal(after, want)
    assert (before != after).any()  # different params -> different retrieval


def test_warmup_compiles_the_varlen_variant():
    """warmup(variable_history=True) pre-compiles the history_len argument
    structure, so the first per-example-length query is a cache hit, and a
    full-length history_len vector retrieves identically to None."""
    params = two_tower.init_params(jax.random.key(0), CFG)
    catalog_ids = jnp.arange(96)
    catalog_features = jax.random.normal(jax.random.key(3), (96, 8))
    eng = RetrievalEngine.from_params(params, CFG, catalog_ids, catalog_features)
    eng.warmup(8, variable_history=True)
    uid, feat, hist = _inputs()
    lens = jnp.full((8,), CFG.history_len, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(eng.query(uid, feat, hist, history_len=lens)),
        np.asarray(eng.query(uid, feat, hist)),
    )
