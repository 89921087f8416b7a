"""Mesh-sharded corpus refresh / recall eval / serving retrieval (VERDICT r1
#2): the corpus never materializes whole on one device and results match the
single-device path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.conftest import make_batch
from two_tower_models_tpu.config import (
    HistoryEncoderConfig,
    LightRankerConfig,
    MeshConfig,
    ModelConfig,
)
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.parallel.mesh import make_mesh
from two_tower_models_tpu.parallel.retrieval import (
    make_sharded_recall_fn,
    make_sharded_refresh_fn,
    make_sharded_retrieval_fn,
    pad_catalog,
)
from two_tower_models_tpu.retrieval.mips import (
    mips_topk,
    refresh_corpus,
    sharded_mips_topk,
)

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

CFG = ModelConfig(
    user_id_hash_size=64,
    user_id_embedding_dim=16,
    item_id_hash_size=64,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    feature_hidden_dim=32,
    user_value_weights=(1.0, 0.5),
    history_len=8,
    history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
)


def _catalog(key, cfg, c):
    ids = jax.random.randint(key, (c,), 0, cfg.item_id_hash_size)
    feats = jax.random.normal(jax.random.fold_in(key, 1), (c, cfg.item_features_size))
    return ids, feats


@requires_8
def test_sharded_mips_topk_tuple_axes_and_padding():
    """Corpus sharded over BOTH mesh axes with padded (masked) rows: exact
    parity with single-device lax.top_k on the unpadded corpus."""
    mesh = make_mesh(MeshConfig(data=2, model=4))
    c, di, b, k = 100, 16, 12, 7  # 100 pads to 104 over 8 shards
    corpus = jax.random.normal(jax.random.key(0), (c, di))
    query = jax.random.normal(jax.random.key(1), (b, di))
    pad = (-c) % 8
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0)))

    def f(corpus_shard, query):
        return sharded_mips_topk(
            corpus_shard, query, k, ("data", "model"), valid_count=c
        )

    idx, scores, emb = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=(P(("data", "model"), None), P()),
            out_specs=P(),
            check_vma=False,
        )
    )(corpus_p, query)
    ref_idx, ref_scores, ref_emb = mips_topk(corpus, query, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb), rtol=1e-6)


@requires_8
@pytest.mark.slow
def test_sharded_topk_uses_tilemax_kernel_on_large_shards():
    """Shards large enough for tile-max pruning route through the Pallas
    exact pipeline (per-shard DYNAMIC valid counts): parity with the
    single-device scan on a padded corpus."""
    mesh = make_mesh(MeshConfig(data=1, model=8))
    c, di, b, k = 140_000, 16, 8, 50  # 17500/shard > k*128 -> kernel path
    corpus = jax.random.normal(jax.random.key(0), (c, di))
    query = jax.random.normal(jax.random.key(1), (b, di))
    pad = (-c) % 8
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0)))

    def f(corpus_shard, query):
        return sharded_mips_topk(
            corpus_shard, query, k, ("model",), valid_count=c
        )

    idx, scores, emb = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("model", None), P()),
            out_specs=P(),
            check_vma=False,
        )
    )(corpus_p, query)
    ref_idx, ref_scores, ref_emb = mips_topk(corpus, query, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), rtol=1e-6)


@requires_8
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (8, 1)])
def test_sharded_refresh_matches_and_stays_sharded(mesh_shape):
    mesh = make_mesh(MeshConfig(*mesh_shape))
    params = two_tower.init_params(jax.random.key(0), CFG)
    ids, feats = _catalog(jax.random.key(3), CFG, 100)

    pad_ids, pad_feats, valid_c = pad_catalog(ids, feats, mesh)
    corpus = make_sharded_refresh_fn(CFG, mesh)(params, pad_ids, pad_feats)
    # Row-sharded over every device: no chip holds more than C_pad/8 rows.
    shard_rows = corpus.sharding.shard_shape(corpus.shape)[0]
    assert shard_rows == corpus.shape[0] // 8

    ref = refresh_corpus(params, CFG, ids, feats)
    np.testing.assert_allclose(
        np.asarray(corpus[:valid_c]), np.asarray(ref), rtol=2e-5, atol=1e-5
    )


@requires_8
def test_sharded_recall_matches_single_device():
    from two_tower_models_tpu.training.step import make_eval_recall_fn

    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = two_tower.init_params(jax.random.key(0), CFG)
    ids, feats = _catalog(jax.random.key(3), CFG, 120)
    batch = make_batch(jax.random.key(7), CFG, 32)
    # recall is only meaningful if item ids can appear in the catalog: use
    # catalog ids as engaged items for a quarter of the batch
    batch = batch._replace(item_id=jnp.concatenate([ids[:8], batch.item_id[8:]]))

    top_k = 10
    ref_corpus = refresh_corpus(params, CFG, ids, feats)
    ref = float(make_eval_recall_fn(CFG, top_k)(params, ref_corpus, batch))

    pad_ids, pad_feats, valid_c = pad_catalog(ids, feats, mesh)
    corpus = make_sharded_refresh_fn(CFG, mesh)(params, pad_ids, pad_feats)
    got = float(
        make_sharded_recall_fn(CFG, mesh, top_k)(params, corpus, batch, valid_c)
    )
    assert got == pytest.approx(ref, abs=1e-6)


@requires_8
def test_sharded_serving_engine_approx_mode():
    """approx_mips=True on the mesh engine: per-shard approx scan + exact
    merge.  On the CPU backend approx_max_k reduces exactly, so results must
    equal the exact engine's as sets per row."""
    import dataclasses

    from two_tower_models_tpu.serving import RetrievalEngine

    cfg = dataclasses.replace(CFG, approx_mips=True, num_items=8)
    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = two_tower.init_params(jax.random.key(0), cfg)
    ids, feats = _catalog(jax.random.key(3), cfg, 90)
    batch = make_batch(jax.random.key(9), cfg, 16)

    exact_engine = RetrievalEngine.from_params(
        params, dataclasses.replace(cfg, approx_mips=False), ids, feats
    )
    approx_engine = RetrievalEngine.from_params(params, cfg, ids, feats, mesh=mesh)
    ref = np.asarray(
        exact_engine.query(batch.user_id, batch.user_features, batch.user_history)
    )
    got = np.asarray(
        approx_engine.query(batch.user_id, batch.user_features, batch.user_history)
    )
    for r, g in zip(ref, got):
        assert set(r.tolist()) == set(g.tolist())


@requires_8
@pytest.mark.parametrize("light_ranker", [False, True])
def test_sharded_serving_engine_matches_single_device(light_ranker):
    from two_tower_models_tpu.serving import RetrievalEngine

    import dataclasses

    cfg = CFG
    if light_ranker:
        cfg = dataclasses.replace(
            CFG, light_ranker=LightRankerConfig(num_mips_items=16),
            num_items=4,
        )
    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = two_tower.init_params(jax.random.key(0), cfg)
    ids, feats = _catalog(jax.random.key(3), cfg, 90)
    batch = make_batch(jax.random.key(9), cfg, 16)

    ref_engine = RetrievalEngine.from_params(params, cfg, ids, feats)
    sharded_engine = RetrievalEngine.from_params(
        params, cfg, ids, feats, mesh=mesh
    )
    ref_out = ref_engine.query(batch.user_id, batch.user_features, batch.user_history)
    out = sharded_engine.query(batch.user_id, batch.user_features, batch.user_history)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))


@requires_8
def test_sharded_serving_engine_history_len():
    """history_len plumbs through the sharded serving path: parity with the
    single-device masked query, and a real effect vs the unmasked one."""
    from two_tower_models_tpu.serving import RetrievalEngine

    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = two_tower.init_params(jax.random.key(0), CFG)
    ids, feats = _catalog(jax.random.key(3), CFG, 90)
    batch = make_batch(jax.random.key(9), CFG, 16)
    lens = jax.random.randint(jax.random.key(5), (16,), 1, CFG.history_len + 1)

    ref_engine = RetrievalEngine.from_params(params, CFG, ids, feats)
    sharded_engine = RetrievalEngine.from_params(params, CFG, ids, feats, mesh=mesh)
    ref_out = ref_engine.query(
        batch.user_id, batch.user_features, batch.user_history, history_len=lens
    )
    out = sharded_engine.query(
        batch.user_id, batch.user_features, batch.user_history, history_len=lens
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    unmasked = sharded_engine.query(
        batch.user_id, batch.user_features, batch.user_history
    )
    assert (np.asarray(out) != np.asarray(unmasked)).any()


@requires_8
@pytest.mark.slow
def test_sharded_topk_chunked_select_on_tall_tilemax(monkeypatch):
    """A shard whose tile-max matrix exceeds the select kernel's VMEM limit
    runs the HIERARCHICAL (chunked) select inside shard_map: parity with the
    single-device scan.  The limit is monkeypatched small so the split
    triggers at test scale."""
    import two_tower_models_tpu.ops.pallas.mips_topk as M

    monkeypatch.setattr(M, "_SELECT_MAX_ROWS", 64)  # 144 padded tiles/shard
    mesh = make_mesh(MeshConfig(data=1, model=8))
    c, di, b, k = 140_000, 16, 8, 10  # 3 chunks of <=64, 30 survivors
    corpus = jax.random.normal(jax.random.key(3), (c, di))
    query = jax.random.normal(jax.random.key(4), (b, di))
    pad = (-c) % 8
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0)))

    def f(corpus_shard, query):
        return sharded_mips_topk(
            corpus_shard, query, k, ("model",), valid_count=c
        )

    idx, scores, emb = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("model", None), P()),
            out_specs=P(),
            check_vma=False,
        )
    )(corpus_p, query)
    ref_idx, ref_scores, ref_emb = mips_topk(corpus, query, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), rtol=1e-6)
