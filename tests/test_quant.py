"""int8-quantized MIPS corpus (retrieval.quant): quantization error bounds,
top-k recall vs the full-precision scan, rescore exactness over the
candidate pool, and serving-engine integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.config import ModelConfig
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.retrieval.mips import mips_topk
from two_tower_models_tpu.retrieval.quant import (
    QuantizedCorpus,
    dequantize,
    mips_topk_quantized,
    quantize_corpus,
)
from two_tower_models_tpu.serving import RetrievalEngine


def _corpus(c=2048, d=64, seed=0):
    return jax.random.normal(jax.random.key(seed), (c, d), jnp.float32)


def _recall(got_idx, want_idx):
    got = np.asarray(got_idx)
    want = np.asarray(want_idx)
    hits = sum(
        len(set(got[b]) & set(want[b])) for b in range(got.shape[0])
    )
    return hits / want.size


def test_quantization_error_bound():
    """Per-element reconstruction error <= scale/2 (round-to-nearest) and
    zero rows reconstruct exactly."""
    corpus = _corpus().at[7].set(0.0)
    qc = quantize_corpus(corpus)
    rec = np.asarray(dequantize(qc, jnp.float32))
    err = np.abs(rec - np.asarray(corpus))
    bound = np.asarray(qc.scale)[:, None] / 2 + 1e-7
    assert (err <= bound).all()
    assert (rec[7] == 0).all()
    assert (np.asarray(qc.scale) > 0).all()


def test_quantized_topk_recall():
    """Pure-quantized exact top-k keeps high recall vs the f32 scan."""
    corpus = _corpus()
    query = jax.random.normal(jax.random.key(1), (32, 64), jnp.float32)
    want, _, _ = mips_topk(corpus, query, 20)
    qc = quantize_corpus(corpus)
    got, got_s, got_e = mips_topk_quantized(qc, query, 20, recall_target=None)
    r = _recall(got, want)
    assert r >= 0.9, r
    # returned scores/embeddings are self-consistent with the int8 rows
    self_s = jnp.einsum("bkd,bd->bk", got_e.astype(jnp.float32), query)
    np.testing.assert_allclose(
        np.asarray(self_s), np.asarray(got_s), rtol=1e-3, atol=1e-3
    )


def test_rescore_recovers_exact_ordering():
    """int8_rescore: the final top-k over the oversampled pool is scored at
    full precision — recall ~1 and scores bit-match the f32 inner products."""
    corpus = _corpus(seed=3)
    query = jax.random.normal(jax.random.key(4), (32, 64), jnp.float32)
    want_i, want_s, _ = mips_topk(corpus, query, 10)
    qc = quantize_corpus(corpus, keep_raw=True)
    got_i, got_s, got_e = mips_topk_quantized(
        qc, query, 10, recall_target=None, oversample=8
    )
    assert _recall(got_i, want_i) >= 0.99
    # where the index sets agree the scores are the exact f32 products
    exact = jnp.einsum(
        "bkd,bd->bk", jnp.take(corpus, got_i, axis=0), query,
        preferred_element_type=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(exact), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_e),
        np.asarray(jnp.take(corpus, got_i, axis=0)),
        rtol=0, atol=0,
    )


def test_quantized_corpus_is_a_pytree():
    qc = quantize_corpus(_corpus(), keep_raw=True)
    leaves = jax.tree_util.tree_leaves(qc)
    assert len(leaves) == 3
    f = jax.jit(lambda qc, q: mips_topk_quantized(qc, q, 5, recall_target=None)[0])
    out = f(qc, jax.random.normal(jax.random.key(9), (8, 64)))
    assert out.shape == (8, 5)


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


@pytest.mark.parametrize("mode", ["int8", "int8_rescore"])
def test_engine_quantized_query(mode):
    """Quantized engine retrieves nearly the same items as the f32 engine,
    through build, query, and refresh."""
    params = two_tower.init_params(jax.random.key(0), CFG)
    catalog_ids = jnp.arange(96)
    catalog_features = jax.random.normal(jax.random.key(3), (96, 8))
    ref = RetrievalEngine.from_params(params, CFG, catalog_ids, catalog_features)
    eng = RetrievalEngine.from_params(
        params, CFG, catalog_ids, catalog_features, quantize=mode
    )
    assert isinstance(eng.corpus, QuantizedCorpus)
    uid, feat, hist = _inputs()
    got = eng.query(uid, feat, hist)
    want = ref.query(uid, feat, hist)
    assert got.shape == want.shape
    assert _recall(got, want) >= (0.99 if mode == "int8_rescore" else 0.9)

    # refresh keeps the quantized representation
    params2 = two_tower.init_params(jax.random.key(7), CFG)
    eng.refresh(params2, catalog_ids, catalog_features)
    assert isinstance(eng.corpus, QuantizedCorpus)
    assert (eng.corpus.raw is not None) == (mode == "int8_rescore")
    got2 = eng.query(uid, feat, hist)
    assert got2.shape == want.shape


requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@requires_8
@pytest.mark.parametrize("keep_raw", [False, True])
def test_sharded_quantized_topk_parity(keep_raw):
    """sharded_mips_topk over a row-sharded QuantizedCorpus (padded catalog,
    both mesh axes): pure mode exactly matches the single-chip quantized
    scan; rescore mode matches the full-precision top-k."""
    from jax.sharding import PartitionSpec as P

    from two_tower_models_tpu.config import MeshConfig
    from two_tower_models_tpu.parallel.mesh import make_mesh
    from two_tower_models_tpu.retrieval.mips import sharded_mips_topk

    mesh = make_mesh(MeshConfig(data=2, model=4))
    c, d, b, k = 100, 32, 12, 7  # pads to 104 over 8 shards
    corpus = _corpus(c, d, seed=5)
    query = jax.random.normal(jax.random.key(6), (b, d), jnp.float32)
    pad = (-c) % 8
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0)))
    qc_p = quantize_corpus(corpus_p, keep_raw=keep_raw)

    def f(qc_shard, query):
        return sharded_mips_topk(
            qc_shard, query, k, ("data", "model"), valid_count=c,
            recall_target=None, oversample=4,
        )

    specs = jax.tree_util.tree_map(
        lambda x: P(("data", "model"), None) if x.ndim == 2 else P(("data", "model")),
        qc_p,
    )
    idx, scores, emb = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(specs, P()), out_specs=P(),
            check_vma=False,
        )
    )(qc_p, query)
    assert idx.shape == (b, k) and emb.shape == (b, k, d)
    if not keep_raw:
        # identical per-row quantization + exact selection/merge -> identical
        # indices to the single-chip quantized scan on the unpadded corpus
        want_i, want_s, _ = mips_topk_quantized(
            quantize_corpus(corpus), query, k, recall_target=None
        )
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(want_s), rtol=1e-6
        )
    else:
        # shard-local rescore pools are a superset filter of the single-chip
        # pool: recall vs the exact f32 top-k is ~1, scores are exact f32
        want_i, _, _ = mips_topk(corpus, query, k)
        assert _recall(idx, want_i) >= 0.99
        exact = jnp.einsum(
            "bkd,bd->bk", jnp.take(corpus, idx, axis=0), query,
            preferred_element_type=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(exact), rtol=1e-6, atol=1e-6
        )


@requires_8
@pytest.mark.parametrize("mode", ["int8", "int8_rescore"])
def test_sharded_engine_quantized(mode):
    """The mesh engine composes with quantize: the corpus leaves stay
    row-sharded on device, queries match the single-chip quantized engine,
    and refresh preserves the quantized sharded representation."""
    from two_tower_models_tpu.config import MeshConfig
    from two_tower_models_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=2, model=4))
    params = two_tower.init_params(jax.random.key(0), CFG)
    catalog_ids = jnp.arange(90)  # pads to 96 on 8 devices
    catalog_features = jax.random.normal(jax.random.key(3), (90, 8))
    uid, feat, hist = _inputs()

    ref = RetrievalEngine.from_params(
        params, CFG, catalog_ids, catalog_features, quantize=mode
    )
    eng = RetrievalEngine.from_params(
        params, CFG, catalog_ids, catalog_features, mesh=mesh, quantize=mode
    )
    assert isinstance(eng.corpus, QuantizedCorpus)
    assert (eng.corpus.raw is not None) == (mode == "int8_rescore")
    # every leaf stays row-sharded over the whole mesh
    for leaf in jax.tree_util.tree_leaves(eng.corpus):
        assert leaf.sharding.shard_shape(leaf.shape)[0] == leaf.shape[0] // 8
    got = np.asarray(eng.query(uid, feat, hist))
    want = np.asarray(ref.query(uid, feat, hist))
    # the two engines embed the catalog through different lowerings (scan vs
    # shard_map tower; ~2e-5 — test_sharded_retrieval), and int8 rounding can
    # amplify a ulp across a threshold: compare as retrieval sets, not bits
    # (the bit-level sharded-vs-single parity lives in
    # test_sharded_quantized_topk_parity, where the corpus is shared)
    assert _recall(got, want) >= 0.9

    params2 = two_tower.init_params(jax.random.key(7), CFG)
    eng.refresh(params2, catalog_ids, catalog_features)
    assert isinstance(eng.corpus, QuantizedCorpus)
    got2 = eng.query(uid, feat, hist)
    assert got2.shape == want.shape


def test_retrieve_dispatches_on_quantized_corpus():
    """models.two_tower.retrieve accepts a QuantizedCorpus directly."""
    params = two_tower.init_params(jax.random.key(0), CFG)
    corpus = jax.random.normal(jax.random.key(1), (128, 16))
    qc = quantize_corpus(corpus, keep_raw=True)
    idx = two_tower.retrieve(params, CFG, qc, *_inputs())
    want = two_tower.retrieve(params, CFG, corpus, *_inputs())
    assert idx.shape == want.shape
    assert _recall(idx, want) >= 0.99
