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


def test_engine_quantized_rejects_mesh():
    params = two_tower.init_params(jax.random.key(0), CFG)
    corpus = jax.random.normal(jax.random.key(1), (128, 16))
    with pytest.raises(NotImplementedError, match="single-chip"):
        RetrievalEngine(params, CFG, corpus, mesh=object(), quantize="int8")


def test_retrieve_dispatches_on_quantized_corpus():
    """models.two_tower.retrieve accepts a QuantizedCorpus directly."""
    params = two_tower.init_params(jax.random.key(0), CFG)
    corpus = jax.random.normal(jax.random.key(1), (128, 16))
    qc = quantize_corpus(corpus, keep_raw=True)
    idx = two_tower.retrieve(params, CFG, qc, *_inputs())
    want = two_tower.retrieve(params, CFG, corpus, *_inputs())
    assert idx.shape == want.shape
    assert _recall(idx, want) >= 0.99
