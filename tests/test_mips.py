"""MIPS module contracts (mirroring tests/test_baseline_mips_module.py in the
reference) plus exactness, sharded merge parity, and corpus refresh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from two_tower_models_tpu.config import MeshConfig, ModelConfig
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from two_tower_models_tpu.retrieval.mips import (
    mips_init,
    mips_topk,
    refresh_corpus,
    sharded_mips_topk,
)

B, C, DI, K = 16, 200, 32, 10


@pytest.fixture(scope="module")
def qc():
    corpus = mips_init(jax.random.key(0), C, DI)
    query = jax.random.normal(jax.random.key(1), (B, DI))
    return query, corpus


def test_output_shapes_and_bounds(qc):
    query, corpus = qc
    idx, scores, emb = mips_topk(corpus, query, K)
    assert idx.shape == (B, K)
    assert scores.shape == (B, K)
    assert emb.shape == (B, K, DI)
    assert jnp.all(idx >= 0) and jnp.all(idx < C)


def test_exact_against_numpy(qc):
    query, corpus = qc
    idx, scores, emb = mips_topk(corpus, query, K)
    full = np.asarray(query) @ np.asarray(corpus).T
    ref_idx = np.argsort(-full, axis=1)[:, :K]
    # identical index sets (ties could reorder; scores must match sorted)
    np.testing.assert_allclose(
        np.asarray(scores),
        np.take_along_axis(full, ref_idx, axis=1),
        rtol=1e-5,
    )
    # gathered embeddings correspond to returned indices
    np.testing.assert_allclose(
        np.asarray(emb), np.asarray(corpus)[np.asarray(idx)], rtol=1e-6
    )


def test_scores_descending(qc):
    query, corpus = qc
    _, scores, _ = mips_topk(corpus, query, K)
    assert jnp.all(scores[:, :-1] >= scores[:, 1:])


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_sharded_topk_matches_single_device(qc):
    query, corpus = qc
    mesh = make_mesh(MeshConfig(data=1, model=4))

    def f(corpus_shard, query):
        return sharded_mips_topk(corpus_shard, query, K, MODEL_AXIS)

    mapped = jax.jit(
        jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
    idx_s, scores_s, emb_s = mapped(corpus, query)
    idx_r, scores_r, emb_r = mips_topk(corpus, query, K)
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_r), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(emb_s), np.asarray(emb_r), rtol=1e-6)


def test_segmented_topk_matches_dense():
    from two_tower_models_tpu.retrieval.mips import mips_topk_segmented

    corpus = mips_init(jax.random.key(7), 1000, DI)
    query = jax.random.normal(jax.random.key(8), (B, DI))
    idx_s, scores_s, emb_s = mips_topk_segmented(corpus, query, K, num_segments=8)
    idx_r, scores_r, emb_r = mips_topk(corpus, query, K)
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))


def test_segmented_topk_nondivisible():
    from two_tower_models_tpu.retrieval.mips import mips_topk_segmented

    corpus = mips_init(jax.random.key(9), 530, DI)  # 530 % 8 != 0 -> -inf pad
    query = jax.random.normal(jax.random.key(10), (4, DI))
    idx_s, scores_s, _ = mips_topk_segmented(corpus, query, 9, num_segments=8)
    idx_r, scores_r, _ = mips_topk(corpus, query, 9)
    np.testing.assert_allclose(np.asarray(scores_s), np.asarray(scores_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_r))


def test_chunked_topk_matches_dense():
    from two_tower_models_tpu.retrieval.mips import chunked_mips_topk

    corpus = mips_init(jax.random.key(3), 1000, DI)
    query = jax.random.normal(jax.random.key(4), (B, DI))
    idx_c, scores_c, emb_c = chunked_mips_topk(corpus, query, K, chunk_size=128)
    idx_r, scores_r, emb_r = mips_topk(corpus, query, K)
    np.testing.assert_allclose(np.asarray(scores_c), np.asarray(scores_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_c), np.asarray(idx_r))
    np.testing.assert_allclose(np.asarray(emb_c), np.asarray(emb_r), rtol=1e-6)


def test_chunked_topk_nondivisible_chunk():
    from two_tower_models_tpu.retrieval.mips import chunked_mips_topk

    corpus = mips_init(jax.random.key(5), 333, DI)  # 333 % 128 != 0
    query = jax.random.normal(jax.random.key(6), (4, DI))
    idx_c, scores_c, _ = chunked_mips_topk(corpus, query, 7, chunk_size=128)
    idx_r, scores_r, _ = mips_topk(corpus, query, 7)
    np.testing.assert_allclose(np.asarray(scores_c), np.asarray(scores_r), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_c), np.asarray(idx_r))


@pytest.mark.parametrize("c,b,k,tile", [(30000, 16, 100, 128), (5000, 17, 11, 64), (999, 8, 50, 128)])
def test_exact_tilemax_matches_dense(c, b, k, tile):
    """Tile-max pruning (pure XLA) is bit-exact vs lax.top_k, including
    non-divisible corpus sizes and the small-corpus fallback."""
    from two_tower_models_tpu.retrieval.mips import mips_topk_exact_tilemax

    corpus = mips_init(jax.random.key(20), c, DI)
    query = jax.random.normal(jax.random.key(21), (b, DI))
    ti, ts, te = mips_topk_exact_tilemax(corpus, query, k, tile=tile, chunk=4096)
    ri, rs, re = mips_topk(corpus, query, k)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(rs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(te), np.asarray(re), rtol=1e-6)


@pytest.mark.parametrize("c,b,k,tile", [(30000, 16, 100, 128), (5000, 17, 11, 64)])
def test_exact_pallas_matches_dense(c, b, k, tile):
    """The Pallas tile-max pipeline (interpret mode here; Mosaic on TPU —
    scripts/tpu_kernel_parity.py) is bit-exact vs lax.top_k."""
    from two_tower_models_tpu.ops.pallas.mips_topk import mips_topk_exact_pallas

    corpus = mips_init(jax.random.key(22), c, DI)
    query = jax.random.normal(jax.random.key(23), (b, DI))
    ti, ts, te = mips_topk_exact_pallas(corpus, query, k, tile=tile)
    ri, rs, re = mips_topk(corpus, query, k)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(rs), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(te), np.asarray(re), rtol=1e-6)


@pytest.mark.parametrize("nt,b,k", [(64, 8, 5), (256, 130, 16)])
def test_select_topk_matches_lax(nt, b, k):
    """Tournament select == lax.top_k bit-exactly, including tie order
    (lowest index first) and duplicated values."""
    from two_tower_models_tpu.ops.pallas.mips_topk import select_topk_t

    x = jax.random.normal(jax.random.key(30), (b, nt))
    # adversarial ties: quantize hard so many values collide, plus rows of
    # all-equal values
    x = jnp.round(x * 4) / 4
    x = x.at[0].set(0.0)
    spad = 0 if b <= 128 else (-b) % 128
    xt = jnp.pad(x.T, ((0, 0), (0, spad)), constant_values=float("-inf"))
    val_t, idx_t = select_topk_t(xt, k)
    rs, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(idx_t[:, :b].T), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(val_t[:, :b].T), np.asarray(rs))


@pytest.mark.parametrize("nt,b,k,sup", [(512, 8, 13, 8), (2048, 130, 32, 8), (100, 16, 9, 8)])
def test_select_topk_pruned_matches_lax(nt, b, k, sup):
    """Supertile-pruned tournament == lax.top_k bit-exactly, including ties
    that span supertiles and at the k-th boundary."""
    from two_tower_models_tpu.ops.pallas.mips_topk import select_topk_t_pruned

    x = jax.random.normal(jax.random.key(50), (b, nt))
    x = jnp.round(x * 3) / 3  # heavy exact-tie collisions
    x = x.at[1].set(1.0)  # an all-equal row: pure tie-order test
    spad = 0 if b <= 128 else (-b) % 128
    xt = jnp.pad(x.T, ((0, (-nt) % 8), (0, spad)), constant_values=float("-inf"))
    val_t, idx_t = select_topk_t_pruned(xt, k, sup=sup)
    rs, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(idx_t[:, :b].T), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(val_t[:, :b].T), np.asarray(rs))


def test_f32_key_map_properties():
    """The int32 key map used by the tournament kernels is strictly
    monotone in lax.top_k's total order and exactly invertible."""
    from two_tower_models_tpu.ops.pallas.mips_topk import _f32_keys, _keys_f32

    specials = jnp.asarray(
        [float("-inf"), -1e38, -1.0, -1e-45, -0.0, 0.0, 1e-45, 1.0, 1e38, float("inf")],
        jnp.float32,
    )
    randoms = jax.random.normal(jax.random.key(53), (4096,)) * 1e3
    x = jnp.concatenate([specials, randoms])
    k = _f32_keys(x)
    # exact round-trip including -0.0's sign bit
    back = _keys_f32(k)
    np.testing.assert_array_equal(
        np.asarray(back).view(np.int32), np.asarray(x).view(np.int32)
    )
    # monotone: sorting by key == XLA's total-order sort of the floats
    order_k = np.argsort(np.asarray(k), kind="stable")
    xs = np.asarray(x)[order_k]
    assert (np.diff(np.asarray(k)[order_k]) >= 0).all()
    lax_sorted = np.asarray(jax.lax.sort(x))
    np.testing.assert_array_equal(
        xs.view(np.int32), lax_sorted.view(np.int32)
    )


def test_select_topk_signed_zero_total_order():
    """lax.top_k's sort comparator is a TOTAL order: every +0.0 ranks above
    every -0.0 (not index-interleaved).  The tournament kernels select on a
    monotone int32 key to reproduce that; a float `x == m` compare treated
    the zeros as equal and interleaved them by index."""
    from two_tower_models_tpu.ops.pallas.mips_topk import (
        select_topk_t,
        select_topk_t_pruned,
    )

    x = jax.random.normal(jax.random.key(52), (16, 256))
    x = jnp.round(x * 2) / 2  # quantization yields both -0.0 and +0.0
    assert bool(jnp.any((x == 0) & jnp.signbit(x))) and bool(
        jnp.any((x == 0) & ~jnp.signbit(x))
    )
    rs, ri = jax.lax.top_k(x, 200)  # deep enough to cross the zero band
    v1, i1 = select_topk_t(x.T, 200)
    np.testing.assert_array_equal(np.asarray(i1.T), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(v1.T), np.asarray(rs))
    assert bool(jnp.any(jnp.signbit(v1[v1 == 0])))  # -0.0 survives round-trip
    v2, i2 = select_topk_t_pruned(x.T, 30, sup=8)
    np.testing.assert_array_equal(np.asarray(i2.T), np.asarray(ri[:, :30]))


def test_select_topk_pruned_few_finite_supertiles():
    """k can exceed the number of FINITE supertiles (masked corpus padding
    leaves whole supertiles at -inf) as long as finite rows >= k; the -inf
    mask collision used to re-pick supertile 0 and duplicate its rows."""
    from two_tower_models_tpu.ops.pallas.mips_topk import select_topk_t_pruned

    x = jax.random.normal(jax.random.key(51), (24, 96))
    x = x.at[:, 79:].set(float("-inf"))  # 79 finite rows, 10 finite supers
    val_t, idx_t = select_topk_t_pruned(x.T, 11, sup=8)
    rs, ri = jax.lax.top_k(x, 11)
    np.testing.assert_array_equal(np.asarray(idx_t.T), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(val_t.T), np.asarray(rs))


@pytest.mark.parametrize("d,tile", [(64, 128), (32, 128), (16, 64), (100, 128), (128, 128)])
def test_gather_rescore_packing(d, tile):
    """gather_rescore matches a dense oracle at every pack factor
    (P = 128//D packed rows per lane row for narrow corpora, zero-pad for
    widths that don't divide 128)."""
    from two_tower_models_tpu.ops.pallas.mips_topk import gather_rescore

    c, b, k = 16 * tile, 16, 5
    corpus = jax.random.normal(jax.random.key(40), (c, d))
    query = jax.random.normal(jax.random.key(41), (b, d))
    tidx = jax.random.randint(jax.random.key(42), (b, k), 0, c // tile)
    got = gather_rescore(query, corpus, tidx, tile)
    dense = jnp.einsum("bd,cd->bc", query, corpus)
    gidx = tidx[:, :, None] * tile + jnp.arange(tile)[None, None, :]
    want = jnp.take_along_axis(dense, gidx.reshape(b, k * tile), axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-5)


def test_exact_cross_tile_boundary_ties():
    """A float tie at the k-th boundary spanning two tiles must resolve to
    the LOWEST global index (dense lax.top_k's rule) even when the
    higher-index candidate sits in a higher-ranked tile.  Rank-ordered
    candidate pools used to return the wrong winner here; the pipelines now
    sort selected tiles ascending before the rescore."""
    from two_tower_models_tpu.ops.pallas.mips_topk import mips_topk_exact_pallas
    from two_tower_models_tpu.retrieval.mips import mips_topk_exact_tilemax

    rng = np.random.default_rng(0)
    c, d, k = 2048, 8, 4
    corpus = rng.normal(size=(c, d)).astype(np.float32)
    query = rng.normal(size=(8, d)).astype(np.float32)
    u = (query[0] / np.linalg.norm(query[0])).astype(np.float32)
    corpus[1850] = u * 25  # tile 14's max: ranks it first in pass 2
    corpus[1900] = u * 10  # the tie candidate dense must NOT pick...
    corpus[300] = u * 10  # ...because this equal-score row has a lower index
    corpus[50] = u * 22
    corpus[600] = u * 21
    cj, qj = jnp.asarray(corpus), jnp.asarray(query)
    ri, rs, _ = mips_topk(cj, qj, k)
    assert 300 in np.asarray(ri[0]) and 1900 not in np.asarray(ri[0])
    pi, ps, _ = mips_topk_exact_pallas(cj, qj, k)
    ti, ts, _ = mips_topk_exact_tilemax(cj, qj, k, chunk=1024)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))

    # quantized-score stress: integer-grid embeddings collide constantly
    for seed in range(3):
        r2 = np.random.default_rng(seed)
        c2 = jnp.asarray(r2.integers(-2, 3, size=(4096, 16)).astype(np.float32))
        q2 = jnp.asarray(r2.integers(-2, 3, size=(16, 16)).astype(np.float32))
        di_, _, _ = mips_topk(c2, q2, 10)
        pi2, _, _ = mips_topk_exact_pallas(c2, q2, 10)
        ti2, _, _ = mips_topk_exact_tilemax(c2, q2, 10, chunk=1024)
        np.testing.assert_array_equal(np.asarray(pi2), np.asarray(di_))
        np.testing.assert_array_equal(np.asarray(ti2), np.asarray(di_))


def test_exact_pallas_odd_large_batch():
    """ADVICE r2 (high): B>512 not divisible by 512 (e.g. 520) used to trip
    tile_max_scores' query-block assert on the default exact path."""
    from two_tower_models_tpu.ops.pallas.mips_topk import mips_topk_exact_pallas

    corpus = mips_init(jax.random.key(24), 8000, DI)
    query = jax.random.normal(jax.random.key(25), (520, DI))
    ti, ts, _ = mips_topk_exact_pallas(corpus, query, 20, tile=64)
    ri, rs, _ = mips_topk(corpus, query, 20)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(rs), rtol=1e-6)


def test_exact_pallas_mixed_dtype():
    """ADVICE r2 (low): f32 queries over a bf16 corpus promote to a common
    dtype before the gather kernel instead of failing inside it."""
    from two_tower_models_tpu.ops.pallas.mips_topk import mips_topk_exact_pallas

    corpus = mips_init(jax.random.key(26), 8000, DI).astype(jnp.bfloat16)
    query = jax.random.normal(jax.random.key(27), (16, DI))  # f32
    ti, ts, te = mips_topk_exact_pallas(corpus, query, 20, tile=64)
    ri, rs, re = mips_topk(corpus, query, 20)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(ts), np.asarray(rs), rtol=1e-6)
    assert te.dtype == corpus.dtype  # embeddings come back in corpus dtype


def test_refresh_corpus_matches_item_tower():
    cfg = ModelConfig(
        item_id_hash_size=64,
        item_id_embedding_dim=16,
        user_id_hash_size=64,
        user_id_embedding_dim=16,
        item_features_size=8,
        user_features_size=8,
        feature_hidden_dim=32,
    )
    params = two_tower.init_params(jax.random.key(0), cfg)
    ids = jnp.arange(50)
    feats = jax.random.normal(jax.random.key(1), (50, 8))
    corpus = refresh_corpus(params, cfg, ids, feats, batch_size=16)
    direct = two_tower.compute_item_embeddings(params, cfg, ids, feats)
    assert corpus.shape == (50, 16)
    np.testing.assert_allclose(np.asarray(corpus), np.asarray(direct), rtol=1e-5)


def test_retrieve_approx_mips_config():
    """approx_mips=True routes retrieve() through lax.approx_max_k; on the
    CPU test backend the approximate op reduces exactly, so indices must
    match the exact path as *sets* per row."""
    import dataclasses

    cfg = ModelConfig(
        user_id_hash_size=64,
        user_id_embedding_dim=16,
        item_id_hash_size=64,
        item_id_embedding_dim=16,
        user_features_size=8,
        item_features_size=8,
        user_value_weights=(1.0,),
        history_len=4,
        num_items=5,
    )
    params = two_tower.init_params(jax.random.key(0), cfg)
    corpus = jax.random.normal(jax.random.key(1), (128, 16))
    ks = jax.random.split(jax.random.key(2), 3)
    uid = jax.random.randint(ks[0], (8,), 0, 64)
    ufeat = jax.random.normal(ks[1], (8, 8))
    hist = jax.random.randint(ks[2], (8, 4), 0, 64)

    exact = two_tower.retrieve(params, cfg, corpus, uid, ufeat, hist)
    approx = two_tower.retrieve(
        params, dataclasses.replace(cfg, approx_mips=True), corpus, uid, ufeat, hist
    )
    assert approx.shape == exact.shape
    assert int(jnp.min(approx)) >= 0 and int(jnp.max(approx)) < 128
    for r_e, r_a in zip(np.asarray(exact), np.asarray(approx)):
        assert set(r_e.tolist()) == set(r_a.tolist())


def test_retrieve_light_ranker_approx():
    """Two-stage retrieval (MIPS -> light-ranker rerank) through the approx
    serving path returns valid, exact-shaped results."""
    import dataclasses

    from two_tower_models_tpu.config import HistoryEncoderConfig, LightRankerConfig

    cfg = ModelConfig(
        user_id_hash_size=64,
        user_id_embedding_dim=16,
        item_id_hash_size=64,
        item_id_embedding_dim=16,
        user_features_size=8,
        item_features_size=8,
        user_value_weights=(1.0,),
        history_len=4,
        history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
        light_ranker=LightRankerConfig(num_mips_items=20, num_ranker_user_embeddings=2),
        num_items=5,
        approx_mips=True,
    )
    params = two_tower.init_params(jax.random.key(0), cfg)
    corpus = jax.random.normal(jax.random.key(1), (256, 16))
    ks = jax.random.split(jax.random.key(2), 3)
    out = two_tower.retrieve(
        params, cfg, corpus,
        jax.random.randint(ks[0], (8,), 0, 64),
        jax.random.normal(ks[1], (8, 8)),
        jax.random.randint(ks[2], (8, 4), 0, 64),
    )
    assert out.shape == (8, 5)
    assert int(out.min()) >= 0 and int(out.max()) < 256
    # reranked results come from the MIPS candidate pool: all rows distinct
    for row in np.asarray(out):
        assert len(set(row.tolist())) == 5


@pytest.mark.parametrize("nt,b,k", [(300, 16, 20), (265, 16, 20)])
def test_select_topk_chunked_matches_lax(monkeypatch, nt, b, k):
    """Hierarchical (chunked) select for inputs taller than the VMEM scratch
    limit: per-chunk top-k + survivor merge stays bit-identical to lax.top_k
    including cross-chunk ties and a short tail chunk (265: 16-row tail < k,
    exercising the survivor-list pad).  n_chunks*k > the limit also forces
    the recursive merge."""
    import two_tower_models_tpu.ops.pallas.mips_topk as M

    monkeypatch.setattr(M, "_SELECT_MAX_ROWS", 64)
    x = jax.random.normal(jax.random.key(31), (b, nt))
    x = jnp.round(x * 2) / 2  # heavy ties, spanning chunk boundaries
    xt = jnp.pad(x.T, ((0, (-nt) % 8), (0, 0)), constant_values=float("-inf"))
    val_t, idx_t = M.select_topk_t(xt, k)
    rs, ri = jax.lax.top_k(x, k)
    np.testing.assert_array_equal(np.asarray(idx_t[:, :b].T), np.asarray(ri))
    np.testing.assert_array_equal(np.asarray(val_t[:, :b].T), np.asarray(rs))


def test_select_topk_full_payload_negative_nan():
    """The one f32 value whose key is INT32_MIN (full-payload negative NaN,
    bits 0xFFFFFFFF) used to collide with the kernel's mask sentinel:
    masking the picked element left it unchanged and the same index was
    re-picked k times.  Keys are now clamped to INT32_MIN + 1 at entry, so
    picks stay distinct; values come back as (possibly payload-shifted)
    negative NaNs."""
    from two_tower_models_tpu.ops.pallas.mips_topk import (
        select_topk_t,
        select_topk_t_pruned,
    )

    k = 12
    x = np.asarray(
        jax.random.normal(jax.random.key(54), (8, 64)), np.float32
    ).copy()
    x[:, 40:] = np.float32(np.uint32(0xFFFFFFFF).view(np.float32))  # -NaNs
    xj = jnp.asarray(x)
    for fn in (select_topk_t, lambda s, kk: select_topk_t_pruned(s, kk, sup=8)):
        val_t, idx_t = fn(xj.T, k)
        idx = np.asarray(idx_t.T)
        # distinct picks per row — the collision duplicated one index
        assert all(len(set(r.tolist())) == k for r in idx)
        # NaNs sort below every finite value: none selected while finite
        # candidates remain (40 finite rows > k)
        vals = np.asarray(val_t.T)
        assert np.isfinite(vals).all()
        rs, ri = jax.lax.top_k(xj, k)
        np.testing.assert_array_equal(idx, np.asarray(ri))
        np.testing.assert_array_equal(vals, np.asarray(rs))
    # all-NaN rows: every pick still distinct, every value still a -NaN
    allnan = jnp.asarray(np.full((8, 24), x[0, 40], np.float32))
    v, i = select_topk_t(allnan.T, 5)
    idx = np.asarray(i.T)
    assert all(len(set(r.tolist())) == 5 for r in idx)
    v = np.asarray(v.T)
    assert np.isnan(v).all() and (v.view(np.uint32) >> 31 == 1).all()


def test_exact_pallas_query_blocking_smem(monkeypatch):
    """Query batches whose [B, k] tile-index prefetch exceeds the SMEM
    budget run the pipeline in blocks (hit at B=4096, k=100 on hardware —
    1.6 MB vs the 1 MB v5e SMEM): parity with the dense scan across the
    block seam, including a non-dividing batch size."""
    import two_tower_models_tpu.ops.pallas.mips_topk as M

    from two_tower_models_tpu.retrieval.mips import mips_topk

    # budget forces blocks of 256 queries at k=4
    monkeypatch.setattr(M, "_GATHER_SMEM_BYTES", 256 * 4 * 4)
    c, d, b, k = 4096, 16, 520, 4  # 520 -> 3 blocks of 256 (pad 248)
    corpus = jax.random.normal(jax.random.key(0), (c, d), jnp.float32)
    query = jax.random.normal(jax.random.key(1), (b, d), jnp.float32)
    idx, scores, emb = M.mips_topk_exact_pallas(corpus, query, k)
    ref_idx, ref_scores, ref_emb = mips_topk(corpus, query, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb), rtol=1e-6)


def test_gather_query_block_respects_smem_budget():
    """ADVICE r4: the old guard floored the block at 256 queries, so for
    k >= 512 a block's B*k*4 tile-index operand re-exceeded the 512 KB
    budget (and v5e's 1 MB SMEM outright at k >= 1024).  The block must
    fit the budget at every k, and must be None (dense fallback) when
    even 128 queries cannot fit."""
    import two_tower_models_tpu.ops.pallas.mips_topk as M

    for k in (1, 100, 128, 511, 512, 513, 1024, 1025, 4096):
        for b in (8, 256, 520, 1024, 4096, 65536):
            qblk = M._gather_query_block(b, k)
            if k > M._GATHER_SMEM_BYTES // (4 * 128):
                assert qblk is None, (b, k)
                continue
            assert qblk is not None and 1 <= qblk <= b, (b, k, qblk)
            assert qblk * k * 4 <= M._GATHER_SMEM_BYTES, (b, k, qblk)
            # blocks bigger than one dispatch stay lane-aligned
            if qblk < b:
                assert qblk % 128 == 0, (b, k, qblk)


def test_exact_pallas_large_k_dense_fallback(monkeypatch):
    """When no lane-aligned query block fits the SMEM budget the pipeline
    falls back to the dense exact scan instead of a Mosaic compile error."""
    import two_tower_models_tpu.ops.pallas.mips_topk as M

    from two_tower_models_tpu.retrieval.mips import mips_topk

    # budget too small for even a 128-query block at k=4
    monkeypatch.setattr(M, "_GATHER_SMEM_BYTES", 4 * 4 * 64)
    assert M._gather_query_block(512, 4) is None
    c, d, b, k = 4096, 16, 96, 4
    corpus = jax.random.normal(jax.random.key(2), (c, d), jnp.float32)
    query = jax.random.normal(jax.random.key(3), (b, d), jnp.float32)
    idx, scores, emb = M.mips_topk_exact_pallas(corpus, query, k)
    ref_idx, ref_scores, ref_emb = mips_topk(corpus, query, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores), rtol=1e-6
    )
    # masked variant takes the dense-fallback-with-padding branch
    idx2, _, _ = M.mips_topk_exact_pallas(corpus, query, k, valid_count=c)
    np.testing.assert_array_equal(np.asarray(idx2), np.asarray(ref_idx))
