"""Exact Maximum Inner Product Search over an item corpus.

Capability parity with the reference ``BaselineMIPSModule``
(baseline_mips_module.py:10-72): brute-force top-k of ``query @ corpus.T``
plus a gather of the winning embeddings.  Differences, deliberate:

  * The corpus is explicit state passed to every call (the reference holds it
    as a plain attribute invisible to ``state_dict`` and ``.to(device)`` —
    SURVEY §2.4), so it checkpoints and shards like any other array.
  * ``refresh_corpus`` re-embeds the catalog through the trained item tower —
    the reference retrieves from a frozen *random* corpus forever
    (baseline_mips_module.py:30), which makes recall@k meaningless.
  * ``sharded_mips_topk`` scans a corpus row-sharded across the mesh:
    per-shard top-k then a gathered merge, so the full [B, C] score matrix
    never exists on one chip.

Exact top-k paths, fastest first (measured v5e, C=1M x 64, B=1024, k=100 —
BASELINE.md):

  * ``mips_topk_exact`` — tile-max pruning with Pallas passes
    (``ops.pallas.mips_topk``); bit-exact vs ``lax.top_k``.
  * ``mips_topk_exact_tilemax`` — same algorithm, pure XLA.
  * ``mips_topk`` — plain matmul + ``lax.top_k`` (the reference's lowering;
    ~linear in C at ~0.35 ns/element).

Serving uses ``mips_topk_approx`` (hardware PartialReduce) — still the
latency winner when ~0.97 recall@100 is acceptable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mips_init(key: jax.Array, corpus_size: int, embedding_dim: int, dtype=jnp.float32):
    """Random corpus [C, DI] — matches the reference's init-time corpus
    (baseline_mips_module.py:30); refresh with ``refresh_corpus`` after training."""
    return jax.random.normal(key, (corpus_size, embedding_dim), dtype)


def mips_topk(
    corpus: jnp.ndarray,  # [C, DI]
    query: jnp.ndarray,  # [B, DI]
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact top-k by inner product.

    Returns (indices [B, k], scores [B, k], embeddings [B, k, DI]) — the
    reference's forward contract (baseline_mips_module.py:32-72).
    """
    scores = jnp.dot(
        query, corpus.T, preferred_element_type=jnp.float32
    )  # [B, C]
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_emb = jnp.take(corpus, top_idx, axis=0)  # [B, k, DI]
    return top_idx, top_scores, top_emb


def sharded_mips_topk(
    corpus_shard,  # [C/n, DI] rows, or a row-sharded retrieval.quant.QuantizedCorpus
    query: jnp.ndarray,  # [B, DI] — replicated along the shard axis
    k: int,
    axis_name,  # str or tuple of axis names (shard axis/axes of the corpus)
    valid_count: Optional[int] = None,  # global rows < this are real; rest pad
    recall_target: Optional[float] = None,  # None = exact; else local approx
    oversample: int = 4,  # int8_rescore pool factor (quantized shards w/ raw)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k over a row-sharded corpus, for use inside ``shard_map``.

    Each device computes a local top-k over its shard (global indices restored
    from the shard offset), then the k-per-shard candidates are all-gathered
    and merged with a second top-k — O(n_shards * k) merge work instead of
    O(C).  Total comms: n * k * (DI + 2) floats over ICI.

    ``axis_name`` may be a tuple (e.g. ``('data', 'model')``) to shard the
    corpus over a flattened multi-axis mesh; the global row index follows the
    same row-major axis order as ``PartitionSpec((a, b))``.  ``valid_count``
    masks padded corpus rows (catalogs are padded to a multiple of the shard
    count).  ``recall_target`` switches the per-shard scan to the serving
    ``lax.approx_max_k`` (PartialReduce); the merge stays exact over the
    per-shard candidates.

    ``corpus_shard`` may be a ``QuantizedCorpus`` whose leaves are this
    shard's rows (q [C/n, D] int8, scale [C/n], optional raw [C/n, D]): the
    local scan streams int8 (half the per-chip HBM traffic — the same win as
    the single-chip int8 path, retrieval.quant), rescore mode re-scores an
    oversampled pool against the shard's raw rows BEFORE the merge, and the
    cross-shard merge is unchanged (candidate scores are f32 either way).
    """
    from two_tower_models_tpu.retrieval.quant import (
        QuantizedCorpus,
        quantized_shard_topk,
    )

    shard = jax.lax.axis_index(axis_name)
    if isinstance(corpus_shard, QuantizedCorpus):
        n_local = corpus_shard.q.shape[0]
        kk = min(k, n_local)
        local_top, local_idx, local_emb = quantized_shard_topk(
            corpus_shard, query, kk, recall_target=recall_target,
            oversample=oversample, row_offset=shard * n_local,
            valid_count=valid_count,
        )
        return _merge_shard_candidates(
            local_top, local_idx, local_emb, shard, n_local, k, axis_name
        )
    n_local = corpus_shard.shape[0]
    kk = min(k, n_local)

    if recall_target is None and kk * 128 < n_local:
        # Large shard, exact scan: per-shard tile-max Pallas pipeline (same
        # ~10x over the dense lax.top_k scan as the single-device path —
        # ops.pallas.mips_topk).  The shard's valid-row count is dynamic
        # (depends on axis_index), which the kernel takes as an SMEM scalar.
        from two_tower_models_tpu.ops.pallas.mips_topk import (
            mips_topk_exact_pallas,
        )

        local_valid = (
            None
            if valid_count is None
            else jnp.clip(
                jnp.asarray(valid_count, jnp.int32) - shard * n_local,
                0,
                n_local,
            )
        )
        local_idx, local_top, _ = mips_topk_exact_pallas(
            corpus_shard, query, kk, valid_count=local_valid
        )
    else:
        local_scores = jnp.dot(
            query, corpus_shard.T, preferred_element_type=jnp.float32
        )
        if valid_count is not None:
            col = jax.lax.broadcasted_iota(jnp.int32, local_scores.shape, 1)
            global_col = col + shard * n_local
            local_scores = jnp.where(
                global_col < valid_count, local_scores, -jnp.inf
            )
        if recall_target is None:
            local_top, local_idx = jax.lax.top_k(local_scores, kk)  # [B, k]
        else:
            local_top, local_idx = jax.lax.approx_max_k(
                local_scores, kk, recall_target=recall_target
            )
    local_emb = jnp.take(corpus_shard, local_idx, axis=0)  # [B, k, DI]
    return _merge_shard_candidates(
        local_top, local_idx, local_emb, shard, n_local, k, axis_name
    )


def _merge_shard_candidates(
    local_top: jnp.ndarray,  # [B, kk] this shard's candidate scores
    local_idx: jnp.ndarray,  # [B, kk] shard-local row indices
    local_emb: jnp.ndarray,  # [B, kk, DI]
    shard: jnp.ndarray,  # this device's position along the shard axis/axes
    n_local: int,
    k: int,
    axis_name,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """all_gather every shard's candidates and merge with one exact top-k
    (the second half of ``sharded_mips_topk``, shared by the raw and the
    quantized local scans)."""
    global_idx = local_idx + shard * n_local

    # Gather candidates from every shard: [n, B, k...] -> concat along k.
    cand_scores = jax.lax.all_gather(local_top, axis_name)  # [n, B, k]
    cand_idx = jax.lax.all_gather(global_idx, axis_name)
    cand_emb = jax.lax.all_gather(local_emb, axis_name)  # [n, B, k, DI]

    n = cand_scores.shape[0]
    B = local_top.shape[0]
    cand_scores = jnp.moveaxis(cand_scores, 0, 1).reshape(B, -1)  # [B, n*k]
    cand_idx = jnp.moveaxis(cand_idx, 0, 1).reshape(B, -1)
    cand_emb = jnp.moveaxis(cand_emb, 0, 1).reshape(B, n * cand_emb.shape[2], -1)

    k = min(k, cand_scores.shape[1])
    top_scores, merge_idx = jax.lax.top_k(cand_scores, k)  # [B, k]
    top_idx = jnp.take_along_axis(cand_idx, merge_idx, axis=1)
    top_emb = jnp.take_along_axis(cand_emb, merge_idx[:, :, None], axis=1)
    return top_idx, top_scores, top_emb


def segmented_topk(
    scores: jnp.ndarray, k: int, num_segments: int  # [B, C]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via segment-local top-k + merge.

    Splits the C axis into segments, takes top-k within each (all true global
    top-k elements survive: a segment contributes at most its own top-k), then
    merges the num_segments*k candidates.  NOTE: measured SLOWER than plain
    ``lax.top_k`` on TPU v5e (XLA's batched narrow-axis TopK lowering is
    poor — BASELINE.md); kept for non-TPU backends and as the merge building
    block for the sharded path.
    """
    b, c = scores.shape
    seg = -(-c // num_segments)
    pad = seg * num_segments - c
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    s = scores.reshape(b, num_segments, seg)
    kk = min(k, seg)
    loc_s, loc_i = jax.lax.top_k(s, kk)  # [B, nseg, kk]
    offs = (jnp.arange(num_segments) * seg)[None, :, None]
    cand_s = loc_s.reshape(b, -1)
    cand_i = (loc_i + offs).reshape(b, -1)
    top_s, sel = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, sel, axis=1)
    return top_s, top_i


def mips_topk_segmented(
    corpus: jnp.ndarray, query: jnp.ndarray, k: int, num_segments: int = 64
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact MIPS with the segmented top-k (drop-in for mips_topk at large C)."""
    scores = jnp.dot(query, corpus.T, preferred_element_type=jnp.float32)
    top_scores, top_idx = segmented_topk(scores, k, num_segments)
    return top_idx, top_scores, jnp.take(corpus, top_idx, axis=0)


def mips_topk_exact_tilemax(
    corpus: jnp.ndarray,  # [C, DI]
    query: jnp.ndarray,  # [B, DI]
    k: int,
    tile: int = 128,
    chunk: int = 131072,
    query_block: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact MIPS top-k via tile-max pruning — the fast exact path.

    ``lax.top_k`` over [B, C] is ~linear in C at a slow constant (339 ms at
    B=1024, C=1M, k=100 on v5e — BASELINE.md).  This decomposition replaces
    the single wide selection with three cheap passes:

      1. tile maxes: m[b, t] = max(scores[b, t*tile : (t+1)*tile]) computed
         chunk-by-chunk (the [B, C] score matrix never materializes);
      2. top-k TILES by max: ``lax.top_k(m, k)`` over C/tile columns — a
         selection 128x narrower than the naive one;
      3. rescore only the selected k*tile candidates and take the final
         top-k.

    Exactness: an element with score >= s_k (the true k-th value) makes its
    tile's max >= s_k, and at most k tiles can have max >= s_k (each such
    tile contains at least one of the k elements >= s_k), so the k tiles
    selected in pass 2 contain every true top-k element.  The argument
    extends to ties because both selections are stable (lowest index wins):
    a tile containing a top-k element can only be displaced by tiles that
    each contain a strictly-higher-ranked element, and there are < k of
    those; boundary-tie winners survive too, because tiles tied at the
    threshold max are taken in ascending tile order — the same order dense
    ``lax.top_k`` prefers their candidates in.  The selected tiles are then
    SORTED ascending before the rescore so the candidate pool is in global
    index order, making pass 3's positional tie-break identical to dense
    ``lax.top_k``'s lowest-index rule — bit-exact including cross-tile ties.

    Measured (v5e, C=1M x 64 bf16, B=1024, k=100): see BASELINE.md — this is
    the offline-eval exact path; serving stays on ``mips_topk_approx``.
    """
    c, di = corpus.shape
    b = query.shape[0]
    k = min(k, c)
    n_tiles = -(-c // tile)
    if k * tile >= c or n_tiles < k:
        return mips_topk(corpus, query, k)

    # pad corpus so both the chunk scan and the tile reshape are static
    chunk = min(chunk, n_tiles * tile)
    chunk = -(-chunk // tile) * tile
    pad = (-c) % chunk if c > chunk else (n_tiles * tile - c)
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
    c_pad = corpus_p.shape[0]
    n_tiles_pad = c_pad // tile

    def topk_block(q):  # [qb, DI] -> (idx, scores, emb) for one query block
        qb = q.shape[0]

        # -- pass 1: tile maxes, chunked so peak memory is [qb, chunk] ------
        n_chunks = c_pad // chunk
        chunks = corpus_p.reshape(n_chunks, chunk, di)

        def body(_, inp):
            chunk_rows, chunk_no = inp
            s = jnp.dot(q, chunk_rows.T, preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col + chunk_no * chunk < c, s, -jnp.inf)
            return None, jnp.max(s.reshape(qb, chunk // tile, tile), axis=-1)

        _, m = jax.lax.scan(body, None, (chunks, jnp.arange(n_chunks)))
        m = jnp.moveaxis(m, 0, 1).reshape(qb, n_tiles_pad)  # [qb, C/tile]

        # -- pass 2: top-k tiles ------------------------------------------
        _, tile_idx = jax.lax.top_k(m, k)  # [qb, k]
        # ascending tile order makes the candidate pool globally
        # index-ordered, so pass 4's positional tie-break reproduces dense
        # lax.top_k's lowest-index rule exactly (see exactness note above)
        tile_idx = jnp.sort(tile_idx, axis=1)

        # -- pass 3: rescore candidates -----------------------------------
        corpus_tiles = corpus_p.reshape(n_tiles_pad, tile, di)
        cand = jnp.take(corpus_tiles, tile_idx, axis=0)  # [qb, k, tile, DI]
        cand_scores = jnp.einsum(
            "bktd,bd->bkt", cand, q, preferred_element_type=jnp.float32
        )
        cand_gidx = tile_idx[:, :, None] * tile + jnp.arange(tile)[None, None, :]
        cand_scores = jnp.where(cand_gidx < c, cand_scores, -jnp.inf)
        cand_scores = cand_scores.reshape(qb, k * tile)
        cand_gidx = cand_gidx.reshape(qb, k * tile)

        top_scores, sel = jax.lax.top_k(cand_scores, k)
        top_idx = jnp.take_along_axis(cand_gidx, sel, axis=1)
        cand_emb = cand.reshape(qb, k * tile, di)
        top_emb = jnp.take_along_axis(cand_emb, sel[:, :, None], axis=1)
        return top_idx, top_scores, top_emb

    if b <= query_block:
        return topk_block(query)
    # block the queries to bound the pass-3 gather ([qb, k*tile, DI])
    qpad = (-b) % query_block
    q_all = jnp.pad(query, ((0, qpad), (0, 0))) if qpad else query
    nq = q_all.shape[0] // query_block
    _, outs = jax.lax.scan(
        lambda _, q: (None, topk_block(q)),
        None,
        q_all.reshape(nq, query_block, di),
    )
    idx, scores, emb = (x.reshape(-1, *x.shape[2:])[:b] for x in outs)
    return idx, scores, emb


def mips_topk_exact(
    corpus: jnp.ndarray, query: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The fast exact path: Pallas tile-max pipeline (ops.pallas.mips_topk),
    bit-exact vs ``lax.top_k`` and ~10x faster at 1M x 64 / k=100 on v5e
    (BASELINE.md).  Falls back to the dense scan for corpora small enough
    that pruning can't help (k*tile >= C)."""
    from two_tower_models_tpu.ops.pallas.mips_topk import mips_topk_exact_pallas

    return mips_topk_exact_pallas(corpus, query, k)


def mips_topk_approx(
    corpus: jnp.ndarray, query: jnp.ndarray, k: int, recall_target: float = 0.95
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """TPU-native approximate MIPS via ``lax.approx_max_k`` (the hardware
    PartialReduce op built for exactly this workload).  ~47x faster than
    exact ``lax.top_k`` at C=1M/k=100 (7.2 ms vs 339 ms per 1024-query batch
    on v5e — lax.top_k is ~linear in row width at a slow constant); measured
    recall@100: 0.95 target -> 0.974 actual, 0.99 -> 0.996 (BASELINE.md).
    Serving path; keep exact for offline eval."""
    scores = jnp.dot(query, corpus.T, preferred_element_type=jnp.float32)
    top_scores, top_idx = jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return top_idx, top_scores, jnp.take(corpus, top_idx, axis=0)


def chunked_mips_topk(
    corpus: jnp.ndarray,  # [C, DI]
    query: jnp.ndarray,  # [B, DI]
    k: int,
    chunk_size: int = 65536,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact top-k with O(B * chunk) peak memory instead of O(B * C).

    A ``lax.scan`` over corpus chunks keeps a running candidate set of k
    (scores, indices) per query and merges each chunk's local top-k into it —
    the full [B, C] score matrix never exists.  Use when C is too large for
    one [B, C] buffer (e.g. C = 100M, B = 1k, fp32 -> 400 GB).
    """
    c, di = corpus.shape
    b = query.shape[0]
    if c <= chunk_size:
        return mips_topk(corpus, query, k)
    k = min(k, c)
    pad = (-c) % chunk_size
    corpus_p = jnp.pad(corpus, ((0, pad), (0, 0)))
    n_chunks = corpus_p.shape[0] // chunk_size
    chunks = corpus_p.reshape(n_chunks, chunk_size, di)

    init_scores = jnp.full((b, k), -jnp.inf, jnp.float32)
    init_idx = jnp.zeros((b, k), jnp.int32)

    def body(carry, inp):
        best_s, best_i = carry
        chunk, chunk_no = inp
        scores = jnp.dot(query, chunk.T, preferred_element_type=jnp.float32)
        base = chunk_no * chunk_size
        # mask padded rows of the final chunk
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        scores = jnp.where(col < c, scores, -jnp.inf)
        local_s, local_i = jax.lax.top_k(scores, min(k, chunk_size))
        cand_s = jnp.concatenate([best_s, local_s], axis=1)
        cand_i = jnp.concatenate([best_i, local_i + base], axis=1)
        new_s, sel = jax.lax.top_k(cand_s, k)
        new_i = jnp.take_along_axis(cand_i, sel, axis=1)
        return (new_s, new_i), None

    (top_scores, top_idx), _ = jax.lax.scan(
        body, (init_scores, init_idx), (chunks, jnp.arange(n_chunks))
    )
    top_emb = jnp.take(corpus, top_idx, axis=0)
    return top_idx, top_scores, top_emb


def refresh_corpus(
    params,
    cfg,
    item_ids: jnp.ndarray,  # [C] catalog ids
    item_features: jnp.ndarray,  # [C, II] catalog features
    batch_size: int = 4096,
) -> jnp.ndarray:
    """Re-embed the catalog through the trained item tower -> [C, DI].

    The train/infer disconnect in the reference (random corpus never updated,
    SURVEY §2.4) is closed here: call after training (or periodically) so MIPS
    retrieves from the embeddings the loss actually shaped.
    """
    from two_tower_models_tpu.models.two_tower import compute_item_embeddings

    c = item_ids.shape[0]
    pad = (-c) % batch_size
    ids = jnp.pad(item_ids, (0, pad))
    feats = jnp.pad(item_features, ((0, pad), (0, 0)))
    n_batches = ids.shape[0] // batch_size

    def body(_, chunk):
        chunk_ids, chunk_feats = chunk
        emb = compute_item_embeddings(params, cfg, chunk_ids, chunk_feats)
        return None, emb

    _, embs = jax.lax.scan(
        body,
        None,
        (
            ids.reshape(n_batches, batch_size),
            feats.reshape(n_batches, batch_size, -1),
        ),
    )
    return embs.reshape(-1, embs.shape[-1])[:c]
