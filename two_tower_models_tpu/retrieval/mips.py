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

The single-chip hot path is a plain jnp matmul + ``lax.top_k`` — XLA already
tiles the [B, C] x [C, DI] contraction onto the MXU; a Pallas variant for
very large corpora lives in ``ops.pallas.mips_topk``.
"""

from __future__ import annotations

from typing import Tuple

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
    corpus_shard: jnp.ndarray,  # [C/n, DI] — this device's rows
    query: jnp.ndarray,  # [B, DI] — replicated along the shard axis
    k: int,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-k over a row-sharded corpus, for use inside ``shard_map``.

    Each device computes a local top-k over its shard (global indices restored
    from the shard offset), then the k-per-shard candidates are all-gathered
    and merged with a second top-k — O(n_shards * k) merge work instead of
    O(C).  Total comms: n * k * (DI + 2) floats over ICI.
    """
    shard = jax.lax.axis_index(axis_name)
    n_local = corpus_shard.shape[0]

    local_scores = jnp.dot(query, corpus_shard.T, preferred_element_type=jnp.float32)
    local_top, local_idx = jax.lax.top_k(local_scores, min(k, n_local))  # [B, k]
    local_emb = jnp.take(corpus_shard, local_idx, axis=0)  # [B, k, DI]
    global_idx = local_idx + shard * n_local

    # Gather candidates from every shard: [n, B, k...] -> concat along k.
    cand_scores = jax.lax.all_gather(local_top, axis_name)  # [n, B, k]
    cand_idx = jax.lax.all_gather(global_idx, axis_name)
    cand_emb = jax.lax.all_gather(local_emb, axis_name)  # [n, B, k, DI]

    n = cand_scores.shape[0]
    B = query.shape[0]
    cand_scores = jnp.moveaxis(cand_scores, 0, 1).reshape(B, -1)  # [B, n*k]
    cand_idx = jnp.moveaxis(cand_idx, 0, 1).reshape(B, -1)
    cand_emb = jnp.moveaxis(cand_emb, 0, 1).reshape(B, n * cand_emb.shape[2], -1)

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
