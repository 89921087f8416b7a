"""int8-quantized MIPS corpus: serving scoring at half the HBM traffic.

The serving scoring pass (``query @ corpus.T`` + approx_max_k) is
HBM-bandwidth-bound at production corpus sizes: every query batch streams
the whole [C, D] corpus once, and the MXU is idle waiting on it (bench_mips:
the 1M x 64 bf16 scan moves 128 MB/batch against ~4 GFLOP — ~2% MFU).
Symmetric per-row int8 quantization halves the streamed bytes (and the
corpus HBM footprint) at a sub-point recall cost:

  q[c] = round(corpus[c] / scale[c]),  scale[c] = max|corpus[c]| / 127

  scores[b, c] ≈ scale[c] * <query_b, q_c>

The int8 -> bf16 convert fuses into the scoring matmul (int8 values up to
127 are EXACT in bf16 — 8 significand bits — so the only error is the
rounding already baked into q), accumulation stays f32 via
``preferred_element_type``, and the per-row scale applies as a [B, C]
epilogue that XLA fuses into the selection's consumer.

Two serving modes (``mips_topk_quantized``):

  * pure-quantized — top-k directly on the corrected quantized scores;
    memory AND bandwidth win; recall@100 within ~0.5pt of the bf16 scan at
    D=64 (property-tested; hardware numbers in BASELINE.md).
  * rescore — retrieve ``oversample * k`` candidates on quantized scores,
    re-score just those rows against a full-precision corpus, exact top-k
    of the rescored pool.  Bandwidth win only (the raw corpus stays in HBM
    for the gather), recall indistinguishable from the full-precision scan
    at small oversample (the quantized scan only has to get the winners
    into the pool, not order them).

The reference has no quantized path (its MIPS is ``torch.topk`` over an
fp32 random corpus, baseline_mips_module.py:57-61); this is at-scale
serving machinery in the ScaNN mold (score-aware quantized scan + exact
re-rank).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class QuantizedCorpus(NamedTuple):
    """Symmetric per-row int8 corpus.  A pytree — shards / donates / ships
    through jit like the raw [C, D] array it replaces.  ``raw`` holds the
    full-precision rows when the rescore mode is wanted (bandwidth win
    only); None trades the last fraction of a recall point for the 2x
    corpus-memory win too."""

    q: jnp.ndarray  # [C, D] int8
    scale: jnp.ndarray  # [C] f32 — per-row dequant scale (>= tiny, never 0)
    raw: Optional[jnp.ndarray] = None  # [C, D] — kept only for rescoring

    @property
    def shape(self):  # mirror the raw corpus where callers only need [C, D]
        return self.q.shape


def quantize_corpus(
    corpus: jnp.ndarray, keep_raw: bool = False
) -> QuantizedCorpus:
    """[C, D] float -> per-row symmetric int8 + f32 scales.

    Zero rows (padded catalog slots) get scale 1 so dequantization is exact
    zeros, not NaN."""
    c32 = corpus.astype(jnp.float32)
    amax = jnp.max(jnp.abs(c32), axis=-1)  # [C]
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(c32 / scale[:, None]), -127, 127).astype(jnp.int8)
    return QuantizedCorpus(q=q, scale=scale, raw=corpus if keep_raw else None)


def dequantize(qc: QuantizedCorpus, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Reconstruct [C, D] rows (used for candidate embeddings in the
    pure-quantized mode — the rerank consumes the same rows the scan
    scored)."""
    return (qc.q.astype(jnp.float32) * qc.scale[:, None]).astype(dtype)


def quantized_scores(query: jnp.ndarray, qc: QuantizedCorpus) -> jnp.ndarray:
    """[B, C] f32 approximate inner products.  The int8 operand converts to
    the query dtype INSIDE the matmul fusion (1 byte/element streamed from
    HBM); int8 magnitudes are exact in bf16, so quantization rounding is the
    only approximation."""
    s = jnp.dot(
        query, qc.q.T.astype(query.dtype), preferred_element_type=jnp.float32
    )  # [B, C]
    return s * qc.scale[None, :]


def quantized_shard_topk(
    qc: QuantizedCorpus,
    query: jnp.ndarray,  # [B, D]
    k: int,
    recall_target: Optional[float] = 0.95,  # None = exact top-k of q-scores
    oversample: int = 4,
    row_offset=0,  # global index of this shard's row 0 (traced OK)
    valid_count=None,  # GLOBAL rows < this are real; rest are padding
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Local top-k of one quantized corpus (shard): (scores [B, k],
    local indices [B, k], embeddings [B, k, D]).

    The building block both the single-chip and the mesh-sharded int8 paths
    share: quantized scan (+ padded-row masking against GLOBAL row indices,
    for shards of a padded catalog), then either direct selection (pure
    mode) or an ``oversample * k`` pre-selection re-scored at full precision
    against ``qc.raw`` (rescore mode).  Inside ``shard_map`` the caller
    passes ``row_offset = axis_index * rows_per_shard``; padded rows keep
    ``-inf`` through the rescore so they can never displace a real
    candidate in the cross-shard merge."""
    n_local = qc.q.shape[0]
    k = min(k, n_local)
    m = min(oversample * k, n_local) if qc.raw is not None else k
    s = quantized_scores(query, qc)
    if valid_count is not None:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + row_offset
        s = jnp.where(col < valid_count, s, -jnp.inf)
    if recall_target is None:
        pre_s, pre_i = jax.lax.top_k(s, m)
    else:
        pre_s, pre_i = jax.lax.approx_max_k(s, m, recall_target=recall_target)
    if qc.raw is None:
        # dequantize only the selected rows (never the whole shard)
        emb = (
            jnp.take(qc.q, pre_i, axis=0).astype(jnp.float32)
            * jnp.take(qc.scale, pre_i, axis=0)[..., None]
        ).astype(query.dtype)
        return pre_s, pre_i, emb

    cand = jnp.take(qc.raw, pre_i, axis=0)  # [B, m, D]
    exact = jnp.einsum(
        "bmd,bd->bm", cand.astype(query.dtype), query,
        preferred_element_type=jnp.float32,
    )
    # padded rows entered the pool at -inf; keep them there post-rescore
    exact = jnp.where(jnp.isneginf(pre_s), -jnp.inf, exact)
    top_s, sel = jax.lax.top_k(exact, k)  # [B, k] over the candidate pool
    top_i = jnp.take_along_axis(pre_i, sel, axis=1)
    top_e = jnp.take_along_axis(cand, sel[:, :, None], axis=1)
    return top_s, top_i, top_e


def mips_topk_quantized(
    qc: QuantizedCorpus,
    query: jnp.ndarray,  # [B, D]
    k: int,
    recall_target: Optional[float] = 0.95,  # None = exact top-k of q-scores
    rescore_corpus: Optional[jnp.ndarray] = None,  # [C, D] full-precision
    oversample: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(indices [B, k], scores [B, k], embeddings [B, k, D]) — the
    ``mips_topk`` contract over an int8 corpus.

    Without full-precision rows (``rescore_corpus`` arg or ``qc.raw``):
    selection and returned scores/embeddings are quantized (embeddings
    dequantized per-row).  With them: an ``oversample * k`` quantized
    pre-selection is re-scored against the full-precision rows and the
    final top-k + scores + embeddings are exact over that pool."""
    if rescore_corpus is not None:
        qc = qc._replace(raw=rescore_corpus)
    s, i, e = quantized_shard_topk(
        qc, query, k, recall_target=recall_target, oversample=oversample
    )
    return i, s, e
