"""Serving-side retrieval engine.

The reference's inference path is ``forward`` on the training module against
a random frozen corpus (two_tower_base_retrieval.py:221-249 + SURVEY §2.4).
Serving here is a separate, deliberately small surface:

  * the corpus is built from the TRAINED item tower over the real catalog
    (``retrieval.mips.refresh_corpus``, chunked so 10M-item catalogs embed
    without a [C, ...] activation blowup);
  * queries run through one jitted function (user tower + MIPS [+ light
    ranker rerank]) with the serving-grade approximate top-k
    (``ModelConfig.approx_mips``) — ~47x lower latency at recall@100≈0.97;
  * params/corpus are captured as constants-by-reference: no per-request
    re-tracing, no host round trips besides the query batch itself.

Measured end-to-end (scripts/bench_serving.py, v5e): see BASELINE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import ModelConfig
from two_tower_models_tpu.models.two_tower import retrieve
from two_tower_models_tpu.retrieval.mips import refresh_corpus


class RetrievalEngine:
    """Frozen (params, corpus) + one compiled query function.

    With ``mesh`` set, the corpus is row-sharded over EVERY mesh device and
    queries run through the sharded scan + exact merge
    (``parallel.retrieval.make_sharded_retrieval_fn``): corpora larger than
    one chip's HBM serve directly, and each chip scans only C/n rows.
    ``valid_count`` marks the real (un-padded) corpus rows; defaults to the
    full corpus length.

    ``quantize="int8"`` serves from a symmetric per-row int8 corpus
    (retrieval.quant): half the scan bandwidth and corpus memory at a
    sub-point recall cost; ``"int8_rescore"`` keeps the raw rows and
    re-scores an oversampled candidate pool — full-precision recall at the
    quantized scan's speed.  Both compose with ``mesh``: the quantized
    corpus row-shards over every device like the raw one (quantization runs
    sharded in place — parallel.retrieval.quantize_corpus_sharded), each
    chip scans C/n int8 rows, rescore happens shard-locally before the
    exact cross-shard merge.
    """

    def __init__(
        self,
        params,
        cfg: ModelConfig,
        corpus: jnp.ndarray,
        mesh=None,
        valid_count: int | None = None,
        tower_tp: bool = False,
        quantize: str | None = None,  # None | "int8" | "int8_rescore"
    ):
        if quantize is not None:
            if quantize not in ("int8", "int8_rescore"):
                raise ValueError(f"quantize must be int8|int8_rescore, got {quantize!r}")
            keep_raw = quantize == "int8_rescore"
            if mesh is not None:
                from two_tower_models_tpu.parallel.retrieval import (
                    quantize_corpus_sharded,
                )

                corpus = quantize_corpus_sharded(corpus, mesh, keep_raw)
            else:
                from two_tower_models_tpu.retrieval.quant import quantize_corpus

                corpus = quantize_corpus(corpus, keep_raw=keep_raw)
        self._quantize = quantize
        # (params, corpus) live in ONE reference so refresh() can swap them
        # atomically under the GIL — a query racing a refresh must never see
        # new user embeddings scored against an old-space corpus
        self._state = (params, corpus)
        self._cfg = cfg
        self._mesh = mesh
        self._tower_tp = tower_tp
        self._valid_count = int(
            corpus.shape[0] if valid_count is None else valid_count
        )

        if mesh is None:
            def _query(params, corpus, user_id, user_features, user_history, hlen):
                return retrieve(
                    params, cfg, corpus, user_id, user_features, user_history,
                    history_len=hlen,
                )

            self._query = jax.jit(_query)
        else:
            from two_tower_models_tpu.parallel.retrieval import (
                make_sharded_retrieval_fn,
            )

            fn = make_sharded_retrieval_fn(cfg, mesh, tower_tp=tower_tp)
            vc = self._valid_count
            self._query = lambda p, c, uid, uf, uh, hl: fn(p, c, uid, uf, uh, hl, vc)

    @classmethod
    def from_params(
        cls,
        params,
        cfg: ModelConfig,
        catalog_ids: jnp.ndarray,
        catalog_features: jnp.ndarray,
        embed_batch_size: int = 4096,
        mesh=None,
        tower_tp: bool = False,
        quantize: str | None = None,
    ) -> "RetrievalEngine":
        """Build the corpus from the trained item tower, then serve it."""
        if mesh is not None:
            from two_tower_models_tpu.parallel.retrieval import (
                make_sharded_refresh_fn,
                pad_catalog,
            )

            ids, feats, valid_c = pad_catalog(catalog_ids, catalog_features, mesh)
            corpus = make_sharded_refresh_fn(cfg, mesh, tower_tp=tower_tp)(
                params, ids, feats
            )
            return cls(
                params, cfg, corpus, mesh=mesh, valid_count=valid_c,
                tower_tp=tower_tp, quantize=quantize,
            )
        corpus = refresh_corpus(
            params, cfg, catalog_ids, catalog_features, batch_size=embed_batch_size
        )
        return cls(params, cfg, corpus, quantize=quantize)

    @property
    def corpus(self) -> jnp.ndarray:
        return self._state[1]

    def query(
        self,
        user_id: jnp.ndarray,  # [B]
        user_features: jnp.ndarray,  # [B, IU]
        user_history: jnp.ndarray,  # [B, H]
        history_len: jnp.ndarray | None = None,  # [B] int32, optional
    ) -> jnp.ndarray:
        """Top ``cfg.num_items`` corpus indices per user, [B, num_items].

        ``history_len`` marks per-example real history lengths (positions
        beyond it are padding, masked in the encoder exactly as in
        training); None means all H positions are real."""
        params, corpus = self._state  # one atomic read of the matched pair
        return self._query(
            params, corpus, user_id, user_features, user_history,
            history_len,
        )

    def query_raw(
        self,
        user_keys,  # [B] raw keys: uint64 surrogate ids or strings/bytes
        user_features: jnp.ndarray,  # [B, IU]
        history_keys,  # [B, H] raw item keys, newest first
        history_len: jnp.ndarray | None = None,  # [B] int32, optional
    ) -> jnp.ndarray:
        """Serve from RAW entity keys: the same host-side C++ hash the
        training ingest uses (training.ingest — fixed per-table seeds) maps
        keys to table slots, then the compiled query runs unchanged."""
        from two_tower_models_tpu.training.ingest import (
            hash_item_keys,
            hash_user_keys,
        )

        return self.query(
            jnp.asarray(hash_user_keys(user_keys, self._cfg)),
            user_features,
            jnp.asarray(hash_item_keys(history_keys, self._cfg)),
            history_len,
        )

    def warmup(self, batch_size: int, variable_history: bool = False) -> None:
        """Compile the query function for a batch size ahead of traffic.

        ``variable_history=True`` also compiles the ``history_len`` variant
        (a different argument pytree -> its own executable): without it, the
        first per-example-length production query would pay a full XLA
        compile at traffic time — the spike warmup exists to prevent."""
        cfg = self._cfg
        uid = jnp.zeros((batch_size,), jnp.int32)
        ufeat = jnp.zeros((batch_size, cfg.user_features_size), jnp.float32)
        uhist = jnp.zeros((batch_size, cfg.history_len), jnp.int32)
        self.query(uid, ufeat, uhist)
        if variable_history:
            self.query(
                uid, ufeat, uhist,
                history_len=jnp.full((batch_size,), cfg.history_len, jnp.int32),
            )

    def refresh(
        self,
        params,
        catalog_ids: jnp.ndarray,
        catalog_features: jnp.ndarray,
        embed_batch_size: int = 4096,
    ) -> None:
        """Swap in newly trained params + rebuilt corpus (e.g. after an
        online-training publish).  The jitted query re-runs without
        recompilation — shapes are unchanged.  The corpus is rebuilt BEFORE
        the single (params, corpus) reference swaps, so a query racing the
        refresh sees either the fully-old or fully-new pair, never new user
        embeddings scored against an old-space corpus.  (The pair lives in
        one tuple: two separate attribute assignments would let a reader
        between them observe the skewed combination.)"""
        if self._mesh is not None:
            from two_tower_models_tpu.parallel.retrieval import (
                make_sharded_refresh_fn,
                pad_catalog,
            )

            ids, feats, valid_c = pad_catalog(
                catalog_ids, catalog_features, self._mesh
            )
            corpus = make_sharded_refresh_fn(
                self._cfg, self._mesh, tower_tp=self._tower_tp
            )(params, ids, feats)
            assert valid_c == self._valid_count, (
                "catalog size changed across refresh; rebuild the engine "
                "(the jitted query closes over valid_count)"
            )
            if self._quantize is not None:
                from two_tower_models_tpu.parallel.retrieval import (
                    quantize_corpus_sharded,
                )

                corpus = quantize_corpus_sharded(
                    corpus, self._mesh, self._quantize == "int8_rescore"
                )
        else:
            corpus = refresh_corpus(
                params, self._cfg, catalog_ids, catalog_features,
                batch_size=embed_batch_size,
            )
            if self._quantize is not None:
                from two_tower_models_tpu.retrieval.quant import quantize_corpus

                corpus = quantize_corpus(
                    corpus, keep_raw=self._quantize == "int8_rescore"
                )
        self._state = (params, corpus)
