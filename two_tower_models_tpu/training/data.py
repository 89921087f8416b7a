"""Synthetic recommendation dataset.

Capability parity with the reference's ``DummyRecDataset``
(train/train.py:20-79) with its label defect fixed: labels here are [N, T]
per-task (the reference emits [N] and silently collapses the per-example
weighting to a scalar, SURVEY §2.4).

Unlike the reference's host-side ``DataLoader`` (a per-batch host->device
copy, train/train.py:101-107), the whole dataset is generated on device once
and batches are sliced with a gather inside jit — zero per-step host traffic.
A learnable structure knob ties labels to user/item id parity so recall@k has
signal to find (pure-random labels make eval meaningless).
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import DataConfig
from two_tower_models_tpu.models.two_tower import Batch


class SyntheticRecData(NamedTuple):
    user_ids: jnp.ndarray  # [N]
    user_features: jnp.ndarray  # [N, F]
    user_history: jnp.ndarray  # [N, H]
    item_ids: jnp.ndarray  # [N]
    item_features: jnp.ndarray  # [N, F]
    positions: jnp.ndarray  # [N]
    labels: jnp.ndarray  # [N, T]
    # catalog for MIPS corpus refresh / eval
    catalog_ids: jnp.ndarray  # [C]
    catalog_features: jnp.ndarray  # [C, F]
    # optional per-example valid-history lengths (DataConfig.variable_history)
    history_lens: jnp.ndarray = None  # [N] int32 in [1, H], or None
    # smoothed empirical log item-sampling probability, aligned with
    # catalog_ids (sorted ascending) — consumed by extend_batch when
    # ModelConfig.logq_correction is on
    catalog_logq: jnp.ndarray = None  # [C] f32, or None

    @property
    def num_samples(self) -> int:
        return self.user_ids.shape[0]


def make_synthetic_data(
    cfg: DataConfig, *, structured: bool = True, label_cols: int | None = None
) -> SyntheticRecData:
    """Generate the full dataset on device.

    ``structured=True`` plants learnable signal: engagement probability is
    higher when ``user_id % 8 == item_id % 8`` (an 8-group affinity), so a
    trained model beats random recall.  ``structured=False`` reproduces the
    reference's pure-noise labels (train/train.py:53-55).
    """
    t = label_cols or cfg.num_tasks
    k = jax.random.key(cfg.seed)
    ks = jax.random.split(k, 8)
    n = cfg.num_samples

    user_ids = jax.random.randint(ks[0], (n,), 0, cfg.num_users)
    if cfg.popularity_skew > 0:
        # Zipf-distributed engagement: item id r drawn ∝ 1/(r+1)^skew (id
        # order doubles as popularity rank).  This is the head-heavy regime
        # the logQ correction / mixed negatives target.
        # Inverse-CDF draw, NOT jax.random.categorical: categorical
        # materializes [n, C] Gumbel noise (512 GiB at the TPU-scale anchor
        # n=2.1M, C=65536 — measured HBM OOM, r4); searchsorted against the
        # [C] cdf is O(n log C) compute and O(n + C) memory.
        logits = -cfg.popularity_skew * jnp.log(
            jnp.arange(1, cfg.num_items + 1, dtype=jnp.float32)
        )
        cdf = jnp.cumsum(jax.nn.softmax(logits))
        u = jax.random.uniform(ks[1], (n,))
        item_ids = jnp.minimum(
            jnp.searchsorted(cdf, u, side="right"), cfg.num_items - 1
        ).astype(jnp.int32)
    else:
        item_ids = jax.random.randint(ks[1], (n,), 0, cfg.num_items)
    user_features = jax.random.normal(ks[2], (n, cfg.feature_dim))
    item_features_noise = jax.random.normal(ks[3], (n, cfg.feature_dim))
    user_history = jax.random.randint(ks[4], (n, cfg.history_len), 0, cfg.num_items)
    positions = jax.random.randint(ks[5], (n,), 0, cfg.max_position)

    history_lens = None
    if cfg.variable_history:
        # Per-example lengths in [1, H]; positions past the length are
        # PADDING (id 0) — the encoder masks them via Batch.history_len.
        history_lens = jax.random.randint(ks[7], (n,), 1, cfg.history_len + 1)
        pos = jnp.arange(cfg.history_len)
        user_history = jnp.where(pos[None, :] < history_lens[:, None], user_history, 0)

    # Catalog: a fixed feature vector per item id, so the item tower sees a
    # consistent item -> feature mapping (feature = hash-seeded noise).
    catalog_ids = jnp.arange(cfg.num_items)
    catalog_features = jax.random.normal(
        jax.random.key(cfg.seed + 1), (cfg.num_items, cfg.feature_dim)
    )
    # Per-sample item features come from the catalog (consistent), not fresh
    # noise; keep a small noise term to mimic contextual features.
    item_features = catalog_features[item_ids] + 0.1 * item_features_noise

    if structured:
        affinity = (user_ids % 8 == item_ids % 8).astype(jnp.float32)
        p = 0.1 + 0.7 * affinity  # P(engage) 0.8 on-affinity vs 0.1 off
        labels = jax.random.bernoulli(ks[6], p[:, None], (n, t)).astype(jnp.float32)
    else:
        labels = jax.random.bernoulli(ks[6], 0.5, (n, t)).astype(jnp.float32)

    # Smoothed empirical item log-frequency (add-one): the log sampling
    # probability each in-batch item was drawn with, for logq_correction.
    counts = jnp.bincount(item_ids, length=cfg.num_items).astype(jnp.float32)
    catalog_logq = jnp.log((counts + 1.0) / (n + cfg.num_items))

    return SyntheticRecData(
        user_ids=user_ids,
        user_features=user_features,
        user_history=user_history,
        item_ids=item_ids,
        item_features=item_features,
        positions=positions,
        labels=labels,
        catalog_ids=catalog_ids,
        catalog_features=catalog_features,
        history_lens=history_lens,
        catalog_logq=catalog_logq,
    )


def gather_batch(data: SyntheticRecData, idx: jnp.ndarray) -> Batch:
    """Slice a batch by index vector — runs inside jit (device gather)."""
    return Batch(
        user_id=data.user_ids[idx],
        user_features=data.user_features[idx],
        user_history=data.user_history[idx],
        item_id=data.item_ids[idx],
        item_features=data.item_features[idx],
        position=data.positions[idx],
        labels=data.labels[idx],
        history_len=None if data.history_lens is None else data.history_lens[idx],
    )


def extend_batch(
    model_cfg,
    data: SyntheticRecData,
    batch: Batch,
    rng: jax.Array,
    catalog_logq: jnp.ndarray | None = None,
) -> Batch:
    """Fill the mixed-negative / logQ fields of a batch (jit-safe).

    With ``model_cfg.mixed_negatives = B'``, draws B' catalog rows uniformly
    (ids + their catalog features) as extra softmax negatives.  With
    ``logq_correction``, attaches each candidate's log proposal probability
    under the MIXED distribution the pool was actually drawn from (Yang et
    al. 2020): Q*(j) ∝ B·p(j) + B'/C, where p is the data's item frequency
    (``data.catalog_logq``, aligned with the sorted ``catalog_ids``).  The
    1/(B+B') normalizer is a constant logit shift, invariant under softmax,
    and is dropped; with B' = 0 the formula reduces to the plain in-batch
    correction log p(j) + const.  No-op when both features are off — callers
    on the parity path never see an rng split or extra fields.

    ``catalog_logq`` overrides ``data.catalog_logq`` — the hook for the
    STREAMING frequency estimator (training.freq_estimator), which has no
    whole-dataset oracle."""
    b_extra = int(model_cfg.mixed_negatives)
    if b_extra == 0 and not model_cfg.logq_correction:
        return batch
    if catalog_logq is None:
        catalog_logq = data.catalog_logq
    c = data.catalog_ids.shape[0]
    # stacked multi-step dispatch batches ([K, B] ids) get independent
    # negatives per step row: lead = (K,) there, () for a single step
    lead = batch.item_id.shape[:-1]
    b = batch.item_id.shape[-1]
    upd = {}
    if model_cfg.logq_correction and catalog_logq is None:
        raise ValueError(
            "logq_correction needs data.catalog_logq (log sampling "
            "probability per catalog item, aligned with catalog_ids)"
        )
    if model_cfg.logq_correction:
        # log(B·p(j) + B'/C) per catalog item, computed stably in log space
        mix_logq = jnp.logaddexp(
            jnp.log(float(b)) + catalog_logq,
            jnp.full_like(catalog_logq, jnp.log(float(b_extra) / c))
            if b_extra
            else jnp.full_like(catalog_logq, -jnp.inf),
        )
    if b_extra > 0:
        slot = jax.random.randint(rng, lead + (b_extra,), 0, c)
        upd["neg_item_id"] = data.catalog_ids[slot].astype(batch.item_id.dtype)
        upd["neg_item_features"] = data.catalog_features[slot]
        if model_cfg.logq_correction:
            upd["neg_logq"] = mix_logq[slot]
    if model_cfg.logq_correction:
        pos = jnp.searchsorted(data.catalog_ids, batch.item_id).astype(jnp.int32)
        upd["item_logq"] = mix_logq[pos]
    return batch._replace(**upd)


def extend_batch_for_idx(
    model_cfg,
    data: SyntheticRecData,
    batch: Batch,
    base_key: jax.Array,
    idx: jnp.ndarray,
) -> Batch:
    """extend_batch keyed by the batch's own sample indices: the key folds
    idx[...0], so negatives are a pure function of (seed, batch schedule) —
    identical across hosts AND across checkpoint resume (a restarted run
    reconstructs the same schedule and draws the same negatives; a side
    counter would restart at 0 and diverge)."""
    if not (model_cfg.mixed_negatives or model_cfg.logq_correction):
        return batch
    key = jax.random.fold_in(base_key, jnp.asarray(idx).reshape(-1)[0])
    return extend_batch(model_cfg, data, batch, key)


def attach_streaming_logq(
    model_cfg,
    train_cfg,
    batch: Batch,
    est,
    catalog_ids: jnp.ndarray,
):
    """Fill ``item_logq`` / ``neg_logq`` from the STREAMING estimator and
    advance it (training.freq_estimator).  Corrections use the estimator's
    CURRENT estimate (cold start = uniform prior, a constant logit shift
    softmax ignores), then the batch's items fold in.  Same mixed-proposal
    formula as ``extend_batch`` — log(B·p̂(j) + B'/C) — with p̂ from decayed
    counts instead of the oracle.

    This is the jit-safe second stage of the streaming batch build: it needs
    only (batch, estimator, catalog ids), no dataset — so on MULTIHOST it
    runs as a global jit over the lifted batch while the negative DRAW stays
    host-local (training/loop.py).  Every host computes the identical
    replicated estimator update (the batch ids are global), zero extra
    communication.  Returns (batch, new_est)."""
    from two_tower_models_tpu.training.freq_estimator import (
        freq_log_prob,
        freq_update,
    )

    b_extra = int(model_cfg.mixed_negatives)
    c = catalog_ids.shape[0]
    b = batch.item_id.shape[-1]
    override = freq_log_prob(est)
    mix_logq = jnp.logaddexp(
        jnp.log(float(b)) + override,
        jnp.full_like(override, jnp.log(float(b_extra) / c))
        if b_extra
        else jnp.full_like(override, -jnp.inf),
    )
    pos = jnp.searchsorted(catalog_ids, batch.item_id).astype(jnp.int32)
    upd = {"item_logq": mix_logq[pos]}
    if b_extra:
        neg_pos = jnp.searchsorted(catalog_ids, batch.neg_item_id).astype(
            jnp.int32
        )
        upd["neg_logq"] = mix_logq[neg_pos]
    est = freq_update(est, pos, train_cfg.logq_decay)
    return batch._replace(**upd), est


def stream_extend_for_idx(
    model_cfg,
    train_cfg,
    data: SyntheticRecData,
    batch: Batch,
    base_key: jax.Array,
    idx: jnp.ndarray,
    est,
):
    """extend_batch_for_idx with the STREAMING frequency estimator
    (training.freq_estimator) supplying ``catalog_logq``: the negative draw
    runs logq-less, then ``attach_streaming_logq`` fills the correction
    columns and advances the estimator.  With a stacked [K, B] dispatch, all
    K rows share one pre-dispatch estimate and fold in together — a ≤K-step
    staleness, negligible against the estimator's ~1/(1−γ)-batch window.
    Returns (batch, new_est)."""
    import dataclasses

    key = jax.random.fold_in(base_key, jnp.asarray(idx).reshape(-1)[0])
    no_logq = dataclasses.replace(model_cfg, logq_correction=False)
    batch = extend_batch(no_logq, data, batch, key)
    return attach_streaming_logq(
        model_cfg, train_cfg, batch, est, data.catalog_ids
    )


def epoch_batches(
    key: jax.Array, num_samples: int, batch_size: int, drop_remainder: bool = True
) -> Iterator[jnp.ndarray]:
    """Shuffled batch index vectors for one epoch (host-side loop bound,
    device-side data)."""
    perm = jax.random.permutation(key, num_samples)
    n_batches = num_samples // batch_size
    for i in range(n_batches):
        yield perm[i * batch_size : (i + 1) * batch_size]
