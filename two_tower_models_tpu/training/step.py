"""Jitted train / eval steps.

The reference's hot loop syncs host<->device every step (``.to(device)`` per
tensor, ``.item()`` per loss — train/train.py:101-132).  Here one jitted,
state-donating function does gather-batch -> loss -> grads -> Adam update and
returns on-device metrics; the host only pulls them at log boundaries.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

from two_tower_models_tpu.config import ModelConfig, TrainConfig
from two_tower_models_tpu.models.two_tower import Batch, train_loss
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.retrieval.mips import mips_topk_exact
from two_tower_models_tpu.training.data import (
    SyntheticRecData,
    extend_batch,
    gather_batch,
)
from two_tower_models_tpu.training.state import TrainState, make_optimizer


def _extend_and_track(model_cfg, train_cfg, state, data, batch):
    """Mixed-negative / logQ batch extension + streaming-estimator advance.

    Returns (batch, rng, logq_state).  With ``train_cfg.streaming_logq`` the
    correction uses the estimator's CURRENT estimate (no lookahead: the
    first batches see a uniform prior, a constant logit shift the softmax
    ignores) and the estimator then folds this batch's items in
    (training.freq_estimator)."""
    if not (model_cfg.mixed_negatives or model_cfg.logq_correction):
        return batch, state.rng, state.logq_state
    # fresh negatives / logq fields per step; the rng split is gated so the
    # parity path's state.rng trajectory is untouched
    rng, sub = jax.random.split(state.rng)
    override, est = None, state.logq_state
    if train_cfg.streaming_logq:
        from two_tower_models_tpu.training.freq_estimator import (
            freq_log_prob,
            freq_update,
        )

        override = freq_log_prob(est)
        pos = jnp.searchsorted(data.catalog_ids, batch.item_id).astype(jnp.int32)
        est = freq_update(est, pos, train_cfg.logq_decay)
    batch = extend_batch(model_cfg, data, batch, sub, override)
    return batch, rng, est


def make_train_step(
    model_cfg: ModelConfig, train_cfg: TrainConfig
) -> Callable[[TrainState, SyntheticRecData, jnp.ndarray], Tuple[TrainState, dict]]:
    """Build the jitted step: (state, data, batch_idx) -> (state, metrics).

    With ``train_cfg.steps_per_dispatch > 1`` the returned function takes
    ``batch_idx`` of shape [K, B] and runs K optimizer steps in one dispatch
    via ``lax.scan`` — the scan carry aliases every state buffer perfectly,
    where per-dispatch donation inserts defensive copies that cost ~40% of
    the step at 134M-param tables (measured, BASELINE.md).  Metrics come
    back averaged over the K steps.
    """
    tx = make_optimizer(train_cfg)

    if train_cfg.lazy_table_adam:
        if train_cfg.fused_adam:
            raise ValueError("lazy_table_adam and fused_adam are exclusive")
        if model_cfg.user_embedding_arm != "table":
            raise NotImplementedError(
                "lazy_table_adam swaps the id tables for per-batch "
                "minitables; custom user_embedding_arm implementations "
                "cannot assume that — use the dense path"
            )
        return _make_lazy_table_step(model_cfg, train_cfg, tx)

    def step(state: TrainState, data: SyntheticRecData, idx: jnp.ndarray):
        batch = gather_batch(data, idx)
        batch, rng, logq_state = _extend_and_track(
            model_cfg, train_cfg, state, data, batch
        )
        (loss, metrics), grads = jax.value_and_grad(train_loss, has_aux=True)(
            state.params, model_cfg, batch
        )
        if train_cfg.fused_adam:
            # Single read-modify-write pass per tensor (ops.pallas.fused_adam);
            # same math and opt-state structure as the optax path.  NOTE: this
            # branch hardcodes plain-Adam semantics from train_cfg — if
            # make_optimizer ever grows schedules/clipping/decay, it must not
            # be combined with fused_adam (the loop guards the sharded path).
            from two_tower_models_tpu.ops.pallas.fused_adam import fused_adam_step

            params, opt_state = fused_adam_step(
                state.params, grads, state.opt_state,
                learning_rate=train_cfg.learning_rate,
            )
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            rng=rng,
            logq_state=logq_state,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    donate = (0,) if train_cfg.donate_state else ()
    if train_cfg.steps_per_dispatch <= 1:
        return jax.jit(step, donate_argnums=donate)

    def multi_step(state: TrainState, data: SyntheticRecData, idx2d: jnp.ndarray):
        def body(s, idx):
            s2, metrics = step(s, data, idx)
            return s2, metrics

        state, stacked = jax.lax.scan(body, state, idx2d)
        return state, jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), stacked)

    return jax.jit(multi_step, donate_argnums=donate)


def _make_lazy_table_step(
    model_cfg: ModelConfig, train_cfg: TrainConfig, tx
) -> Callable[[TrainState, SyntheticRecData, jnp.ndarray], Tuple[TrainState, dict]]:
    """Row-sparse table training step (training.sparse_tables): the loss
    differentiates against per-batch MINITABLES of touched rows, optax
    updates the dense subtree, and lazy Adam writes the touched table rows
    in place — update cost is O(touched rows), independent of table size."""
    from two_tower_models_tpu.training.sparse_tables import (
        SPARSE_TABLE_KEYS,
        apply_sparse_adam,
        build_minibatch,
        split_params,
    )

    def step(state: TrainState, data: SyntheticRecData, idx: jnp.ndarray):
        batch = gather_batch(data, idx)
        batch, rng, logq_state = _extend_and_track(
            model_cfg, train_cfg, state, data, batch
        )
        params = state.params
        params2, batch2, meta = build_minibatch(model_cfg, params, batch)

        (loss, metrics), grads = jax.value_and_grad(train_loss, has_aux=True)(
            params2, model_cfg, batch2
        )
        g_dense, g_minis = split_params(grads)
        dense_p, _ = split_params(params)

        updates, dense_opt = tx.update(
            g_dense, state.opt_state["dense"], dense_p
        )
        new_dense = optax.apply_updates(dense_p, updates)

        t = state.step + 1
        moments = state.opt_state["tables"]
        new_params = dict(new_dense)
        new_mu, new_nu = {}, {}
        for name in SPARSE_TABLE_KEYS:
            s, dup = meta[name]
            new_params[name], new_mu[name], new_nu[name] = apply_sparse_adam(
                params[name],
                moments["mu"][name],
                moments["nu"][name],
                params2[name],
                g_minis[name],
                s,
                dup,
                t,
                train_cfg,
            )

        new_state = TrainState(
            step=t,
            params=new_params,
            opt_state={
                "dense": dense_opt,
                "tables": {"mu": new_mu, "nu": new_nu},
            },
            rng=rng,
            logq_state=logq_state,
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    donate = (0,) if train_cfg.donate_state else ()
    if train_cfg.steps_per_dispatch <= 1:
        return jax.jit(step, donate_argnums=donate)

    def multi_step(state: TrainState, data: SyntheticRecData, idx2d: jnp.ndarray):
        def body(s, idx):
            s2, metrics = step(s, data, idx)
            return s2, metrics

        state, stacked = jax.lax.scan(body, state, idx2d)
        return state, jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), stacked)

    return jax.jit(multi_step, donate_argnums=donate)


def make_eval_recall_fn(model_cfg: ModelConfig, top_k: int = 100):
    """recall@k over the trained corpus.

    For each eval example: embed the user, retrieve top-k from the (refreshed)
    corpus, score 1 if the engaged item id is in the retrieved set.  The
    reference cannot measure this at all — its corpus is frozen random noise
    (SURVEY §2.4 train/infer disconnect).
    """

    @jax.jit
    def recall_at_k(params, corpus: jnp.ndarray, batch: Batch) -> jnp.ndarray:
        user_emb, _ = two_tower.compute_user_embedding(
            params, model_cfg, batch.user_id, batch.user_features,
            batch.user_history, batch.history_len,
        )
        k = min(top_k, corpus.shape[0])
        # Exact retrieval (offline eval wants the true metric); the Pallas
        # tile-max path cuts the 1M-corpus scan ~10x vs lax.top_k.
        indices, _, _ = mips_topk_exact(corpus, user_emb, k)  # [B, k]
        hit = jnp.any(indices == batch.item_id[:, None], axis=1)
        # Only positives count: engaged examples (any label fired).
        positive = jnp.any(batch.labels[:, : model_cfg.num_tasks] > 0, axis=1)
        hits = jnp.sum(hit & positive)
        total = jnp.maximum(jnp.sum(positive), 1)
        return hits / total

    return recall_at_k
