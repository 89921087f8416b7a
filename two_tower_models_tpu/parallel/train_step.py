"""Multi-chip train step: shard_map with explicit collectives.

Layout (see parallel.sharding): batch split over ``data``; embedding tables
row-sharded over ``model``; everything else replicated.  Inside the mapped
function:

  * table lookups go through the explicit sharded-lookup exchange
    (parallel.embedding) over the ``model`` axis;
  * the in-batch softmax shares negatives *across* the data axis: item
    embeddings all-gather over ``data`` so every chip scores its local users
    against the global batch's items — [B_local, B_global] logits with the
    positive at column (data_rank * B_local + row).  The softmax denominator
    therefore spans the global negative pool, matching single-chip semantics
    exactly (parity-tested on a virtual mesh);
  * nuv max-normalization and the loss mean reduce over the global batch
    (pmax / psum over ``data``);
  * gradients: replicated params psum over ``data``; table-shard grads psum
    over ``data`` only (each shard owns its rows — no reduction over
    ``model``, that's the memory win).

GSPMD could derive most of this from NamedShardings; the explicit path exists
because (a) the all-to-all embedding exchange and loss-axis reductions are
exactly where GSPMD's choices matter most at scale, and (b) it makes the
communication pattern auditable and unit-testable on a fake mesh.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from two_tower_models_tpu.config import MeshConfig, ModelConfig, TrainConfig
from two_tower_models_tpu.models.history_encoder import history_encoder_apply
from two_tower_models_tpu.models.two_tower import (
    Batch,
    REPLICATED_BATCH_FIELDS,
    _bce_with_logits,
    _light_ranker_train_terms,
    _net_user_value,
    debias_net_user_value,
)
from two_tower_models_tpu.nn.layers import linear_apply, mlp_apply
from two_tower_models_tpu.parallel.embedding import sharded_embedding_lookup
from two_tower_models_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from two_tower_models_tpu.parallel.sharding import state_pspecs
from two_tower_models_tpu.training.state import TrainState, make_optimizer

_SHARDED_TABLES = ("user_id_table", "item_id_table")


def _table_dims(cfg: "ModelConfig"):
    return {
        "user_id_table": cfg.user_id_embedding_dim,
        "item_id_table": cfg.item_id_embedding_dim,
    }


def check_mesh_tables(params, cfg: "ModelConfig", n_model: int):
    """Explicit-path validation: each table (plain [V, D] or 128-lane-packed
    [Vp/P, P·D], nn.packed_table) must split evenly over the model axis.
    Packed shards stay contiguous in LOGICAL rows because id v lives in
    physical row v // P — the owner arithmetic in parallel.embedding works
    unchanged."""
    for name, dim in _table_dims(cfg).items():
        t = params.get(name)
        if t is None:
            continue
        if t.shape[0] % n_model:
            raise ValueError(
                f"{name} has {t.shape[0]} physical rows, not divisible by "
                f"the model axis ({n_model}); pad the table or change the "
                "mesh (create_train_state(..., model_shards=...) skips "
                "packing when the packed shape wouldn't divide)"
            )


def _lookup(params, name, ids, strategy, dim=None):
    """Embedding lookup routed through the model-axis exchange for sharded
    tables (plain or 128-lane-packed), local take for replicated ones."""
    table = params[name]
    if name in _SHARDED_TABLES:
        flat = ids.reshape(-1)
        out = sharded_embedding_lookup(table, flat, MODEL_AXIS, strategy, dim)
        return out.reshape(*ids.shape, out.shape[-1])
    return jnp.take(table, ids, axis=0)


def _tp_mlp_apply(params, x, cd):
    """Tensor-parallel 2-layer MLP (MeshConfig.tower_tp): layer 0 holds this
    shard's output COLUMNS (activation stays local), layer 1 this shard's
    input ROWS — one psum over `model` recovers the full output, bias added
    after (Megatron MLP pattern)."""
    h = jax.nn.relu(linear_apply(params[0], x, cd))  # [B, hidden/n] local
    w, b = params[1]["w"], params[1]["b"]
    if cd is not None:
        h = h.astype(cd)
        w = w.astype(cd)
    y = jax.lax.psum(
        jnp.dot(h, w, preferred_element_type=jnp.float32), MODEL_AXIS
    )
    return y + b.astype(y.dtype)


def _mlp(params, x, cd, tp: bool):
    return _tp_mlp_apply(params, x, cd) if tp else mlp_apply(params, x, cd)


def _user_tower(params, cfg: ModelConfig, user_id, user_features, user_history, strategy, tp=False, hist_len=None):
    """Returns (user_emb [B_local, DI], ranker_embs [B_local, NU, DI] | None) —
    mirrors two_tower.compute_user_embedding over the sharded lookup."""
    cd = cfg.cdtype
    uid = _lookup(
        params, "user_id_table", user_id, strategy, cfg.user_id_embedding_dim
    )
    ufeat = _mlp(params["user_features_mlp"], user_features, cd, tp)
    parts = [uid, ufeat]
    if cfg.history_encoder is not None:
        hist = _lookup(
            params, "item_id_table", user_history, strategy,
            cfg.item_id_embedding_dim,
        )
        summary = history_encoder_apply(
            params["history_encoder"], hist, cfg.history_encoder, cd,
            lengths=hist_len,
        )
        parts.append(summary.reshape(summary.shape[0], -1))
    x = jnp.concatenate(parts, axis=-1)
    user_emb = linear_apply(params["user_tower_head"], x, cd)
    ranker_embs = None
    if cfg.light_ranker is not None:
        nu = cfg.light_ranker.num_ranker_user_embeddings
        flat = linear_apply(params["ranker_user_tower"], x, cd)  # [B, NU*DI]
        ranker_embs = flat.reshape(flat.shape[0], nu, cfg.item_id_embedding_dim)
    return user_emb, ranker_embs


def _item_tower(params, cfg: ModelConfig, item_id, item_features, strategy, tp=False):
    cd = cfg.cdtype
    iid = _lookup(
        params, "item_id_table", item_id, strategy, cfg.item_id_embedding_dim
    )
    ifeat = _mlp(params["item_features_mlp"], item_features, cd, tp)
    x = jnp.concatenate([iid, ifeat], axis=-1)
    return linear_apply(params["item_tower_head"], x, cd)


def _sharded_reward_model_terms(
    params,
    cfg: ModelConfig,
    user_emb,  # [B_local, DI]
    item_emb,  # [B_local, DI] — this shard's own items
    negatives,  # [B_global, DI] — gathered item pool
    scores,  # [B_local, B_global] retrieval logits
    pos,  # [B_local] — diagonal scores (own user x own item)
    labels,  # [B_local, T]
):
    """Sharded reward-model KL + proxy BCE (two_tower._reward_model_terms with
    the item axis spanning the GLOBAL batch; see that docstring for the
    linear-decomposition derivation — the [B, B, T] tensor never exists).

    Reference intent: two_tower_base_plus_main_ranker_reward_model.py:113-122.
    Everything is local except the row mean of the KL and the proxy BCE mean,
    which pmean over ``data`` (equal-sized shards => mean of shard means)."""
    w_full = params["proxy_ranker"]["w"].astype(jnp.float32)  # [2*DI+1, T]
    b_full = params["proxy_ranker"]["b"].astype(jnp.float32)  # [T]
    di = cfg.item_id_embedding_dim
    wu, wi, ws = w_full[:di], w_full[di : 2 * di], w_full[2 * di]

    u32 = user_emb.astype(jnp.float32)
    i32 = item_emb.astype(jnp.float32)
    n32 = negatives.astype(jnp.float32)
    s32 = scores.astype(jnp.float32)
    uvw = jnp.asarray(cfg.user_value_weights, jnp.float32)

    ranker_vm = (
        (u32 @ (wu @ uvw))[:, None]  # [B_local, 1]
        + (n32 @ (wi @ uvw))[None, :]  # [1, B_global]
        + s32 * jnp.dot(ws, uvw)
        + jnp.dot(b_full, uvw)
    )  # [B_local, B_global]
    ranker_top_probs = jax.lax.stop_gradient(jax.nn.softmax(ranker_vm, axis=-1))
    log_q = jax.nn.log_softmax(s32, axis=-1)
    kl = jax.lax.pmean(
        jnp.mean(
            jnp.sum(
                ranker_top_probs
                * (jnp.log(jnp.clip(ranker_top_probs, min=1e-30)) - log_q),
                axis=-1,
            )
        ),
        DATA_AXIS,
    )

    # proxy BCE on the impressed (diagonal) pairs only: [B_local, T]
    diag_logits = u32 @ wu + i32 @ wi + pos[:, None] * ws[None, :] + b_full
    proxy_bce = jax.lax.pmean(
        _bce_with_logits(diag_logits, labels[:, : cfg.num_tasks]), DATA_AXIS
    )

    loss = cfg.reward_model_loss_weight * kl + proxy_bce
    return loss, {"reward_kl": kl, "proxy_ranker_bce": proxy_bce}


def sharded_loss_fn(
    params,
    cfg: ModelConfig,
    mesh_cfg: MeshConfig,
    batch: Batch,
    lookup_strategy: str = "psum",
):
    """Per-shard loss with cross-chip negative sharing — the FULL zoo (base,
    history, debias, light ranker, KD, reward model).  Must run inside
    shard_map over a ('data', 'model') mesh; batch arrays arrive data-sharded.
    Matches two_tower.train_loss on the global batch (parity-tested per preset
    in tests/test_parallel.py)."""
    tp = mesh_cfg.tower_tp
    user_emb, ranker_embs = _user_tower(
        params, cfg, batch.user_id, batch.user_features, batch.user_history,
        lookup_strategy, tp, batch.history_len,
    )  # [B_local, DI]
    item_emb = _item_tower(
        params, cfg, batch.item_id, batch.item_features, lookup_strategy, tp
    )  # [B_local, DI]

    b_local = user_emb.shape[0]
    n_data = jax.lax.axis_size(DATA_AXIS)

    use_ring = (
        mesh_cfg.ring_negatives
        and mesh_cfg.global_negatives
        and n_data > 1
        and not cfg.reward_model
    )
    gathered = mesh_cfg.global_negatives and n_data > 1 and not use_ring
    if gathered:
        # Global negative pool: [n_data * B_local, DI], gathered over ICI.
        negatives = jax.lax.all_gather(item_emb, DATA_AXIS, tiled=True)
    else:
        negatives = item_emb

    # Mixed negatives / logQ (ModelConfig.mixed_negatives, .logq_correction):
    # the [B'] fields arrive REPLICATED across data shards (P() specs) — the
    # extras' tower runs identically per chip, each chip's grad carries only
    # its rows' CE contribution, and the data-axis grad psum sums them into
    # the single-chip total (same flow as the gathered negatives' grads).
    # corr aligns with the candidate pool: gathered in-batch columns need the
    # all-gathered item_logq; the positive's own logq stays local.
    neg_emb = None
    corr = None
    if batch.neg_item_id is not None:
        neg_emb = _item_tower(
            params, cfg, batch.neg_item_id, batch.neg_item_features,
            lookup_strategy, tp,
        )  # [B', DI]
    ilq_q = nlq_q = None  # compute-dtype-quantized correction pieces
    if batch.item_logq is not None or batch.neg_logq is not None:
        ilq = (
            jnp.zeros((b_local,), jnp.float32)
            if batch.item_logq is None
            else batch.item_logq.astype(jnp.float32)
        )
        # corrections apply in the compute dtype on every route — see
        # models.two_tower._extended_ce (keeps fused/plain bit-aligned)
        ilq_q = ilq.astype(item_emb.dtype).astype(jnp.float32)
        gcorr = jax.lax.all_gather(ilq, DATA_AXIS, tiled=True) if gathered else ilq
        if neg_emb is not None:
            nlq = (
                jnp.zeros((neg_emb.shape[0],), jnp.float32)
                if batch.neg_logq is None
                else batch.neg_logq.astype(jnp.float32)
            )
            nlq_q = nlq.astype(item_emb.dtype).astype(jnp.float32)
            gcorr = jnp.concatenate([gcorr, nlq])
        corr = gcorr.astype(item_emb.dtype).astype(jnp.float32)
    pool = (
        negatives
        if neg_emb is None
        else jnp.concatenate([negatives, neg_emb.astype(negatives.dtype)])
    )

    # The positive is this shard's own diagonal — u_b . i_b needs no gathered
    # data regardless of the negative pool.
    pos = jnp.einsum(
        "bd,bd->b", user_emb, item_emb, preferred_element_type=jnp.float32
    )
    # corrected positive logit for the CE only: s_bb - logq_b (Yi et al.),
    # with the same compute-dtype quantization as the column corrections;
    # the light-ranker / reward-model terms consume the RAW diagonal.
    pos_ce = (
        pos
        - batch.item_logq.astype(item_emb.dtype).astype(jnp.float32)
        if batch.item_logq is not None
        else pos
    )
    scores = None
    if cfg.reward_model:
        # Reward model consumes the full [B_local, B_global] score matrix
        # (pairwise ranker logits, UNcorrected) — materialize it and reuse
        # for the CE.
        scores = jnp.dot(
            user_emb, negatives.T, preferred_element_type=jnp.float32
        )
        full = scores
        if neg_emb is not None:
            full = jnp.concatenate(
                [
                    full,
                    jnp.dot(
                        user_emb, neg_emb.T, preferred_element_type=jnp.float32
                    ),
                ],
                axis=1,
            )
        if corr is not None:
            full = full - corr[None, :]
        lse = jax.nn.logsumexp(full, axis=-1)
    elif use_ring:
        # Flash-style ppermute ring: the [B_global, DI] pool never
        # materializes (parallel.ring_loss) — the at-scale denominator.
        # logQ corrections travel WITH the blocks (one extra [B_l] f32 hop);
        # replicated mixed-negative extras fold in as a LOCAL corrected lse
        # via one logaddexp (lse over a disjoint union of candidate pools).
        from two_tower_models_tpu.parallel.ring_loss import (
            ring_lse,
            ring_lse_corr,
        )

        if ilq_q is not None:
            lse = ring_lse_corr(user_emb, item_emb, ilq_q, DATA_AXIS)
        else:
            lse = ring_lse(user_emb, item_emb, DATA_AXIS)
        if neg_emb is not None:
            neg_scores = jnp.dot(
                user_emb, neg_emb.T, preferred_element_type=jnp.float32
            )  # [B_l, B']
            if nlq_q is not None:
                neg_scores = neg_scores - nlq_q[None, :]
            lse = jnp.logaddexp(lse, jax.nn.logsumexp(neg_scores, axis=-1))
    elif cfg.fused_loss:
        # Flash-style kernel: the [B_local, B_global(+B')] score matrix never
        # reaches HBM (ops.pallas.fused_softmax.fused_lse).  Corrections fold
        # into one appended feature column: [u,1]·[pool,-logq] = s - logq.
        from two_tower_models_tpu.ops.pallas.fused_softmax import fused_lse

        if corr is not None:
            aug_u = jnp.concatenate(
                [user_emb, jnp.ones((b_local, 1), user_emb.dtype)], axis=1
            )
            aug_pool = jnp.concatenate(
                [pool, (-corr)[:, None].astype(pool.dtype)], axis=1
            )
            lse = fused_lse(aug_u, aug_pool)
        else:
            lse = fused_lse(user_emb, pool)
    else:
        full = jnp.dot(user_emb, pool.T, preferred_element_type=jnp.float32)
        if corr is not None:
            full = full - corr[None, :]
        lse = jax.nn.logsumexp(full, axis=-1)
    ce = lse - pos_ce  # [B_local]

    nuv = _net_user_value(cfg, batch.labels)
    nuv, aux_loss = debias_net_user_value(params, cfg, nuv, batch.position, user_emb)
    aux_loss = aux_loss * cfg.debias_aux_weight
    nuv = jnp.clip(nuv, min=cfg.nuv_min)
    if cfg.light_ranker is None:
        # Max-normalize over the GLOBAL batch (single-chip parity).  The
        # light ranker's own train path deliberately skips this
        # (two_tower_plus_light_ranker.py:286-289).  all_gather + max instead
        # of pmax: with a debias head active, nuv is param-dependent and the
        # normalizer must be differentiable (pmax has no VJP; all_gather's
        # transpose is psum_scatter).  [B_global] floats over ICI —
        # negligible.
        global_max = jnp.max(jax.lax.all_gather(nuv, DATA_AXIS, tiled=True))
        nuv = nuv / global_max

    # Global mean over data shards; aux losses are per-shard sums -> mean of
    # shard values matches single-chip (debias MSEs are batch sums, so psum).
    weighted = ce * nuv
    loss = (
        jax.lax.psum(jnp.sum(weighted), DATA_AXIS)
        / (b_local * n_data)
        + jax.lax.psum(aux_loss, DATA_AXIS)
    )
    metrics = {
        "softmax_ce": jax.lax.pmean(jnp.mean(ce), DATA_AXIS),
        "debias_aux_loss": jax.lax.psum(aux_loss, DATA_AXIS),
        "nuv_mean": jax.lax.pmean(jnp.mean(nuv), DATA_AXIS),
    }

    if cfg.light_ranker is not None:
        # Pointwise terms are per-example local (target-aware attention + BCE
        # on the impressed item); only the batch means cross shards.
        lr_loss, lr_metrics = _light_ranker_train_terms(
            params, cfg, ranker_embs, item_emb, pos, batch.labels
        )
        loss = loss + jax.lax.pmean(lr_loss, DATA_AXIS)
        metrics.update(
            {k: jax.lax.pmean(v, DATA_AXIS) for k, v in lr_metrics.items()}
        )

    if cfg.reward_model:
        rm_loss, rm_metrics = _sharded_reward_model_terms(
            params, cfg, user_emb, item_emb, negatives, scores, pos, batch.labels
        )
        loss = loss + rm_loss
        metrics.update(rm_metrics)

    return loss, metrics


def make_gspmd_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    mesh: Mesh,
    mesh_cfg: MeshConfig = None,
) -> Callable[[TrainState, Batch], Tuple[TrainState, dict]]:
    """GSPMD alternative to the explicit shard_map step: the SINGLE-CHIP
    step body jitted with NamedSharding-annotated inputs — XLA's SPMD
    partitioner inserts the collectives (all-reduce for replicated-param
    grads, the batch-axis gathers for the [B, B] loss).  Semantics are the
    single-chip ones by construction (same traced program), so global
    negatives are implicit.

    Pallas kernels cannot be auto-partitioned, so kernel call sites run as
    manual shard_map ISLANDS over this mesh (parallel.islands; activated by
    the kernel_islands context below) — fused loss and encoder kernels work
    here too.  128-lane-packed tables (nn.packed_table) partition like plain
    ones: their lookup/VJP lower to an XLA gather/scatter over the
    P('model', None) physical rows (the Pallas scatter kernel is disabled on
    this path anyway), and row v's physical row v // P keeps model-axis
    shards contiguous in logical ids — packed-vs-plain trajectory parity on
    the virtual mesh is tested (tests/test_packed_mesh.py).  ``steps_per_dispatch > 1`` scans K steps per dispatch, same
    carry-aliasing rationale as the explicit path.  Parity with the
    single-chip step (loss AND grads) is tested on a virtual mesh
    (tests/test_parallel.py).
    """
    from two_tower_models_tpu.models.two_tower import train_loss as _train_loss
    from two_tower_models_tpu.parallel.islands import kernel_islands
    from two_tower_models_tpu.parallel.sharding import batch_pspec, state_pspecs

    tx = make_optimizer(train_cfg)

    def step(state: TrainState, batch: Batch):
        (loss, metrics), grads = jax.value_and_grad(_train_loss, has_aux=True)(
            state.params, model_cfg, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return (
            TrainState(
                step=state.step + 1, params=params,
                opt_state=opt_state, rng=state.rng,
                logq_state=state.logq_state,
            ),
            metrics,
        )

    k_dispatch = train_cfg.steps_per_dispatch

    def multi(state: TrainState, batches: Batch):
        def body(s, b):
            return step(s, b)

        state, stacked = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0), stacked)

    compiled = {}

    def run(state: TrainState, batch: Batch):
        from two_tower_models_tpu.nn.layers import disable_scatter_kernel

        # shardings derive from the state's pytree, known at first call
        if "fn" not in compiled:
            tp = bool(mesh_cfg and mesh_cfg.tower_tp)
            to_sharding = lambda s: NamedSharding(mesh, s)
            state_sh = jax.tree_util.tree_map(to_sharding, state_pspecs(state, tp))
            if k_dispatch > 1:
                # stacked [K, B, ...] batches: K replicated, batch over data
                bspec = to_sharding(P(None, DATA_AXIS))
                body_fn = multi
            else:
                bspec = to_sharding(batch_pspec())
                body_fn = step
            # mixed-negative fields are [B']-shaped (logically replicated
            # candidates, B' need not divide the data axis) — replicate them;
            # every [B]-leading field shards over data as usual
            _repl = REPLICATED_BATCH_FIELDS
            repl_sh = to_sharding(P())
            batch_sh = type(batch)(
                **{
                    name: (
                        None
                        if leaf is None
                        else (repl_sh if name in _repl else bspec)
                    )
                    for name, leaf in batch._asdict().items()
                }
            )
            compiled["fn"] = jax.jit(
                body_fn,
                in_shardings=(state_sh, batch_sh),
                out_shardings=(state_sh, None),
                donate_argnums=(0,),
            )
        # Both context switches enter on EVERY call (cheap contextvars): the
        # cached jit retraces on any new batch shape/dtype, not just the
        # first call.  disable_scatter_kernel: the embedding-lookup VJP must
        # pick its XLA scatter under the SPMD partitioner.  kernel_islands:
        # fused loss/encoder kernels wrap themselves in shard_map islands.
        with disable_scatter_kernel(), kernel_islands(mesh):
            return compiled["fn"](state, batch)

    return run


def make_sharded_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    mesh: Mesh,
    mesh_cfg: MeshConfig,
    lookup_strategy: str = "psum",
) -> Callable[[TrainState, Batch], Tuple[TrainState, dict]]:
    """Jitted shard_map train step: (sharded state, global batch) -> updated.

    The returned function expects ``state`` already placed per
    ``parallel.sharding.shard_state`` and batch arrays shardable on their
    leading axis over ``data``.
    """
    if model_cfg.user_embedding_arm != "table":
        raise NotImplementedError(
            "custom user_embedding_arm is not plumbed through the explicit "
            "sharded tower; use the GSPMD path (explicit_collectives=False), "
            "which partitions the full single-chip model"
        )
    if mesh_cfg.tower_tp and model_cfg.feature_hidden_dim % mesh.shape[MODEL_AXIS]:
        raise ValueError(
            f"tower_tp needs feature_hidden_dim "
            f"({model_cfg.feature_hidden_dim}) divisible by the model axis "
            f"({mesh.shape[MODEL_AXIS]})"
        )
    if mesh_cfg.ring_negatives and model_cfg.reward_model:
        raise ValueError(
            "ring_negatives is incompatible with reward_model: the reward "
            "KL consumes the full [B_local, B_global] score matrix, so the "
            "ring's O(B_local) memory win cannot apply — use the all_gather "
            "path (ring_negatives=False)"
        )
    if mesh_cfg.ring_negatives and not mesh_cfg.global_negatives:
        raise ValueError(
            "ring_negatives shares negatives across the data axis; it "
            "requires global_negatives=True"
        )
    if getattr(train_cfg, "grad_clip_norm", None):
        raise NotImplementedError(
            "grad_clip_norm inside the explicit shard_map step would clip "
            "on per-chip grad norms (table grads are model-shard-local); "
            "use the GSPMD step (MeshConfig.explicit_collectives=False, "
            "CLI --gspmd), where the partitioner computes the true global "
            "norm"
        )
    tx = make_optimizer(train_cfg)

    def loss_for_grad(params, batch):
        loss, metrics = sharded_loss_fn(
            params, model_cfg, mesh_cfg, batch, lookup_strategy
        )
        return loss, metrics

    def per_shard_step(state: TrainState, batch: Batch):
        (loss, metrics), grads = jax.value_and_grad(loss_for_grad, has_aux=True)(
            state.params, batch
        )

        # Gradient reduction: every leaf psums over 'data'.  Sharded-table
        # grads are already local to their 'model' shard (the lookup exchange
        # routed contributions home via the collective's transpose); no
        # reduction over 'model' for them — same for the TP-split MLP leaves
        # when tower_tp is on (the psum in _tp_mlp_apply transposes to the
        # shard-local grad).  Replicated leaves' grads are identical across
        # 'model' (replicated params x replicated activations), so pmean
        # collapses the duplicates.
        #
        # Table grads over 'data' go SPARSE when that moves fewer bytes
        # (MeshConfig.sparse_table_grads): the batch touches O(B·(1+H)) of
        # V_shard rows, so the dense [V_shard, D] all-reduce is mostly
        # zeros at production table sizes (parallel.sparse_grads).
        from two_tower_models_tpu.parallel.sharding import (
            _path_parts,
            _tp_mlp_spec,
        )
        from two_tower_models_tpu.parallel.sparse_grads import (
            sparse_grad_exchange,
            sparse_table_grad_names,
            table_touched_ids,
        )

        sparse_names = sparse_table_grad_names(
            model_cfg, mesh_cfg, batch, state.params
        )
        ids_map = table_touched_ids(model_cfg, batch) if sparse_names else {}

        def reduce_grad(path, g):
            parts = _path_parts(path)
            hit = set(parts) & set(_SHARDED_TABLES)
            if hit:
                (name,) = hit
                if name in sparse_names:
                    return sparse_grad_exchange(
                        g, ids_map[name], DATA_AXIS, MODEL_AXIS,
                        _table_dims(model_cfg)[name],
                    )
                return jax.lax.psum(g, DATA_AXIS)
            g = jax.lax.psum(g, DATA_AXIS)
            if mesh_cfg.tower_tp:
                tp_spec = _tp_mlp_spec(parts)
                if tp_spec is not None and tp_spec != P():
                    return g  # model-sharded leaf: grad is shard-local
            return jax.lax.pmean(g, MODEL_AXIS)

        grads = jax.tree_util.tree_map_with_path(reduce_grad, grads)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state,
            rng=state.rng, logq_state=state.logq_state,
        )
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    def build(state: TrainState, batch: Batch):
        specs = state_pspecs(state, mesh_cfg.tower_tp)
        # spec tree mirrors the batch's present fields (None fields — e.g.
        # history_len when histories are fixed-length — carry no spec);
        # mixed-negative fields are [B']-replicated candidates, not
        # data-sharded rows
        _repl = REPLICATED_BATCH_FIELDS
        batch_specs = type(batch)(
            **{
                name: (
                    None if leaf is None else (P() if name in _repl else P(DATA_AXIS))
                )
                for name, leaf in batch._asdict().items()
            }
        )
        metric_names = ["softmax_ce", "debias_aux_loss", "nuv_mean", "loss", "grad_norm"]
        if model_cfg.light_ranker is not None:
            metric_names.append("light_ranker_bce")
        if model_cfg.kd:
            metric_names.append("kd_loss")
        if model_cfg.reward_model:
            metric_names += ["reward_kl", "proxy_ranker_bce"]
        metric_specs = {name: P() for name in metric_names}
        mapped = jax.shard_map(
            per_shard_step,
            mesh=mesh,
            in_specs=(specs, batch_specs),
            out_specs=(specs, metric_specs),
            check_vma=False,
        )
        if train_cfg.steps_per_dispatch > 1:
            # K steps per dispatch: batch arrays arrive stacked [K, ...];
            # the scan carry aliases the sharded state (same rationale as
            # the single-chip multi-step path, training.step).
            def multi(state, batches):
                def body(s, b):
                    s2, m = mapped(s, b)
                    return s2, m

                state, stacked = jax.lax.scan(body, state, batches)
                return state, jax.tree_util.tree_map(
                    lambda m: jnp.mean(m, axis=0), stacked
                )

            return jax.jit(multi, donate_argnums=(0,))
        return jax.jit(mapped, donate_argnums=(0,))

    _cache = {}

    def step(state: TrainState, batch: Batch):
        if "fn" not in _cache:
            check_mesh_tables(state.params, model_cfg, mesh.shape[MODEL_AXIS])
            _cache["fn"] = build(state, batch)
        return _cache["fn"](state, batch)

    step.build = build  # jit handle for lowering/HLO inspection (test_comms)
    return step
