"""Functional two-tower retrieval core.

One pure computation covers the reference's entire 7-class model zoo
(two_tower_base_retrieval.py:25 and its subclasses): which modules and loss
terms are active is selected by ``ModelConfig``, not by inheritance.  The
polymorphic hook points of the reference map to config-gated branches that
resolve at *trace time* (Python ``if`` on static config), so XLA sees a single
straight-line program per config:

  reference hook                         -> here
  ----------------------------------------------------------------------
  get_user_embedding        (:112-127)   -> get_user_embedding() (registered
                                            extension point, default: table lookup)
  process_user_features     (:129-162)   -> user_tower_input()
  compute_user_embedding    (:164-191)   -> compute_user_embedding()
  compute_item_embeddings   (:193-219)   -> compute_item_embeddings()
  debias_net_user_value     (:251-277)   -> debias_net_user_value()
  compute_training_loss     (:279-347)   -> train_loss()
  train_forward             (:349-394)   -> train_loss()
  forward (inference)       (:221-249)   -> retrieve()

Fixes over the reference (verified defects, SURVEY §2.4), deliberately not
replicated:
  * light ranker actually runs (the reference's compute_user_embedding drops
    ``user_history``, two_tower_plus_light_ranker.py:113-115 — TypeError);
  * combined-debias MSE compares [B] vs [B] (the reference silently
    broadcasts [B,1] vs [B] to [B,B], two_tower_with_debiasing.py:110-112);
  * KD and reward-model losses are implemented to their documented intent
    (stubs in the reference);
  * all state lives in the params pytree (nothing invisible to checkpoints).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import Debias, ModelConfig
from two_tower_models_tpu.models.history_encoder import (
    history_encoder_apply,
    history_encoder_init,
)
from two_tower_models_tpu.nn.layers import (
    embedding_init,
    embedding_lookup,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)
from two_tower_models_tpu.nn.packed_table import table_lookup


class Batch(NamedTuple):
    """One training/inference batch.  Shapes use the reference's glossary."""

    user_id: jnp.ndarray  # [B] int32
    user_features: jnp.ndarray  # [B, IU]
    user_history: jnp.ndarray  # [B, H] int32, newest first
    item_id: Optional[jnp.ndarray] = None  # [B] int32 (training only)
    item_features: Optional[jnp.ndarray] = None  # [B, II] (training only)
    position: Optional[jnp.ndarray] = None  # [B] int32 (training only)
    labels: Optional[jnp.ndarray] = None  # [B, T] ([B, 2T] under KD)
    # Optional per-example valid-history lengths (VERDICT r2 #8): positions
    # >= history_len[b] of user_history are padding — excluded from the
    # encoder's mean/attention, with the PE flip applied at each example's
    # own length (truncated-run equivalence, property-tested).  None = all
    # histories full (the reference's fixed-H semantics,
    # two_tower_base_retrieval.py:177-181 punts on this).
    history_len: Optional[jnp.ndarray] = None  # [B] int32
    # Mixed-negative sampling / logQ correction (ModelConfig.mixed_negatives,
    # .logq_correction; training.data.extend_batch fills these):
    neg_item_id: Optional[jnp.ndarray] = None  # [B'] int32 — uniform extras
    neg_item_features: Optional[jnp.ndarray] = None  # [B', II]
    item_logq: Optional[jnp.ndarray] = None  # [B] log mixed-proposal prob
    neg_logq: Optional[jnp.ndarray] = None  # [B'] log mixed-proposal prob


# Batch fields that are [B']-shaped shared candidates rather than per-example
# rows: replicated (P()) on every mesh/multihost path, never data-sharded.
REPLICATED_BATCH_FIELDS = frozenset(
    {"neg_item_id", "neg_item_features", "neg_logq"}
)


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: ModelConfig) -> Dict:
    """Build the full parameter pytree for a config point."""
    cfg.validate()
    dt = cfg.pdtype
    ks = iter(jax.random.split(key, 16))

    params: Dict = {
        # user tower ------------------------------------------------------
        "user_id_table": embedding_init(
            next(ks), cfg.user_id_hash_size, cfg.user_id_embedding_dim, dt
        ),
        "user_features_mlp": mlp_init(
            next(ks),
            (cfg.user_features_size, cfg.feature_hidden_dim, cfg.user_id_embedding_dim),
            dt,
        ),
        "user_tower_head": linear_init(
            next(ks), cfg.user_tower_input_dim, cfg.item_id_embedding_dim, dt
        ),
        # item tower ------------------------------------------------------
        "item_id_table": embedding_init(
            next(ks), cfg.item_id_hash_size, cfg.item_id_embedding_dim, dt
        ),
        "item_features_mlp": mlp_init(
            next(ks),
            (cfg.item_features_size, cfg.feature_hidden_dim, cfg.item_id_embedding_dim),
            dt,
        ),
        "item_tower_head": linear_init(
            next(ks), 2 * cfg.item_id_embedding_dim, cfg.item_id_embedding_dim, dt
        ),
    }

    # custom user-ID arm (see register_user_embedding_arm below)
    _, ext_init = _USER_EMBEDDING_ARMS[cfg.user_embedding_arm]
    if ext_init is not None:
        params["user_embedding_ext"] = ext_init(next(ks), cfg)

    if cfg.history_encoder is not None:
        params["history_encoder"] = history_encoder_init(
            next(ks), cfg.item_id_embedding_dim, cfg.history_encoder, dt
        )

    if cfg.debias in (Debias.POSITION, Debias.BOTH):
        # position -> E[nuv | position] scalar table
        # (two_tower_with_position_debiased_weights.py:72-74)
        params["position_bias_table"] = embedding_init(
            next(ks), cfg.position_table_size, 1, dt
        )
    if cfg.debias == Debias.USER:
        params["user_debias_head"] = linear_init(next(ks), cfg.item_id_embedding_dim, 1, dt)
    if cfg.debias == Debias.BOTH:
        # user estimate consumes [user_embedding, E_nuv_position]
        # (two_tower_with_debiasing.py:73-75)
        params["user_debias_head"] = linear_init(
            next(ks), cfg.item_id_embedding_dim + 1, 1, dt
        )

    if cfg.light_ranker is not None:
        nu = cfg.light_ranker.num_ranker_user_embeddings
        t_out = cfg.num_tasks * (2 if cfg.kd else 1)
        params["ranker_user_tower"] = linear_init(
            next(ks), cfg.user_tower_input_dim, nu * cfg.item_id_embedding_dim, dt
        )
        # pointwise head over [item_emb, target_aware_user, scores, mips_score]
        # (two_tower_plus_light_ranker.py:85-88); under KD the head emits T
        # extra aux logits trained against logged soft labels
        # (two_tower_plus_light_ranker_plus_main_ranker_kd.py:10-19).
        params["light_ranker_head"] = linear_init(
            next(ks), 2 * cfg.item_id_embedding_dim + nu + 1, t_out, dt
        )

    if cfg.reward_model:
        # proxy of the main ranker: [user_emb, item_emb, retrieval_score] -> T
        # (two_tower_base_plus_main_ranker_reward_model.py:62, :113-122)
        params["proxy_ranker"] = linear_init(
            next(ks), 2 * cfg.item_id_embedding_dim + 1, cfg.num_tasks, dt
        )

    return params


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------

# The user-ID memorization arm is an EXTENSION POINT, mirroring the
# reference's ``get_user_embedding`` hook (two_tower_base_retrieval.py:112-127,
# whose docstring points at swapping in an external user-representation
# module).  Register a named arm and select it via
# ``ModelConfig.user_embedding_arm``:
#
#     def my_init(key, cfg) -> params_subtree          # -> params["user_embedding_ext"]
#     def my_apply(params, cfg, user_id) -> [B, DU]    # full params dict in
#     register_user_embedding_arm("mine", my_apply, my_init)
#
# The default arm is the plain id-table lookup; custom arms still receive
# the whole params dict (so they can combine the table with their own
# ``user_embedding_ext`` subtree) and train end-to-end through jax.grad.
_USER_EMBEDDING_ARMS: Dict[str, tuple] = {}


def register_user_embedding_arm(name: str, apply_fn, init_fn=None) -> None:
    """apply_fn(params, cfg, user_id) -> [B, DU]; optional init_fn(key, cfg)
    returns a params subtree stored at ``params['user_embedding_ext']``."""
    _USER_EMBEDDING_ARMS[name] = (apply_fn, init_fn)


def _default_user_embedding(params, cfg, user_id):
    # table_lookup dispatches on storage layout: 128-lane-packed for very
    # large single-chip tables (nn.packed_table), plain otherwise.
    return table_lookup(params["user_id_table"], user_id, cfg.user_id_embedding_dim)


register_user_embedding_arm("table", _default_user_embedding)


def get_user_embedding(params: Dict, cfg: ModelConfig, user_id) -> jnp.ndarray:
    """User-ID memorization arm [B, DU] (reference hook
    two_tower_base_retrieval.py:112-127); dispatches on
    ``cfg.user_embedding_arm``."""
    apply_fn, _ = _USER_EMBEDDING_ARMS[cfg.user_embedding_arm]
    return apply_fn(params, cfg, user_id)


def user_tower_input(
    params: Dict, cfg: ModelConfig, user_id, user_features, user_history,
    history_len=None,
) -> jnp.ndarray:
    """Assemble the user-tower input vector.

    [B, 2*DU] base (id-embedding ++ feature-MLP), widened to
    [B, 2*DU + 2*DI] with the history summary when the encoder is on
    (reference process_user_features, two_tower_base_retrieval.py:129-162 and
    two_tower_with_user_history_encoder.py:85-122).
    """
    cd = cfg.cdtype
    uid_emb = get_user_embedding(params, cfg, user_id)  # [B, DU]
    ufeat_emb = mlp_apply(params["user_features_mlp"], user_features, cd)  # [B, DU]
    parts = [uid_emb, ufeat_emb]
    if cfg.history_encoder is not None:
        # History ids embed through the *item* table
        # (two_tower_with_user_history_encoder.py:105).
        hist_emb = table_lookup(
            params["item_id_table"], user_history, cfg.item_id_embedding_dim
        )  # [B,H,DI]
        summary = history_encoder_apply(
            params["history_encoder"], hist_emb, cfg.history_encoder, cd,
            lengths=history_len,
        )  # [B, 2, DI]
        parts.append(summary.reshape(summary.shape[0], -1))  # [B, 2*DI]
    return jnp.concatenate(parts, axis=-1)


def compute_user_embedding(
    params: Dict, cfg: ModelConfig, user_id, user_features, user_history,
    history_len=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """User-tower head -> MIPS query [B, DI]; plus the light-ranker's NU user
    embeddings [B, NU, DI] when that head is on (two_tower_plus_light_ranker.py:90-129)."""
    x = user_tower_input(
        params, cfg, user_id, user_features, user_history, history_len
    )
    user_emb = linear_apply(params["user_tower_head"], x, cfg.cdtype)  # [B, DI]
    ranker_embs = None
    if cfg.light_ranker is not None:
        nu = cfg.light_ranker.num_ranker_user_embeddings
        flat = linear_apply(params["ranker_user_tower"], x, cfg.cdtype)  # [B, NU*DI]
        ranker_embs = flat.reshape(flat.shape[0], nu, cfg.item_id_embedding_dim)
    return user_emb, ranker_embs


def compute_item_embeddings(
    params: Dict, cfg: ModelConfig, item_id, item_features
) -> jnp.ndarray:
    """Item tower [B, DI] (two_tower_base_retrieval.py:193-219)."""
    cd = cfg.cdtype
    iid_emb = table_lookup(params["item_id_table"], item_id, cfg.item_id_embedding_dim)
    ifeat_emb = mlp_apply(params["item_features_mlp"], item_features, cd)
    x = jnp.concatenate([iid_emb, ifeat_emb], axis=-1)
    return linear_apply(params["item_tower_head"], x, cd)


# ---------------------------------------------------------------------------
# Debiasing hooks
# ---------------------------------------------------------------------------


def debias_net_user_value(
    params: Dict,
    cfg: ModelConfig,
    net_user_value: jnp.ndarray,  # [B]
    position: jnp.ndarray,  # [B]
    user_embedding: jnp.ndarray,  # [B, DI]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-weight per-example loss weights; returns (nuv, aux_loss).

    Exactly reproduces the reference's three heads, including their differing
    clamp/MSE orderings:
      position (two_tower_with_position_debiased_weights.py:94-113):
        MSE against the raw estimate, then clamp >= 1e-3, then divide.
      user (two_tower_with_user_debiased_weights.py:118-135):
        clamp >= 1e-1 first, MSE against the *clamped* estimate, then divide.
      both (two_tower_with_debiasing.py:100-129):
        raw MSEs for both heads, clamp user estimate >= 1e-3, divide by it.
        (Position MSE here compares [B] vs [B]; the reference's [B,1]-vs-[B]
        broadcast is a verified bug, not a capability.)
    """
    zero = jnp.zeros((), jnp.float32)
    if cfg.debias == Debias.NONE:
        return net_user_value, zero

    if cfg.debias == Debias.POSITION:
        est = embedding_lookup(params["position_bias_table"], position)[:, 0]  # [B]
        aux = jnp.sum((est - net_user_value) ** 2)
        est = jnp.clip(est, min=cfg.position_debias_min)
        return net_user_value / est, aux

    if cfg.debias == Debias.USER:
        est = linear_apply(params["user_debias_head"], user_embedding)[:, 0]  # [B]
        est = jnp.clip(est, min=cfg.user_debias_min)
        aux = jnp.sum((est - net_user_value) ** 2)
        return net_user_value / est, aux

    # Debias.BOTH
    e_pos = embedding_lookup(params["position_bias_table"], position)  # [B, 1]
    e_user = linear_apply(
        params["user_debias_head"],
        jnp.concatenate([user_embedding, e_pos.astype(user_embedding.dtype)], axis=-1),
    )[:, 0]  # [B]
    aux_pos = jnp.sum((e_pos[:, 0] - net_user_value) ** 2)
    aux_user = jnp.sum((e_user - net_user_value) ** 2)
    e_user = jnp.clip(e_user, min=cfg.combined_debias_min)
    return net_user_value / e_user, aux_user + aux_pos


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def _in_batch_ce(scores: jnp.ndarray) -> jnp.ndarray:
    """Per-row cross entropy of the [B, B] logit matrix with diagonal targets
    (two_tower_base_retrieval.py:287-312): ce[b] = logsumexp(scores[b]) - scores[b,b]."""
    scores = scores.astype(jnp.float32)
    return jax.nn.logsumexp(scores, axis=-1) - jnp.diagonal(scores)


def _extended_ce(
    cfg: ModelConfig,
    user_embedding: jnp.ndarray,  # [B, DI]
    item_embeddings: jnp.ndarray,  # [B, DI]
    scores: Optional[jnp.ndarray],  # [B, B] precomputed logits, or None
    neg_item_embeddings: Optional[jnp.ndarray],  # [B', DI] mixed negatives
    item_logq: Optional[jnp.ndarray],  # [B]
    neg_logq: Optional[jnp.ndarray],  # [B']
) -> jnp.ndarray:
    """CE over the EXTENDED candidate pool [in-batch items; mixed negatives]
    with optional logQ correction: ce[b] = lse_j(s_bj − logq_j) − (s_bb −
    logq_b).

    Three equivalent routes, matching softmax_retrieval_loss's tiers:
    precomputed ``scores`` get the extra columns appended (reward-model /
    light-ranker paths already hold the [B, B] matrix); the fused path folds
    −logq into ONE extra feature column ([u, 1] · [pool_j, −logq_j] =
    s_bj − logq_j) so the rectangular LSE kernel runs unchanged and the pool
    matrix never reaches HBM; the plain path materializes the rectangle.
    """
    b = user_embedding.shape[0]
    pool = item_embeddings
    corr = jnp.zeros((b,), jnp.float32) if item_logq is None else item_logq
    corr = corr.astype(jnp.float32)
    if neg_item_embeddings is not None:
        pool = jnp.concatenate([pool, neg_item_embeddings.astype(pool.dtype)])
        ncorr = (
            jnp.zeros((neg_item_embeddings.shape[0],), jnp.float32)
            if neg_logq is None
            else neg_logq.astype(jnp.float32)
        )
        corr = jnp.concatenate([corr, ncorr])
    # One quantization semantic for every route: corrections apply in the
    # compute dtype (the fused route's augmented column necessarily rounds
    # to pool.dtype; rounding here keeps the plain-dot and precomputed-score
    # routes bit-aligned with it under bf16 — a no-op under f32).
    corr = corr.astype(pool.dtype).astype(jnp.float32)

    pos = (
        jnp.diagonal(scores)
        if scores is not None
        else jnp.einsum(
            "bd,bd->b", user_embedding, item_embeddings,
            preferred_element_type=jnp.float32,
        )
    ).astype(jnp.float32) - corr[:b]

    if scores is not None:
        full = scores.astype(jnp.float32)
        if neg_item_embeddings is not None:
            neg_scores = jnp.dot(
                user_embedding, neg_item_embeddings.T,
                preferred_element_type=jnp.float32,
            )
            full = jnp.concatenate([full, neg_scores], axis=1)
        return jax.nn.logsumexp(full - corr[None, :], axis=-1) - pos

    if cfg.fused_loss:
        from two_tower_models_tpu.ops.pallas.fused_softmax import fused_lse
        from two_tower_models_tpu.parallel.islands import island_mesh

        ones = jnp.ones((b, 1), user_embedding.dtype)
        aug_u = jnp.concatenate([user_embedding, ones], axis=1)
        aug_pool = jnp.concatenate(
            [pool, (-corr)[:, None].astype(pool.dtype)], axis=1
        )
        mesh = island_mesh()
        if mesh is None:
            lse = fused_lse(aug_u, aug_pool)
        else:
            from jax.sharding import PartitionSpec as P

            from two_tower_models_tpu.parallel.mesh import DATA_AXIS

            lse = jax.shard_map(
                lambda u, i: fused_lse(u, i),
                mesh=mesh,
                in_specs=(P(DATA_AXIS, None), P()),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            )(aug_u, aug_pool)
        return lse - pos

    full = (
        jnp.dot(user_embedding, pool.T, preferred_element_type=jnp.float32)
        - corr[None, :]
    )
    return jax.nn.logsumexp(full, axis=-1) - pos


def _net_user_value(cfg: ModelConfig, labels: jnp.ndarray) -> jnp.ndarray:
    """nuv = labels @ user_value_weights over the first T tasks
    (two_tower_base_retrieval.py:322)."""
    w = jnp.asarray(cfg.user_value_weights, jnp.float32)
    return jnp.einsum("bt,t->b", labels[:, : cfg.num_tasks].astype(jnp.float32), w)


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross entropy with logits (numerically stable)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def softmax_retrieval_loss(
    params: Dict,
    cfg: ModelConfig,
    user_embedding: jnp.ndarray,  # [B, DI]
    item_embeddings: jnp.ndarray,  # [B, DI]
    position: jnp.ndarray,  # [B]
    labels: jnp.ndarray,  # [B, T]
    *,
    max_normalize: bool = True,
    scores: Optional[jnp.ndarray] = None,
    neg_item_embeddings: Optional[jnp.ndarray] = None,  # [B', DI]
    item_logq: Optional[jnp.ndarray] = None,  # [B]
    neg_logq: Optional[jnp.ndarray] = None,  # [B']
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """In-batch sampled-softmax loss weighted by (debiased) net_user_value.

    Reference semantics, step for step (two_tower_base_retrieval.py:279-347):
    [B,B] logits, per-row CE against the diagonal, nuv = labels @ w, debias
    hook, clamp >= 1e-6, normalize by the batch max (skipped by the light
    ranker's own path, two_tower_plus_light_ranker.py:286-289 — controlled by
    ``max_normalize``), weighted mean, plus the debias aux loss.

    Beyond the reference (its comments name both and cite the literature,
    two_tower_base_retrieval.py:289-295): ``neg_item_embeddings`` appends B'
    mixed uniform negatives to every row's candidate pool, and
    ``item_logq``/``neg_logq`` apply the sampled-softmax logQ correction —
    candidate j's logit becomes s_ij − logq_j, positives included (Yi et al.
    2019).  Both optional; absent, the loss is bit-identical to the parity
    path.  The corrected CE reduces to ``lse([u,1] @ [pool,−logq]^T) − pos``,
    so the fused rectangular LSE kernel applies unchanged via one appended
    feature column.
    """
    extended = neg_item_embeddings is not None or item_logq is not None
    if extended:
        ce = _extended_ce(
            cfg, user_embedding, item_embeddings, scores,
            neg_item_embeddings, item_logq, neg_logq,
        )
    elif scores is not None:
        ce = _in_batch_ce(scores)  # [B]
    elif cfg.fused_loss:
        from two_tower_models_tpu.ops.pallas.fused_softmax import (
            fused_in_batch_ce,
            fused_lse,
        )
        from two_tower_models_tpu.parallel.islands import island_mesh

        mesh = island_mesh()
        if mesh is None:
            # Embedding dtype flows into the kernel's MXU operands (bf16
            # under bf16 compute); all reductions inside accumulate in f32.
            ce, _ = fused_in_batch_ce(user_embedding, item_embeddings)
        else:
            # GSPMD path: the kernel runs in a manual shard_map island —
            # rows data-sharded, items replicated (full negative pool).
            # The diagonal positive needs the global row offset, so it is
            # computed OUTSIDE as a rowwise einsum the partitioner splits
            # on its own.
            from jax.sharding import PartitionSpec as P

            from two_tower_models_tpu.parallel.mesh import DATA_AXIS

            lse = jax.shard_map(
                lambda u, i: fused_lse(u, i),
                mesh=mesh,
                in_specs=(P(DATA_AXIS, None), P()),
                out_specs=P(DATA_AXIS),
                check_vma=False,
            )(user_embedding, item_embeddings)
            pos = jnp.einsum(
                "bd,bd->b", user_embedding, item_embeddings,
                preferred_element_type=jnp.float32,
            )
            ce = lse - pos
    else:
        scores_local = jnp.dot(
            user_embedding, item_embeddings.T, preferred_element_type=jnp.float32
        )  # [B, B]
        ce = _in_batch_ce(scores_local)
    nuv = _net_user_value(cfg, labels)  # [B]
    nuv, aux_loss = debias_net_user_value(params, cfg, nuv, position, user_embedding)
    aux_loss = aux_loss * cfg.debias_aux_weight
    nuv = jnp.clip(nuv, min=cfg.nuv_min)
    if max_normalize:
        nuv = nuv / jnp.max(nuv)
    loss = jnp.mean(ce * nuv) + aux_loss
    metrics = {
        "softmax_ce": jnp.mean(ce),
        "debias_aux_loss": aux_loss,
        "nuv_mean": jnp.mean(nuv),
    }
    return loss, metrics


def _light_ranker_train_terms(
    params: Dict,
    cfg: ModelConfig,
    ranker_user_embs: jnp.ndarray,  # [B, NU, DI]
    item_embeddings: jnp.ndarray,  # [B, DI]
    mips_scores_diag: jnp.ndarray,  # [B] — diagonal of the retrieval logits
    labels: jnp.ndarray,  # [B, T] or [B, 2T] under KD
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Pointwise light-ranker loss on the impressed item
    (two_tower_plus_light_ranker.py:298-340, with its latent concat/shape bugs
    fixed): target-aware attention of the impressed item against the NU user
    embeddings, concat features, T task logits, BCE against hard labels; under
    KD, T aux logits take BCE against the logged soft labels."""
    t = cfg.num_tasks
    ranker_scores = jnp.einsum(
        "bnd,bd->bn", ranker_user_embs, item_embeddings, preferred_element_type=jnp.float32
    )  # [B, NU]
    probs = jax.nn.softmax(ranker_scores, axis=-1)  # [B, NU]
    ta_user = jnp.einsum(
        "bn,bnd->bd", probs.astype(ranker_user_embs.dtype), ranker_user_embs,
        preferred_element_type=jnp.float32,
    )  # [B, DI]
    feat = jnp.concatenate(
        [
            item_embeddings.astype(jnp.float32),
            ta_user.astype(jnp.float32),
            ranker_scores,
            mips_scores_diag[:, None].astype(jnp.float32),
        ],
        axis=-1,
    )  # [B, 2*DI + NU + 1]
    task_logits = linear_apply(params["light_ranker_head"], feat)  # [B, T or 2T]

    hard_labels = labels[:, :t]
    bce = _bce_with_logits(task_logits[:, :t], hard_labels)
    metrics = {"light_ranker_bce": bce}
    loss = bce
    if cfg.kd:
        # Soft labels are logged main-ranker scores in [0, 1]; aux logits
        # distill against them with the same BCE form.
        soft_labels = labels[:, t : 2 * t]
        kd_loss = _bce_with_logits(task_logits[:, t : 2 * t], soft_labels)
        loss = loss + cfg.kd_loss_weight * kd_loss
        metrics["kd_loss"] = kd_loss
    return loss, metrics


def _reward_model_terms(
    params: Dict,
    cfg: ModelConfig,
    user_embedding: jnp.ndarray,  # [B, DI]
    item_embeddings: jnp.ndarray,  # [B, DI]
    scores: jnp.ndarray,  # [B, B] retrieval logits
    labels: jnp.ndarray,  # [B, T]
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Ranker-as-reward-model alignment, implementing the reference's comment
    spec (two_tower_base_plus_main_ranker_reward_model.py:113-122):

      * proxy ranker scores every (user, item) pair in the batch:
        logits[b, j, t] = Linear([user_emb_b, item_emb_j, scores_bj])
      * value-combine with user_value_weights -> [B, B]
      * softmax over items = "probability the ranker shows item at top"
      * KL(ranker_top_probs ‖ softmax(retrieval logits)) aligns retrieval
        with the ranker's preferences
      * the proxy itself trains with BCE on the impressed (diagonal) pairs.

    The pairwise linear is decomposed over its concat segments — W splits into
    [Wu; Wi; ws] — AND the task axis collapses into the value weights before
    anything pairwise forms, because the KL only consumes the value-combined
    matrix:

        vm[b, j] = sum_t uvw_t * (u_b@Wu + i_j@Wi + s_bj*ws + bias)_t
                 = u_b@(Wu@uvw) + i_j@(Wi@uvw) + s_bj*(ws.uvw) + bias.uvw

    so the only [B, B]-sized tensors are vm and the two softmaxes — the
    [B, B, T] logits tensor (201 MB at B=4096, T=3) never exists.  Per-task
    logits are still needed for the proxy's own BCE, but only on the
    diagonal (impressed pairs): a [B, T] computation.
    """
    w_full = params["proxy_ranker"]["w"].astype(jnp.float32)  # [2*DI+1, T]
    b_full = params["proxy_ranker"]["b"].astype(jnp.float32)  # [T]
    di = cfg.item_id_embedding_dim
    wu, wi, ws = w_full[:di], w_full[di : 2 * di], w_full[2 * di]  # [DI,T],[DI,T],[T]

    u32 = user_embedding.astype(jnp.float32)
    i32 = item_embeddings.astype(jnp.float32)
    s32 = scores.astype(jnp.float32)
    uvw = jnp.asarray(cfg.user_value_weights, jnp.float32)

    ranker_vm = (
        (u32 @ (wu @ uvw))[:, None]  # [B, 1]
        + (i32 @ (wi @ uvw))[None, :]  # [1, B]
        + s32 * jnp.dot(ws, uvw)
        + jnp.dot(b_full, uvw)
    )  # [B, B]
    ranker_top_probs = jax.lax.stop_gradient(jax.nn.softmax(ranker_vm, axis=-1))
    log_q = jax.nn.log_softmax(s32, axis=-1)  # retrieval distribution
    kl = jnp.mean(
        jnp.sum(
            ranker_top_probs
            * (jnp.log(jnp.clip(ranker_top_probs, min=1e-30)) - log_q),
            axis=-1,
        )
    )

    # proxy BCE trains on the impressed (diagonal) pairs only: [B, T]
    diag_logits = (
        u32 @ wu + i32 @ wi + jnp.diagonal(s32)[:, None] * ws[None, :] + b_full
    )
    proxy_bce = _bce_with_logits(diag_logits, labels[:, : cfg.num_tasks])

    loss = cfg.reward_model_loss_weight * kl + proxy_bce
    return loss, {"reward_kl": kl, "proxy_ranker_bce": proxy_bce}


def train_loss(
    params: Dict, cfg: ModelConfig, batch: Batch
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Training entry — scalar loss + metrics for any config point.

    Covers the reference's train_forward family:
      base/history/debias variants -> softmax_retrieval_loss with max-norm
        (two_tower_base_retrieval.py:349-394)
      light ranker (+KD)           -> retrieval term *without* max-norm plus
        the pointwise BCE/KD terms (two_tower_plus_light_ranker.py:211-340)
      reward model                 -> base term plus KL alignment
        (two_tower_base_plus_main_ranker_reward_model.py:64-124)
    """
    user_emb, ranker_embs = compute_user_embedding(
        params, cfg, batch.user_id, batch.user_features, batch.user_history,
        batch.history_len,
    )
    item_embs = compute_item_embeddings(params, cfg, batch.item_id, batch.item_features)
    # The full [B, B] score matrix only materializes when a consumer needs it
    # (reward-model pairwise logits); otherwise the fused kernel (or XLA's own
    # fusion) keeps it out of HBM.
    scores = (
        jnp.dot(user_emb, item_embs.T, preferred_element_type=jnp.float32)
        if cfg.reward_model
        else None
    )
    # Mixed uniform negatives ride the item tower like any other item; the
    # logQ fields pass straight through to the CE (see _extended_ce).
    neg_embs = (
        compute_item_embeddings(params, cfg, batch.neg_item_id, batch.neg_item_features)
        if batch.neg_item_id is not None
        else None
    )
    sampling_kw = dict(
        neg_item_embeddings=neg_embs,
        item_logq=batch.item_logq,
        neg_logq=batch.neg_logq,
    )

    if cfg.light_ranker is not None:
        retrieval_loss, metrics = softmax_retrieval_loss(
            params, cfg, user_emb, item_embs, batch.position, batch.labels,
            max_normalize=False, scores=scores, **sampling_kw,
        )
        diag = (
            jnp.diagonal(scores)
            if scores is not None
            else jnp.einsum(
                "bd,bd->b", user_emb, item_embs, preferred_element_type=jnp.float32
            )
        )
        lr_loss, lr_metrics = _light_ranker_train_terms(
            params, cfg, ranker_embs, item_embs, diag, batch.labels
        )
        loss = retrieval_loss + lr_loss
        metrics.update(lr_metrics)
    else:
        loss, metrics = softmax_retrieval_loss(
            params, cfg, user_emb, item_embs, batch.position, batch.labels,
            scores=scores, **sampling_kw,
        )

    if cfg.reward_model:
        rm_loss, rm_metrics = _reward_model_terms(
            params, cfg, user_emb, item_embs, scores, batch.labels
        )
        loss = loss + rm_loss
        metrics.update(rm_metrics)

    metrics["loss"] = loss
    return loss, metrics


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------


def retrieve_from_embeddings(
    params: Dict,
    cfg: ModelConfig,
    user_emb: jnp.ndarray,  # [B, DI]
    ranker_embs: Optional[jnp.ndarray],  # [B, NU, DI] when light ranker on
    topk_fn,  # (query [B, DI], k) -> (indices, scores, embeddings)
) -> jnp.ndarray:
    """Top-k retrieval [+ light-ranker rerank] given precomputed user
    embeddings and a top-k implementation.

    The ``topk_fn`` seam is what lets the sharded path (corpus row-sharded
    over the mesh, ``retrieval.mips.sharded_mips_topk``) reuse the exact
    rerank logic of the single-device path."""
    if cfg.light_ranker is None:
        indices, _, _ = topk_fn(user_emb, cfg.num_items)
        return indices

    lr = cfg.light_ranker
    mips_items, mips_scores, mips_item_emb = topk_fn(
        user_emb, lr.num_mips_items
    )  # [B,NI], [B,NI], [B,NI,DI]

    # Target-aware attention of each candidate against the NU user embeddings
    # (two_tower_plus_light_ranker.py:165-176).
    scores = jnp.einsum(
        "bnd,bkd->bkn", ranker_embs, mips_item_emb, preferred_element_type=jnp.float32
    )  # [B, NI, NU]
    probs = jax.nn.softmax(scores, axis=-1)
    ta_user = jnp.einsum(
        "bkn,bnd->bkd", probs.astype(ranker_embs.dtype), ranker_embs,
        preferred_element_type=jnp.float32,
    )  # [B, NI, DI]

    feat = jnp.concatenate(
        [
            mips_item_emb.astype(jnp.float32),
            ta_user.astype(jnp.float32),
            scores,
            mips_scores[:, :, None].astype(jnp.float32),
        ],
        axis=-1,
    )  # [B, NI, 2*DI + NU + 1]
    task_logits = linear_apply(params["light_ranker_head"], feat)  # [B, NI, T(.2T)]
    # Aux KD logits (if any) are train-only (two_tower_plus_light_ranker_plus_main_ranker_kd.py:15-18).
    task_logits = task_logits[..., : cfg.num_tasks]

    uvw = jnp.asarray(cfg.user_value_weights, jnp.float32)
    value = jnp.einsum("bkt,t->bk", task_logits, uvw)  # [B, NI]
    _, top_idx = jax.lax.top_k(value, cfg.num_items)  # [B, num_items]
    return jnp.take_along_axis(mips_items, top_idx, axis=1)


def retrieve(
    params: Dict,
    cfg: ModelConfig,
    corpus: jnp.ndarray,  # [C, DI] — MIPS corpus (see retrieval.mips)
    user_id,
    user_features,
    user_history,
    history_len=None,
) -> jnp.ndarray:
    """Inference: top ``cfg.num_items`` corpus indices per user [B, num_items].

    Base path (two_tower_base_retrieval.py:221-249): user embedding -> exact
    MIPS top-k.  Light-ranker path (two_tower_plus_light_ranker.py:131-209):
    MIPS top ``num_mips_items`` then pointwise rerank to ``num_items``.
    """
    from two_tower_models_tpu.retrieval.mips import mips_topk_approx, mips_topk_exact
    from two_tower_models_tpu.retrieval.quant import (
        QuantizedCorpus,
        mips_topk_quantized,
    )

    if isinstance(corpus, QuantizedCorpus):
        # int8 serving corpus (retrieval.quant): half the scan bandwidth;
        # approx_mips picks the pre-selection op, qc.raw opts into rescore.
        base = functools.partial(
            mips_topk_quantized,
            recall_target=cfg.mips_recall_target if cfg.approx_mips else None,
        )
    elif cfg.approx_mips:
        # Serving path: PartialReduce-backed approximate top-k (config.py).
        base = functools.partial(mips_topk_approx, recall_target=cfg.mips_recall_target)
    else:
        # Exact path (offline eval / parity): Pallas tile-max pipeline.
        base = mips_topk_exact
    topk_fn = lambda q, k: base(corpus, q, k)

    user_emb, ranker_embs = compute_user_embedding(
        params, cfg, user_id, user_features, user_history, history_len
    )
    return retrieve_from_embeddings(params, cfg, user_emb, ranker_embs, topk_fn)
