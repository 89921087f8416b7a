"""Light ranker, KD, and reward model — the three variants that are stubs or
broken in the reference (SURVEY §2.4), implemented working here."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_batch
from two_tower_models_tpu.config import (
    Debias,
    HistoryEncoderConfig,
    LightRankerConfig,
    ModelConfig,
)
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.retrieval.mips import mips_init

BASE = dict(
    num_items=5,
    user_id_hash_size=64,
    user_id_embedding_dim=16,
    item_id_hash_size=64,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    feature_hidden_dim=32,
    user_value_weights=(1.0, 0.5),
    history_len=4,
    history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
    debias=Debias.BOTH,
)
LR_CFG = ModelConfig(
    **BASE, light_ranker=LightRankerConfig(num_mips_items=20, num_ranker_user_embeddings=3)
)
KD_CFG = ModelConfig(
    **BASE,
    light_ranker=LightRankerConfig(num_mips_items=20, num_ranker_user_embeddings=3),
    kd=True,
)
RM_CFG = ModelConfig(**BASE, reward_model=True)
B = 16


def test_light_ranker_user_embedding_shapes():
    params = two_tower.init_params(jax.random.key(0), LR_CFG)
    batch = make_batch(jax.random.key(1), LR_CFG, B)
    mips_emb, ranker_embs = two_tower.compute_user_embedding(
        params, LR_CFG, batch.user_id, batch.user_features, batch.user_history
    )
    assert mips_emb.shape == (B, 16)
    assert ranker_embs.shape == (B, 3, 16)


def test_light_ranker_two_stage_forward():
    """MIPS top-20 then rerank to top-5; indices valid and within the
    retrieved candidate set."""
    params = two_tower.init_params(jax.random.key(0), LR_CFG)
    batch = make_batch(jax.random.key(1), LR_CFG, B)
    corpus = mips_init(jax.random.key(2), 100, 16)
    top = jax.jit(
        lambda p, c, b: two_tower.retrieve(
            p, LR_CFG, c, b.user_id, b.user_features, b.user_history
        )
    )(params, corpus, batch)
    assert top.shape == (B, 5)
    assert jnp.all(top >= 0) and jnp.all(top < 100)
    # reranked results are a subset of the stage-1 candidates
    user_emb, _ = two_tower.compute_user_embedding(
        params, LR_CFG, batch.user_id, batch.user_features, batch.user_history
    )
    from two_tower_models_tpu.retrieval.mips import mips_topk

    cand, _, _ = mips_topk(corpus, user_emb, 20)
    for b in range(B):
        assert set(np.asarray(top[b])) <= set(np.asarray(cand[b]))


def test_light_ranker_train_loss_and_grads():
    params = two_tower.init_params(jax.random.key(0), LR_CFG)
    batch = make_batch(jax.random.key(1), LR_CFG, B)
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, LR_CFG, batch), has_aux=True
    )(params)
    assert np.isfinite(float(loss))
    assert "light_ranker_bce" in metrics
    for name in ("ranker_user_tower", "light_ranker_head"):
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads[name]))
        assert total > 0, f"no gradient into {name}"


def test_light_ranker_skips_max_normalization():
    """The light ranker's retrieval term clamps nuv but does NOT max-normalize
    (two_tower_plus_light_ranker.py:286-289) — scaling labels must scale the
    retrieval term, unlike the base path where normalization cancels it."""
    params = two_tower.init_params(jax.random.key(0), LR_CFG)
    batch = make_batch(jax.random.key(1), LR_CFG, B)
    scaled = batch._replace(labels=batch.labels * 2.0)
    # isolate the retrieval term by comparing softmax_ce-weighted parts via
    # full losses with identical ranker inputs except labels scaling
    l1, m1 = two_tower.train_loss(params, LR_CFG, batch)
    l2, m2 = two_tower.train_loss(params, LR_CFG, scaled)
    assert not np.isclose(float(l1), float(l2), rtol=1e-3)


def test_kd_uses_soft_labels():
    params = two_tower.init_params(jax.random.key(0), KD_CFG)
    # labels widen to [B, 2T]
    batch = make_batch(jax.random.key(1), KD_CFG, B, num_label_cols=4)
    loss, metrics = two_tower.train_loss(params, KD_CFG, batch)
    assert np.isfinite(float(loss))
    assert "kd_loss" in metrics
    # changing ONLY the soft labels changes the loss (they are consumed)
    soft2 = batch.labels.at[:, 2:].set(1.0 - batch.labels[:, 2:])
    l2, _ = two_tower.train_loss(params, KD_CFG, batch._replace(labels=soft2))
    assert float(loss) != float(l2)
    # KD head emits 2T logits; aux logits excluded at inference
    assert params["light_ranker_head"]["w"].shape[1] == 4


def test_kd_inference_matches_non_kd_head_shape():
    params = two_tower.init_params(jax.random.key(0), KD_CFG)
    batch = make_batch(jax.random.key(1), KD_CFG, B, num_label_cols=4)
    corpus = mips_init(jax.random.key(2), 100, 16)
    top = two_tower.retrieve(
        params, KD_CFG, corpus, batch.user_id, batch.user_features, batch.user_history
    )
    assert top.shape == (B, 5)


def test_reward_model_loss_and_grads():
    params = two_tower.init_params(jax.random.key(0), RM_CFG)
    batch = make_batch(jax.random.key(1), RM_CFG, B)
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, RM_CFG, batch), has_aux=True
    )(params)
    assert np.isfinite(float(loss))
    assert float(metrics["reward_kl"]) >= -1e-6  # KL is non-negative
    assert "proxy_ranker_bce" in metrics
    # proxy ranker trains (BCE on diagonal pairs)
    total = sum(
        float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads["proxy_ranker"])
    )
    assert total > 0


def test_reward_model_decomposed_pairwise_linear_is_exact():
    """The [B,B,2DI+1] proxy feature tensor is never built; verify the
    segment-decomposed logits equal the explicit concat+linear computation."""
    params = two_tower.init_params(jax.random.key(0), RM_CFG)
    Bs, DI = 6, 16
    u = jax.random.normal(jax.random.key(2), (Bs, DI))
    it = jax.random.normal(jax.random.key(3), (Bs, DI))
    s = u @ it.T
    labels = jnp.ones((Bs, 2))

    _, metrics = two_tower._reward_model_terms(params, RM_CFG, u, it, s, labels)

    w = np.asarray(params["proxy_ranker"]["w"])
    b = np.asarray(params["proxy_ranker"]["b"])
    un, itn, sn = np.asarray(u), np.asarray(it), np.asarray(s)
    feats = np.concatenate(
        [
            np.repeat(un[:, None, :], Bs, 1),
            np.repeat(itn[None, :, :], Bs, 0),
            sn[:, :, None],
        ],
        axis=2,
    )
    logits = feats @ w + b  # [B, B, T]
    diag = np.stack([logits[i, i] for i in range(Bs)])
    # proxy BCE over diagonal pairs with all-ones labels
    per = np.maximum(diag, 0) - diag * 1.0 + np.log1p(np.exp(-np.abs(diag)))
    np.testing.assert_allclose(
        float(metrics["proxy_ranker_bce"]), per.mean(), rtol=1e-5
    )
