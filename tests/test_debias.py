"""Debiasing hooks: semantics of each head against hand computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_batch
from two_tower_models_tpu.config import Debias, HistoryEncoderConfig, ModelConfig
from two_tower_models_tpu.models import two_tower


def _cfg(debias):
    return ModelConfig(
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
        debias=debias,
    )


@pytest.mark.parametrize("debias", [Debias.POSITION, Debias.USER, Debias.BOTH])
def test_train_loss_scalar_and_grads(debias):
    cfg = _cfg(debias)
    params = two_tower.init_params(jax.random.key(0), cfg)
    batch = make_batch(jax.random.key(1), cfg, 16)
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, cfg, batch), has_aux=True
    )(params)
    assert np.isfinite(float(loss))
    assert float(metrics["debias_aux_loss"]) >= 0
    # The position/both heads receive gradient (raw-estimate MSE).  The USER
    # variant clamps BEFORE its MSE (reference semantics,
    # two_tower_with_user_debiased_weights.py:125-132), so when every initial
    # estimate sits below the 1e-1 floor the head is gradient-dead — that
    # saturation is part of the contract, covered below.
    if debias != Debias.USER:
        head = "position_bias_table" if debias == Debias.POSITION else "user_debias_head"
        g = grads[head]
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert total > 0


def test_user_debias_gradient_flows_when_above_floor():
    """Above the clamp floor the user head trains; below it is saturated dead
    (faithful to the reference's clamp-before-MSE ordering)."""
    cfg = _cfg(Debias.USER)
    params = two_tower.init_params(jax.random.key(0), cfg)
    # Pin the head to emit est = 1.0 (> floor) so the clamp is inactive.
    params["user_debias_head"]["w"] = jnp.zeros_like(params["user_debias_head"]["w"])
    params["user_debias_head"]["b"] = jnp.ones_like(params["user_debias_head"]["b"])
    B = 8
    nuv = 2.0 * jnp.ones((B,))
    position = jnp.zeros((B,), jnp.int32)
    user_emb = jax.random.normal(jax.random.key(4), (B, 16))

    def aux_of(p):
        _, aux = two_tower.debias_net_user_value(p, cfg, nuv, position, user_emb)
        return aux

    g = jax.grad(aux_of)(params)["user_debias_head"]
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_position_debias_manual_semantics():
    """est = table[position]; aux = sum((est - nuv)^2); nuv / clip(est, 1e-3)
    — two_tower_with_position_debiased_weights.py:94-113."""
    cfg = _cfg(Debias.POSITION)
    params = two_tower.init_params(jax.random.key(0), cfg)
    B = 8
    nuv = jnp.abs(jax.random.normal(jax.random.key(2), (B,)))
    position = jax.random.randint(jax.random.key(3), (B,), 0, cfg.position_table_size)
    user_emb = jax.random.normal(jax.random.key(4), (B, cfg.item_id_embedding_dim))

    out, aux = two_tower.debias_net_user_value(params, cfg, nuv, position, user_emb)
    est = np.asarray(params["position_bias_table"])[np.asarray(position), 0]
    np.testing.assert_allclose(
        float(aux), float(((est - np.asarray(nuv)) ** 2).sum()), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(nuv) / np.clip(est, 1e-3, None), rtol=1e-5
    )


def test_user_debias_clamps_before_mse():
    """User variant clamps the estimate BEFORE the MSE
    (two_tower_with_user_debiased_weights.py:125-132) — ordering is part of
    the semantics and differs from the position variant."""
    cfg = _cfg(Debias.USER)
    params = two_tower.init_params(jax.random.key(0), cfg)
    B = 8
    nuv = jnp.abs(jax.random.normal(jax.random.key(2), (B,)))
    position = jnp.zeros((B,), jnp.int32)
    user_emb = jax.random.normal(jax.random.key(4), (B, cfg.item_id_embedding_dim))

    out, aux = two_tower.debias_net_user_value(params, cfg, nuv, position, user_emb)
    w = np.asarray(params["user_debias_head"]["w"])
    b = np.asarray(params["user_debias_head"]["b"])
    est_raw = np.asarray(user_emb) @ w[:, 0] + b[0]
    est_clamped = np.clip(est_raw, 1e-1, None)
    np.testing.assert_allclose(
        float(aux), float(((est_clamped - np.asarray(nuv)) ** 2).sum()), rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(nuv) / est_clamped, rtol=1e-4)


def test_combined_debias_divides_by_user_estimate_only():
    """BOTH: correct [B]-vs-[B] position MSE (reference has a broadcast bug
    here), division by the clamped user estimate only
    (two_tower_with_debiasing.py:100-129)."""
    cfg = _cfg(Debias.BOTH)
    params = two_tower.init_params(jax.random.key(0), cfg)
    B = 8
    nuv = jnp.abs(jax.random.normal(jax.random.key(2), (B,)))
    position = jax.random.randint(jax.random.key(3), (B,), 0, cfg.position_table_size)
    user_emb = jax.random.normal(jax.random.key(4), (B, cfg.item_id_embedding_dim))

    out, aux = two_tower.debias_net_user_value(params, cfg, nuv, position, user_emb)
    e_pos = np.asarray(params["position_bias_table"])[np.asarray(position)]  # [B,1]
    w = np.asarray(params["user_debias_head"]["w"])
    b = np.asarray(params["user_debias_head"]["b"])
    e_user = np.concatenate([np.asarray(user_emb), e_pos], axis=1) @ w[:, 0] + b[0]
    aux_expected = ((e_pos[:, 0] - np.asarray(nuv)) ** 2).sum() + (
        (e_user - np.asarray(nuv)) ** 2
    ).sum()
    np.testing.assert_allclose(float(aux), float(aux_expected), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(nuv) / np.clip(e_user, 1e-3, None), rtol=1e-4
    )
