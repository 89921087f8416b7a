"""Fused softmax-CE Pallas kernel vs the pure-jnp reference (interpret mode
on CPU; the same kernel compiles via Mosaic on TPU — exercised by bench)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from two_tower_models_tpu.ops.pallas import fused_softmax as fs


def _rand(b, d, seed=0):
    ku, ki = jax.random.split(jax.random.key(seed))
    return (
        jax.random.normal(ku, (b, d)) * 0.5,
        jax.random.normal(ki, (b, d)) * 0.5,
    )


@pytest.mark.parametrize("b,d,tile", [(128, 32, 128), (256, 64, 128), (200, 32, 128)])
def test_forward_matches_reference(b, d, tile):
    u, it = _rand(b, d)
    with pltpu.force_tpu_interpret_mode():
        ce, lse = fs.fused_in_batch_ce(u, it, tile)
    ce_ref, lse_ref = fs.in_batch_ce_reference(u, it)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(ce_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,d,tile", [(128, 32, 128), (200, 32, 128)])
def test_backward_matches_reference(b, d, tile):
    """VJP of weighted-sum-of-ce w.r.t. both embeddings (the exact pattern the
    training loss uses: ce dotted with per-example weights)."""
    u, it = _rand(b, d, seed=3)
    w = jax.random.uniform(jax.random.key(7), (b,))

    def loss_kernel(u, it):
        with pltpu.force_tpu_interpret_mode():
            ce, _ = fs.fused_in_batch_ce(u, it, tile)
        return jnp.sum(ce * w)

    def loss_ref(u, it):
        ce, _ = fs.in_batch_ce_reference(u, it)
        return jnp.sum(ce * w)

    gu_k, gi_k = jax.grad(loss_kernel, argnums=(0, 1))(u, it)
    gu_r, gi_r = jax.grad(loss_ref, argnums=(0, 1))(u, it)
    np.testing.assert_allclose(np.asarray(gu_k), np.asarray(gu_r), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_k), np.asarray(gi_r), rtol=1e-4, atol=1e-5)


def test_train_loss_fused_flag_parity():
    """train_loss(fused_loss=True) == train_loss(fused_loss=False), value and
    gradients — the kernel is a drop-in for the dense loss path."""
    import dataclasses

    from tests.conftest import make_batch
    from two_tower_models_tpu.config import Debias, HistoryEncoderConfig, ModelConfig
    from two_tower_models_tpu.models import two_tower

    cfg = ModelConfig(
        user_id_hash_size=64,
        user_id_embedding_dim=16,
        item_id_hash_size=64,
        item_id_embedding_dim=16,
        user_features_size=8,
        item_features_size=8,
        feature_hidden_dim=32,
        user_value_weights=(1.0,),
        history_len=4,
        history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
        debias=Debias.BOTH,
    )
    cfg_fused = dataclasses.replace(cfg, fused_loss=True)
    params = two_tower.init_params(jax.random.key(0), cfg)
    batch = make_batch(jax.random.key(1), cfg, 32)

    (l_dense, _), g_dense = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, cfg, batch), has_aux=True
    )(params)
    (l_fused, _), g_fused = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, cfg_fused, batch), has_aux=True
    )(params)
    np.testing.assert_allclose(float(l_fused), float(l_dense), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_fused),
        jax.tree_util.tree_leaves_with_path(g_dense),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=f"grad mismatch at {pa}",
        )


def test_large_logits_numerically_stable():
    """Online max-shift keeps exp() in range where naive sumexp overflows."""
    u, it = _rand(128, 32, seed=5)
    u = u * 100.0  # logits ~ O(1000)
    with pltpu.force_tpu_interpret_mode():
        ce, _ = fs.fused_in_batch_ce(u, it, 128)
    assert np.all(np.isfinite(np.asarray(ce)))
    ce_ref, _ = fs.in_batch_ce_reference(u, it)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(ce_ref), rtol=1e-4, atol=1e-4)
