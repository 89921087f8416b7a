"""Fused whole-layer MHA kernel vs dense reference: forward and full VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.ops.pallas.fused_mha import (
    fused_mha_layer,
    mha_layer_reference,
)


def _setup(b, h, d, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    x = jax.random.normal(ks[0], (b, h, d))
    w_in = jax.random.normal(ks[1], (d, 3 * d)) * 0.05
    b_in = jax.random.normal(ks[2], (3 * d,)) * 0.01
    w_out = jax.random.normal(ks[3], (d, d)) * 0.05
    b_out = jax.random.normal(ks[4], (d,)) * 0.01
    return x, w_in, b_in, w_out, b_out


@pytest.mark.parametrize(
    "b,h,d,nh,tile",
    [
        (128, 32, 64, 4, 128),   # production shape
        (100, 10, 64, 4, 128),   # B and H both padded
        (64, 16, 128, 8, 64),    # wider model, more heads
    ],
)
def test_forward_matches_reference(b, h, d, nh, tile):
    x, wi, bi, wo, bo = _setup(b, h, d)
    out = fused_mha_layer(x, wi, bi, wo, bo, nh, tile)
    ref = mha_layer_reference(x, wi, bi, wo, bo, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("b,h,d,nh,tile", [(128, 32, 64, 4, 64), (96, 12, 64, 4, 64)])
def test_vjp_matches_reference(b, h, d, nh, tile):
    """Gradients w.r.t. x and ALL weights through the fused backward kernel."""
    x, wi, bi, wo, bo = _setup(b, h, d, seed=3)
    g_target = jax.random.normal(jax.random.key(9), (b, h, d))

    def loss_k(x, wi, bi, wo, bo):
        return jnp.sum(fused_mha_layer(x, wi, bi, wo, bo, nh, tile) * g_target)

    def loss_r(x, wi, bi, wo, bo):
        return jnp.sum(mha_layer_reference(x, wi, bi, wo, bo, nh) * g_target)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, wi, bi, wo, bo)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, wi, bi, wo, bo)
    names = ["dx", "dw_in", "db_in", "dw_out", "db_out"]
    for name, a, b_ in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_train_loss_fused_mha_flag_parity():
    """Full train_loss with fused_kernel=True == dense path (value + grads)."""
    import dataclasses

    from tests.conftest import make_batch
    from two_tower_models_tpu.config import Debias, HistoryEncoderConfig, ModelConfig
    from two_tower_models_tpu.models import two_tower

    base_hist = HistoryEncoderConfig(num_heads=2, num_layers=2)
    cfg = ModelConfig(
        user_id_hash_size=64,
        user_id_embedding_dim=16,
        item_id_hash_size=64,
        item_id_embedding_dim=64,  # D=64: realistic kernel lane width
        user_features_size=8,
        item_features_size=8,
        feature_hidden_dim=32,
        user_value_weights=(1.0,),
        history_len=16,
        history_encoder=base_hist,
        debias=Debias.BOTH,
    )
    cfg_fused = dataclasses.replace(
        cfg, history_encoder=dataclasses.replace(base_hist, fused_kernel=True)
    )
    params = two_tower.init_params(jax.random.key(0), cfg)
    batch = make_batch(jax.random.key(1), cfg, 16)

    (l_d, _), g_d = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, cfg, batch), has_aux=True
    )(params)
    (l_f, _), g_f = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, cfg_fused, batch), has_aux=True
    )(params)
    np.testing.assert_allclose(float(l_f), float(l_d), rtol=1e-4)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_f),
        jax.tree_util.tree_leaves_with_path(g_d),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5,
            err_msg=f"grad mismatch at {pa}",
        )


def test_weight_grads_accumulate_across_tiles():
    """Multiple grid programs hit the same weight-grad block; ensure the
    accumulation equals the single-tile result."""
    x, wi, bi, wo, bo = _setup(256, 8, 64, seed=5)

    def gw(tile):
        return jax.grad(
            lambda w: jnp.sum(fused_mha_layer(x, w, bi, wo, bo, 4, tile) ** 2)
        )(wi)

    np.testing.assert_allclose(
        np.asarray(gw(64)), np.asarray(gw(256)), rtol=2e-4, atol=2e-4
    )


def test_head_score_disparity_no_underflow():
    """Regression (advisor r1): a head whose scores sit far below the hottest
    head must still get a valid softmax — the merged-head kernel now uses
    PER-HEAD maxes, where a single global row max underflowed the cold head's
    probabilities to all-zero."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from two_tower_models_tpu.ops.pallas.fused_mha import (
        fused_mha_layer,
        mha_layer_reference,
    )

    B, H, D, NH = 16, 32, 64, 4
    hd = D // NH
    ks = jax.random.split(jax.random.key(11), 5)
    x = jax.random.normal(ks[0], (B, H, D))
    w_in = jax.random.normal(ks[1], (D, 3 * D)) * 0.05
    # blow up head 0's q AND k projections: its scores ~ (30)^2 x hotter
    w_in = w_in.at[:, 0:hd].mul(30.0).at[:, D : D + hd].mul(30.0)
    b_in = jnp.zeros((3 * D,))
    w_out = jax.random.normal(ks[3], (D, D)) * 0.05
    b_out = jnp.zeros((D,))

    out = fused_mha_layer(x, w_in, b_in, w_out, b_out, NH)
    ref = mha_layer_reference(x, w_in, b_in, w_out, b_out, NH)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4
    )
