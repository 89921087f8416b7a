"""Blockwise attention kernel vs dense reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.ops.pallas.history_attention import (
    attention_reference,
    blockwise_self_attention,
)


@pytest.mark.parametrize(
    "n,h,dh,kv_tile",
    [
        (4, 128, 16, 128),   # production-ish history shape (padded lanes)
        (2, 200, 32, 128),   # H not a tile multiple -> masking path
        (3, 384, 64, 128),   # multiple kv tiles -> online-softmax carry
    ],
)
def test_matches_dense_reference(n, h, dh, kv_tile):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (n, h, dh))
    k = jax.random.normal(ks[1], (n, h, dh))
    v = jax.random.normal(ks[2], (n, h, dh))
    out = blockwise_self_attention(q, k, v, 128, kv_tile)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "n,h,dh",
    [
        (2, 160, 16),   # H not a tile multiple -> masked flash bwd
        (2, 384, 32),   # multiple kv AND q tiles in the bwd loops
    ],
)
def test_gradients_match_dense_reference(n, h, dh):
    """Flash-backward parity: blockwise fwd+bwd == dense fwd+bwd.  The
    backward never materializes [H, H] (two-pass flash bwd from saved lse)."""
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (n, h, dh))
    k = jax.random.normal(ks[1], (n, h, dh))
    v = jax.random.normal(ks[2], (n, h, dh))

    def loss_k(q, k, v):
        return jnp.sum(blockwise_self_attention(q, k, v) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_mha_blockwise_flag_parity():
    """mha_apply(blockwise=True) == mha_apply(blockwise=False)."""
    from two_tower_models_tpu.nn.attention import mha_apply, mha_init

    params = mha_init(jax.random.key(0), 32, 2)
    x = jax.random.normal(jax.random.key(1), (4, 96, 32))
    dense = mha_apply(params, x, 2)
    block = mha_apply(params, x, 2, blockwise=True)
    np.testing.assert_allclose(np.asarray(block), np.asarray(dense), rtol=1e-4, atol=1e-5)


def test_extreme_scores_stable():
    ks = jax.random.split(jax.random.key(1), 3)
    q = 30.0 * jax.random.normal(ks[0], (2, 256, 16))
    k = 30.0 * jax.random.normal(ks[1], (2, 256, 16))
    v = jax.random.normal(ks[2], (2, 256, 16))
    out = blockwise_self_attention(q, k, v)
    assert np.all(np.isfinite(np.asarray(out)))
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)


def test_gradients_nonsquare_tiles():
    """q_tile != kv_tile exercises independent tiling of the two bwd loops."""
    ks = jax.random.split(jax.random.key(5), 3)
    q = jax.random.normal(ks[0], (2, 300, 16))
    k = jax.random.normal(ks[1], (2, 300, 16))
    v = jax.random.normal(ks[2], (2, 300, 16))

    def loss_k(q, k, v):
        return jnp.sum(blockwise_self_attention(q, k, v, 128, 256) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
