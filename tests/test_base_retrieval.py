"""Base two-tower model: shape contracts, loss smoke + semantics.

Mirrors the reference test patterns (tests/test_two_tower_base_retrieval.py):
shape/range contracts on forward, scalar finite loss on train_forward — plus
gradient and semantic checks the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_batch
from two_tower_models_tpu.config import ModelConfig
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.retrieval.mips import mips_init

# Reference unit-test scale (tests/test_two_tower_base_retrieval.py:10-38)
CFG = ModelConfig(
    num_items=10,
    user_id_hash_size=100,
    user_id_embedding_dim=50,
    user_features_size=40,
    item_id_hash_size=200,
    item_id_embedding_dim=40,
    item_features_size=30,
    user_value_weights=(0.5, 0.3, 0.2),
    history_len=16,
)
B = 32


@pytest.fixture(scope="module")
def setup():
    key = jax.random.key(0)
    params = two_tower.init_params(key, CFG)
    batch = make_batch(jax.random.key(1), CFG, B)
    corpus = mips_init(jax.random.key(2), 1001, CFG.item_id_embedding_dim)
    return params, batch, corpus


def test_user_embedding_shape(setup):
    params, batch, _ = setup
    user_emb, ranker = two_tower.compute_user_embedding(
        params, CFG, batch.user_id, batch.user_features, batch.user_history
    )
    assert user_emb.shape == (B, CFG.item_id_embedding_dim)
    assert ranker is None


def test_item_embeddings_shape(setup):
    params, batch, _ = setup
    item_emb = two_tower.compute_item_embeddings(
        params, CFG, batch.item_id, batch.item_features
    )
    assert item_emb.shape == (B, CFG.item_id_embedding_dim)


def test_forward_returns_valid_indices(setup):
    params, batch, corpus = setup
    top = jax.jit(
        lambda p, c, b: two_tower.retrieve(
            p, CFG, c, b.user_id, b.user_features, b.user_history
        )
    )(params, corpus, batch)
    assert top.shape == (B, CFG.num_items)
    assert jnp.all(top >= 0) and jnp.all(top < corpus.shape[0])


def test_train_loss_scalar_finite(setup):
    params, batch, _ = setup
    loss, metrics = jax.jit(lambda p, b: two_tower.train_loss(p, CFG, b))(params, batch)
    assert loss.shape == ()
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["softmax_ce"]))


def test_gradients_flow_everywhere(setup):
    params, batch, _ = setup
    grads = jax.grad(lambda p: two_tower.train_loss(p, CFG, batch)[0])(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    assert len(flat) > 0
    for path, g in flat:
        assert np.all(np.isfinite(np.asarray(g))), f"non-finite grad at {path}"
    # Towers that feed the loss must receive signal.
    assert float(jnp.abs(grads["user_tower_head"]["w"]).sum()) > 0
    assert float(jnp.abs(grads["item_tower_head"]["w"]).sum()) > 0
    # ID tables get sparse but nonzero updates.
    assert float(jnp.abs(grads["user_id_table"]).sum()) > 0
    assert float(jnp.abs(grads["item_id_table"]).sum()) > 0


def test_loss_semantics_match_manual_computation(setup):
    """Bit-level check of the §2.2 loss recipe against a hand computation."""
    params, batch, _ = setup
    user_emb, _ = two_tower.compute_user_embedding(
        params, CFG, batch.user_id, batch.user_features, batch.user_history
    )
    item_emb = two_tower.compute_item_embeddings(
        params, CFG, batch.item_id, batch.item_features
    )
    scores = np.asarray(user_emb, np.float64) @ np.asarray(item_emb, np.float64).T
    # per-row CE with diagonal target
    m = scores.max(axis=1, keepdims=True)
    lse = np.log(np.exp(scores - m).sum(axis=1)) + m[:, 0]
    ce = lse - np.diagonal(scores)
    nuv = np.asarray(batch.labels, np.float64) @ np.array(CFG.user_value_weights)
    nuv = np.clip(nuv, 1e-6, None)
    nuv = nuv / nuv.max()
    expected = float((ce * nuv).mean())

    loss, _ = two_tower.train_loss(params, CFG, batch)
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_hard_negatives_contribute_no_ce_weight(setup):
    """Rows with all-zero labels (nuv -> 1e-6 floor) get ~zero loss weight."""
    params, batch, _ = setup
    zero_labels = batch.labels.at[: B // 2].set(0.0)
    b2 = batch._replace(labels=zero_labels)
    loss_all_pos, _ = two_tower.train_loss(params, CFG, batch)
    loss_half_neg, _ = two_tower.train_loss(params, CFG, b2)
    # Halving the positives roughly halves the weighted CE (weights
    # max-normalize within the positive half).
    assert float(loss_half_neg) < float(loss_all_pos)


def test_jit_retrace_free_across_batches(setup):
    params, _, _ = setup
    fn = jax.jit(lambda p, b: two_tower.train_loss(p, CFG, b)[0])
    b1 = make_batch(jax.random.key(10), CFG, B)
    b2 = make_batch(jax.random.key(11), CFG, B)
    l1, l2 = fn(params, b1), fn(params, b2)
    assert fn._cache_size() == 1
    assert float(l1) != float(l2)
