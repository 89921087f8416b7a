"""Mixed negative sampling + sampled-softmax logQ correction.

The reference ships plain in-batch softmax on purpose and points at the
corrections in comments (two_tower_base_retrieval.py:289-295); these tests
pin the implemented semantics: ce[b] = lse_j(s_bj - logq_j) - (s_bb - logq_b)
over the pool [in-batch items; uniform extras], identical across the three
CE routes (precomputed scores / fused augmented-column LSE / plain dot), and
inert when both features are off.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.config import DataConfig, ModelConfig, TrainConfig
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.models.two_tower import Batch
from two_tower_models_tpu.training.data import extend_batch, gather_batch, make_synthetic_data
from two_tower_models_tpu.training.state import create_train_state
from two_tower_models_tpu.training.step import make_train_step

CFG = ModelConfig(
    user_id_hash_size=64,
    user_id_embedding_dim=16,
    item_id_hash_size=64,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    user_value_weights=(1.0, 0.5),
    history_len=8,
    mixed_negatives=6,
    logq_correction=True,
)

B, BP = 12, 6


def _embs(key):
    ks = jax.random.split(key, 3)
    u = jax.random.normal(ks[0], (B, CFG.item_id_embedding_dim))
    i = jax.random.normal(ks[1], (B, CFG.item_id_embedding_dim))
    n = jax.random.normal(ks[2], (BP, CFG.item_id_embedding_dim))
    return u, i, n


def _oracle_ce(u, i, n, ilq, nlq):
    full = np.concatenate([np.asarray(u) @ np.asarray(i).T, np.asarray(u) @ np.asarray(n).T], 1)
    corr = np.concatenate([np.asarray(ilq), np.asarray(nlq)])
    full = full - corr[None, :]
    m = full.max(axis=1, keepdims=True)
    lse = (m[:, 0] + np.log(np.exp(full - m).sum(axis=1)))
    return lse - np.diagonal(full[:, :B])


def test_extended_ce_matches_oracle_all_routes():
    u, i, n = _embs(jax.random.key(0))
    ilq = jnp.log(jax.random.uniform(jax.random.key(3), (B,), minval=0.01, maxval=0.2))
    nlq = jnp.full((BP,), -jnp.log(64.0))
    want = _oracle_ce(u, i, n, ilq, nlq)

    plain = two_tower._extended_ce(CFG, u, i, None, n, ilq, nlq)
    np.testing.assert_allclose(np.asarray(plain), want, rtol=1e-5)

    scores = jnp.dot(u, i.T)
    via_scores = two_tower._extended_ce(CFG, u, i, scores, n, ilq, nlq)
    np.testing.assert_allclose(np.asarray(via_scores), want, rtol=1e-5)

    fused_cfg = dataclasses.replace(CFG, fused_loss=True)
    fused = two_tower._extended_ce(fused_cfg, u, i, None, n, ilq, nlq)
    np.testing.assert_allclose(np.asarray(fused), want, rtol=1e-4)

    # logq-only (no mixed negatives) and negatives-only (no correction)
    lq_only = two_tower._extended_ce(CFG, u, i, None, None, ilq, None)
    want_lq = _oracle_ce(u, i, jnp.zeros((0, u.shape[1])), ilq, jnp.zeros((0,)))
    np.testing.assert_allclose(np.asarray(lq_only), want_lq, rtol=1e-5)
    neg_only = two_tower._extended_ce(CFG, u, i, None, n, None, None)
    want_neg = _oracle_ce(u, i, n, jnp.zeros((B,)), jnp.zeros((BP,)))
    np.testing.assert_allclose(np.asarray(neg_only), want_neg, rtol=1e-5)


def test_extended_ce_routes_agree_under_bf16():
    """Corrections apply in the compute dtype on every route (the fused
    augmented column necessarily rounds to bf16; the plain/scores routes
    quantize to match), so the routes agree under bf16 too — not just f32."""
    u, i, n = (x.astype(jnp.bfloat16) for x in _embs(jax.random.key(2)))
    ilq = jnp.log(jax.random.uniform(jax.random.key(5), (B,), minval=0.01, maxval=0.2))
    nlq = jnp.full((BP,), -jnp.log(64.0))
    plain = two_tower._extended_ce(CFG, u, i, None, n, ilq, nlq)
    fused_cfg = dataclasses.replace(CFG, fused_loss=True)
    fused = two_tower._extended_ce(fused_cfg, u, i, None, n, ilq, nlq)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(fused), rtol=1e-4, atol=1e-4
    )
    scores = jnp.dot(u, i.T, preferred_element_type=jnp.float32)
    via_scores = two_tower._extended_ce(CFG, u, i, scores, n, ilq, nlq)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(via_scores), rtol=1e-4, atol=1e-4
    )


def test_extended_ce_gradients_fused_vs_plain():
    u, i, n = _embs(jax.random.key(1))
    ilq = jnp.log(jax.random.uniform(jax.random.key(4), (B,), minval=0.05, maxval=0.3))
    nlq = jnp.full((BP,), -jnp.log(64.0))

    def mean_ce(cfg):
        return lambda uu, ii, nn: jnp.mean(
            two_tower._extended_ce(cfg, uu, ii, None, nn, ilq, nlq)
        )

    fused_cfg = dataclasses.replace(CFG, fused_loss=True)
    g_plain = jax.grad(mean_ce(CFG), argnums=(0, 1, 2))(u, i, n)
    g_fused = jax.grad(mean_ce(fused_cfg), argnums=(0, 1, 2))(u, i, n)
    for gp, gf in zip(g_plain, g_fused):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gf), atol=1e-5)


def test_extend_batch_fields_and_noop():
    data = make_synthetic_data(
        DataConfig(num_samples=64, num_items=32, num_users=16, popularity_skew=1.0)
    )
    batch = gather_batch(data, jnp.arange(8))
    out = extend_batch(CFG, data, batch, jax.random.key(0))
    assert out.neg_item_id.shape == (6,) and out.neg_item_features.shape == (6, 8)
    assert out.item_logq.shape == (8,) and out.neg_logq.shape == (6,)
    # every candidate carries the MIXED proposal log-prob (Yang et al.):
    # log(B·p(j) + B'/C) with the constant 1/(B+B') dropped (softmax-invariant)
    mix = np.logaddexp(
        np.log(8.0) + np.asarray(data.catalog_logq), np.log(6.0 / 32.0)
    )
    np.testing.assert_allclose(
        np.asarray(out.item_logq), mix[np.asarray(batch.item_id)], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.neg_logq), mix[np.asarray(out.neg_item_id)], rtol=1e-6
    )
    # frequent items carry a LARGER correction than tail items
    order = np.argsort(-np.asarray(data.catalog_logq))
    assert mix[order[0]] > mix[order[-1]]
    # stacked [K, B] dispatch batches get per-row negatives
    stacked = gather_batch(data, jnp.arange(16).reshape(2, 8))
    out2 = extend_batch(CFG, data, stacked, jax.random.key(1))
    assert out2.neg_item_id.shape == (2, 6)
    assert out2.item_logq.shape == (2, 8)
    assert not np.array_equal(np.asarray(out2.neg_item_id[0]), np.asarray(out2.neg_item_id[1]))
    # both features off -> the batch passes through untouched
    off = dataclasses.replace(CFG, mixed_negatives=0, logq_correction=False)
    assert extend_batch(off, data, batch, jax.random.key(0)) is batch


def test_training_step_and_lazy_parity():
    """One dense step and one lazy-Adam step from the same state sample the
    same negatives (same rng split) and must agree on the loss."""
    data = make_synthetic_data(
        DataConfig(num_samples=64, num_items=64, num_users=16, popularity_skew=0.5)
    )
    tcfg = TrainConfig(batch_size=16, learning_rate=1e-3)
    idx = jnp.arange(16)

    state = create_train_state(jax.random.key(0), CFG, tcfg)
    s1, m1 = make_train_step(CFG, tcfg)(state, data, idx)
    assert np.isfinite(float(m1["loss"]))

    lazy_cfg = dataclasses.replace(tcfg, lazy_table_adam=True)
    lstate = create_train_state(jax.random.key(0), CFG, lazy_cfg)
    s2, m2 = make_train_step(CFG, lazy_cfg)(lstate, data, idx)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["item_id_table"]),
        np.asarray(s2.params["item_id_table"]),
        atol=1e-6,
    )


def test_parity_path_untouched():
    """With both features off, the step computes the exact same loss and rng
    trajectory as before the feature existed (no hidden rng split)."""
    data = make_synthetic_data(DataConfig(num_samples=32, num_items=32, num_users=8))
    off = dataclasses.replace(CFG, mixed_negatives=0, logq_correction=False)
    tcfg = TrainConfig(batch_size=8)
    state = create_train_state(jax.random.key(0), off, tcfg)
    rng_before = np.asarray(jax.random.key_data(state.rng)).copy()  # pre-donation
    s1, _ = make_train_step(off, tcfg)(state, data, jnp.arange(8))
    assert np.array_equal(np.asarray(jax.random.key_data(s1.rng)), rng_before)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 (virtual) devices")
def test_mesh_paths_support_extension():
    """Both mesh steps (explicit shard_map and GSPMD) train with the extended
    pool and match the single-chip loss on the same batch."""
    from two_tower_models_tpu.config import MeshConfig
    from two_tower_models_tpu.parallel.mesh import make_mesh
    from two_tower_models_tpu.parallel.sharding import shard_state
    from two_tower_models_tpu.parallel.train_step import (
        make_gspmd_train_step,
        make_sharded_train_step,
    )

    mesh_cfg = MeshConfig(data=4, model=2)
    mesh = make_mesh(mesh_cfg)
    tcfg = TrainConfig(batch_size=16)

    data = make_synthetic_data(
        DataConfig(num_samples=64, num_items=32, num_users=16)
    )
    batch = extend_batch(
        CFG, data, gather_batch(data, jnp.arange(16)), jax.random.key(5)
    )
    want, _ = two_tower.train_loss(
        create_train_state(jax.random.key(0), CFG, tcfg, pack=False).params,
        CFG, batch,
    )

    for maker in (make_sharded_train_step, make_gspmd_train_step):
        state = create_train_state(jax.random.key(0), CFG, tcfg, pack=False)
        state = shard_state(state, mesh)
        step = maker(CFG, tcfg, mesh, mesh_cfg)
        _, metrics = step(state, batch)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(want), rtol=1e-5,
            err_msg=str(maker),
        )

    # fused route: the augmented-column LSE on the mesh matches too
    fused_cfg = dataclasses.replace(CFG, fused_loss=True)
    fstate = create_train_state(jax.random.key(0), fused_cfg, tcfg, pack=False)
    fstate = shard_state(fstate, mesh)
    fstep = make_gspmd_train_step(fused_cfg, tcfg, mesh, mesh_cfg)
    _, fmetrics = fstep(fstate, batch)
    np.testing.assert_allclose(float(fmetrics["loss"]), float(want), rtol=1e-4)
