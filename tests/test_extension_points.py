"""The get_user_embedding extension seam (reference hook
two_tower_base_retrieval.py:112-127): a registered custom user-ID arm plugs
into init/apply/grad without touching model code."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import make_batch
from two_tower_models_tpu.config import ModelConfig
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.models.two_tower import register_user_embedding_arm
from two_tower_models_tpu.nn.layers import linear_apply, linear_init

CFG = ModelConfig(
    user_id_hash_size=64,
    user_id_embedding_dim=16,
    item_id_hash_size=64,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    feature_hidden_dim=32,
)


def _register_mlp_of_table_arm():
    """A custom memorization arm: table lookup -> extra Linear (stands in
    for an external user-representation module)."""

    def init(key, cfg):
        return {
            "proj": linear_init(
                key, cfg.user_id_embedding_dim, cfg.user_id_embedding_dim
            )
        }

    def apply(params, cfg, user_id):
        base = jnp.take(params["user_id_table"], user_id, axis=0)
        return linear_apply(params["user_embedding_ext"]["proj"], base)

    register_user_embedding_arm("mlp_of_table", apply, init)


def test_custom_arm_init_apply_and_grads():
    _register_mlp_of_table_arm()
    cfg = dataclasses.replace(CFG, user_embedding_arm="mlp_of_table")
    params = two_tower.init_params(jax.random.key(0), cfg)
    assert "user_embedding_ext" in params

    batch = make_batch(jax.random.key(1), cfg, 16)
    loss, _ = two_tower.train_loss(params, cfg, batch)
    assert np.isfinite(float(loss))

    grads = jax.grad(lambda p: two_tower.train_loss(p, cfg, batch)[0])(params)
    g = grads["user_embedding_ext"]["proj"]["w"]
    assert float(jnp.max(jnp.abs(g))) > 0  # the custom arm actually trains

    # differs from the default arm's loss (the seam is live, not bypassed)
    params_default = two_tower.init_params(jax.random.key(0), CFG)
    loss_default, _ = two_tower.train_loss(params_default, CFG, batch)
    assert abs(float(loss) - float(loss_default)) > 1e-6


def test_default_arm_unchanged():
    params = two_tower.init_params(jax.random.key(0), CFG)
    assert "user_embedding_ext" not in params
    batch = make_batch(jax.random.key(1), CFG, 8)
    loss, _ = two_tower.train_loss(params, CFG, batch)
    assert np.isfinite(float(loss))
