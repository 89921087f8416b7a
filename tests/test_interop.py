"""Reference-checkpoint interop: round-trip and error-path tests.

The torch-semantics cross-check (import a torch-initialized reference's
state_dict and match its train loss) lives in
``scripts/identical_init_parity.py --import_check`` — it needs the reference
on PYTHONPATH.  These tests cover the mapping itself hermetically: export ->
import reproduces every mappable leaf bit-exactly on every variant family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.config import (
    Debias,
    HistoryEncoderConfig,
    LightRankerConfig,
    ModelConfig,
)
from two_tower_models_tpu.interop import (
    params_from_reference_state_dict,
    reference_state_dict_from_params,
)
from two_tower_models_tpu.models.two_tower import init_params

BASE = dict(
    user_id_hash_size=64, user_id_embedding_dim=12,
    item_id_hash_size=96, item_id_embedding_dim=8,
    user_features_size=5, item_features_size=6,
    user_value_weights=(1.0, 0.5), num_items=4, history_len=6,
)


def _configs():
    return {
        "base": ModelConfig(**BASE),
        "history": ModelConfig(**BASE, history_encoder=HistoryEncoderConfig()),
        "debias_both": ModelConfig(
            **BASE, history_encoder=HistoryEncoderConfig(), debias=Debias.BOTH
        ),
        "debias_user": ModelConfig(
            **BASE, history_encoder=HistoryEncoderConfig(), debias=Debias.USER
        ),
        "light_ranker": ModelConfig(
            **BASE, history_encoder=HistoryEncoderConfig(), debias=Debias.BOTH,
            light_ranker=LightRankerConfig(),
        ),
        "kd": ModelConfig(
            **BASE, history_encoder=HistoryEncoderConfig(), debias=Debias.BOTH,
            light_ranker=LightRankerConfig(), kd=True,
        ),
        "reward": ModelConfig(
            **BASE, history_encoder=HistoryEncoderConfig(), debias=Debias.BOTH,
            reward_model=True,
        ),
    }


@pytest.mark.parametrize("name", list(_configs()))
def test_roundtrip_bit_exact(name):
    cfg = _configs()[name]
    params = init_params(jax.random.key(3), cfg)
    sd = reference_state_dict_from_params(params, cfg)
    # import onto a DIFFERENT fresh init: every mappable leaf must be
    # overwritten to the exported values
    back = params_from_reference_state_dict(sd, cfg, key=jax.random.key(3))
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    for path, leaf in flat_a:
        got = flat_b[path]
        assert got.shape == leaf.shape, path
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(leaf, np.float32),
            err_msg=str(path),
        )


def test_unmapped_leaves_keep_fresh_init():
    cfg = _configs()["reward"]
    params = init_params(jax.random.key(3), cfg)
    sd = reference_state_dict_from_params(params, cfg)
    # a different key for the fresh init: proxy_ranker has no reference
    # counterpart, so it must come from THIS init, not the exported params
    back = params_from_reference_state_dict(sd, cfg, key=jax.random.key(9))
    fresh = init_params(jax.random.key(9), cfg)
    np.testing.assert_array_equal(
        np.asarray(back["proxy_ranker"]["w"], np.float32),
        np.asarray(fresh["proxy_ranker"]["w"], np.float32),
    )
    assert not np.array_equal(
        np.asarray(back["proxy_ranker"]["w"], np.float32),
        np.asarray(params["proxy_ranker"]["w"], np.float32),
    )


def test_kd_imports_hard_columns_only():
    cfg = _configs()["kd"]
    nokd = _configs()["light_ranker"]
    ref_params = init_params(jax.random.key(5), nokd)  # reference-shaped head
    sd = reference_state_dict_from_params(ref_params, nokd)
    back = params_from_reference_state_dict(sd, cfg, key=jax.random.key(7))
    t = cfg.num_tasks
    head = np.asarray(back["light_ranker_head"]["w"], np.float32)
    np.testing.assert_array_equal(
        head[:, :t], np.asarray(ref_params["light_ranker_head"]["w"], np.float32)
    )
    fresh = init_params(jax.random.key(7), cfg)
    np.testing.assert_array_equal(
        head[:, t:], np.asarray(fresh["light_ranker_head"]["w"], np.float32)[:, t:]
    )


def test_strict_errors():
    cfg = _configs()["base"]
    params = init_params(jax.random.key(0), cfg)
    sd = reference_state_dict_from_params(params, cfg)

    extra = dict(sd)
    extra["position_bias_net_user_value.weight"] = np.zeros((100, 1), np.float32)
    with pytest.raises(KeyError, match="no counterpart"):
        params_from_reference_state_dict(extra, cfg)
    # non-strict: ignored
    params_from_reference_state_dict(extra, cfg, strict=False)

    missing = dict(sd)
    del missing["user_tower_arch.weight"]
    with pytest.raises(KeyError, match="missing"):
        params_from_reference_state_dict(missing, cfg)
    # non-strict: absent entry keeps the fresh init
    back = params_from_reference_state_dict(
        missing, cfg, key=jax.random.key(11), strict=False
    )
    fresh = init_params(jax.random.key(11), cfg)
    np.testing.assert_array_equal(
        np.asarray(back["user_tower_head"]["w"], np.float32),
        np.asarray(fresh["user_tower_head"]["w"], np.float32),
    )

    bad = dict(sd)
    bad["user_tower_arch.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="expects"):
        params_from_reference_state_dict(bad, cfg)


def test_accepts_torch_tensors():
    torch = pytest.importorskip("torch")
    cfg = _configs()["base"]
    params = init_params(jax.random.key(1), cfg)
    sd = {
        k: torch.from_numpy(v)
        for k, v in reference_state_dict_from_params(params, cfg).items()
    }
    back = params_from_reference_state_dict(sd, cfg, key=jax.random.key(1))
    np.testing.assert_array_equal(
        np.asarray(back["user_id_table"], np.float32),
        np.asarray(params["user_id_table"], np.float32),
    )


def test_imported_params_run():
    """Imported pytree trains: one loss eval on the deepest variant."""
    from two_tower_models_tpu.models import two_tower

    cfg = _configs()["light_ranker"]
    params = init_params(jax.random.key(2), cfg)
    sd = reference_state_dict_from_params(params, cfg)
    back = params_from_reference_state_dict(sd, cfg)
    rng = np.random.default_rng(0)
    B = 16
    batch = two_tower.Batch(
        user_id=jnp.asarray(rng.integers(0, 64, B)),
        user_features=jnp.asarray(rng.normal(size=(B, 5)).astype(np.float32)),
        user_history=jnp.asarray(rng.integers(0, 96, (B, 6))),
        item_id=jnp.asarray(rng.integers(0, 96, B)),
        item_features=jnp.asarray(rng.normal(size=(B, 6)).astype(np.float32)),
        position=jnp.asarray(rng.integers(0, 100, B)),
        labels=jnp.asarray(rng.integers(0, 2, (B, 2)).astype(np.float32)),
    )
    loss, _ = two_tower.train_loss(back, cfg, batch)
    assert np.isfinite(float(loss))
