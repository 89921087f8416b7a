"""Raw-key ingest demo: string/uint64 entity keys through the C++ hasher
into training batches AND serving queries.

The reference assumes someone already hashed entity keys to table slots
(SURVEY: *_hash_size ctor params, no producer).  This demo is that producer:
an event log of (user key, item key, history keys) strings feeds training
through ``training.ingest`` (host-side released-GIL C++ batch hash, numpy
fallback), and the SAME key->slot map serves raw-key queries.

    python examples/raw_key_ingest.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from two_tower_models_tpu.config import TrainConfig, preset
from two_tower_models_tpu.models.two_tower import Batch, train_loss
from two_tower_models_tpu.native import native_available
from two_tower_models_tpu.serving import RetrievalEngine
from two_tower_models_tpu.training.ingest import (
    hash_item_keys,
    ingest_example_keys,
)
from two_tower_models_tpu.training.state import create_train_state
from two_tower_models_tpu.training.step import make_train_step
from two_tower_models_tpu.training.data import SyntheticRecData

N_USERS, N_ITEMS, H, B, STEPS = 256, 200, 8, 64, 60


def main():
    print(f"native C++ hasher available: {native_available()}")
    model = preset(
        "two_tower_with_user_history_encoder",
        history_len=H,
        user_id_hash_size=512,
        item_id_hash_size=512,
        user_id_embedding_dim=32,
        item_id_embedding_dim=32,
        num_items=50,
    )

    # --- a raw event log: STRING keys, as a real feed would carry ---------
    rng = np.random.default_rng(0)
    user_names = np.array([f"user:{i:04d}@example.com" for i in range(N_USERS)])
    item_names = np.array([f"sku-{i:05d}" for i in range(N_ITEMS)])
    n_events = 4096
    ev_user = rng.integers(0, N_USERS, n_events)
    # 8-group affinity so recall is measurable (mirrors the synthetic data)
    ev_item = (rng.integers(0, N_ITEMS // 8, n_events) * 8 + ev_user % 8) % N_ITEMS
    ev_hist = (rng.integers(0, N_ITEMS // 8, (n_events, H)) * 8 + ev_user[:, None] % 8) % N_ITEMS

    # --- ingest: raw keys -> table slots (host-side C++ batch hash) -------
    uid, iid, hist = ingest_example_keys(
        model, user_names[ev_user], item_names[ev_item], item_names[ev_hist]
    )
    feats = rng.standard_normal((n_events, model.user_features_size)).astype(np.float32)
    ifeats = rng.standard_normal((n_events, model.item_features_size)).astype(np.float32)
    labels = np.ones((n_events, model.num_tasks), np.float32)
    pos = rng.integers(0, 10, n_events)

    data = SyntheticRecData(
        user_ids=jnp.asarray(uid), user_features=jnp.asarray(feats),
        user_history=jnp.asarray(hist), item_ids=jnp.asarray(iid),
        item_features=jnp.asarray(ifeats), positions=jnp.asarray(pos, jnp.int32),
        labels=jnp.asarray(labels),
        catalog_ids=jnp.asarray(hash_item_keys(item_names, model)),
        catalog_features=jnp.asarray(
            rng.standard_normal((N_ITEMS, model.item_features_size)).astype(np.float32)
        ),
    )

    # --- train on the ingested slots --------------------------------------
    tcfg = TrainConfig(batch_size=B, learning_rate=3e-3)
    state = create_train_state(jax.random.key(0), model, tcfg)
    step = make_train_step(model, tcfg)
    first = last = None
    for s in range(STEPS):
        idx = jax.random.randint(jax.random.key(s), (B,), 0, n_events)
        state, metrics = step(state, data, idx)
        if s == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    print(f"trained {STEPS} steps on ingested raw keys: loss {first:.3f} -> {last:.3f}")

    # --- serve by RAW key: same hash, same slots --------------------------
    engine = RetrievalEngine.from_params(
        state.params, model, data.catalog_ids, data.catalog_features
    )
    q_users = user_names[ev_user[:16]]
    q_hist = item_names[ev_hist[:16]]
    top = engine.query_raw(q_users, data.user_features[:16], q_hist)
    print(f"served 16 raw-key queries -> shape {tuple(top.shape)}")

    # consistency: raw-key serving == serving with the ingested slots
    top_ids = engine.query(data.user_ids[:16], data.user_features[:16], data.user_history[:16])
    assert np.array_equal(np.asarray(top), np.asarray(top_ids)), "raw-key path diverged"
    print("raw-key serving matches pre-hashed serving: OK")


if __name__ == "__main__":
    main()
