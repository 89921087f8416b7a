"""Train-step throughput for every model-zoo preset on the live backend.

bench.py measures the flagship (history + combined debias) config; this
sweep covers the whole zoo at a common scale so regressions in any family's
step are visible.  Chained-dependency timing closed by device_get
(BASELINE.md methodology).

Run:  python scripts/bench_presets.py [--batch-size 4096] [--steps 20]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()
    B = args.batch_size

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from two_tower_models_tpu.config import PRESET_NAMES, TrainConfig, preset
    from two_tower_models_tpu.training.data import SyntheticRecData
    from two_tower_models_tpu.training.state import create_train_state
    from two_tower_models_tpu.training.step import make_train_step

    common = dict(
        user_id_hash_size=65536,
        user_id_embedding_dim=64,
        item_id_hash_size=65536,
        item_id_embedding_dim=64,
        user_features_size=16,
        item_features_size=16,
        user_value_weights=(1.0, 0.5, 0.25),
        history_len=32,
        compute_dtype="bfloat16",
        fused_loss=True,
    )

    results = {}
    for name in PRESET_NAMES:
        cfg = preset(name, **common)
        if cfg.history_encoder is not None:
            cfg = dataclasses.replace(
                cfg,
                history_encoder=dataclasses.replace(
                    cfg.history_encoder, fused_encoder=True
                ),
            )
        tcfg = TrainConfig(batch_size=B, learning_rate=1e-3)
        state = create_train_state(jax.random.key(0), cfg, tcfg)
        batch = _make_batch(cfg, B)
        if cfg.kd:
            batch = batch._replace(
                labels=jnp.concatenate([batch.labels, batch.labels * 0.5], axis=1)
            )
        data = SyntheticRecData(
            user_ids=batch.user_id, user_features=batch.user_features,
            user_history=batch.user_history, item_ids=batch.item_id,
            item_features=batch.item_features, positions=batch.position,
            labels=batch.labels, catalog_ids=jnp.arange(4),
            catalog_features=jnp.zeros((4, cfg.item_features_size)),
        )
        idx = jnp.arange(B)
        step = make_train_step(cfg, tcfg)
        for _ in range(args.warmup):
            state, m = step(state, data, idx)
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, data, idx)
        jax.device_get(m["loss"])
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        results[name] = {
            "step_ms": round(ms, 3),
            "examples_per_sec": round(B / ms * 1e3),
        }
        print(json.dumps({name: results[name]}), flush=True)

    print(json.dumps({"backend": jax.default_backend(), "batch_size": B,
                      "results": results}))


if __name__ == "__main__":
    main()
