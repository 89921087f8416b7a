"""Experiment: packed storage + Pallas scatter-add at BENCH-scale tables.

The flagship (65k-row tables) spends ~1.7 ms/step in XLA's O(V) scatter-add
(xprof, BASELINE.md).  The Pallas kernel was gated to >= 2^18 rows because
below that XLA "wins outright" — but that was measured with UNPACKED [V, 64]
storage, where the kernel's T(8,128) output layout forced relayouts.  With
128-lane-packed storage (layout-identical to Mosaic tiling) the kernel's
cost model is O(updates + table stream) ~ 0.4 ms at bench scale.  Re-test
the window: (a) unpacked + XLA scatter (current default), (b) packed + XLA
scatter, (c) packed + Pallas scatter.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(name, rows, batch, pack, kernel_min_rows, steps, repeats):
    import jax

    import two_tower_models_tpu.nn.packed_table as PT
    from __graft_entry__ import _make_batch
    from two_tower_models_tpu.config import (
        Debias,
        HistoryEncoderConfig,
        ModelConfig,
        TrainConfig,
    )
    from two_tower_models_tpu.training.data import SyntheticRecData
    from two_tower_models_tpu.training.state import create_train_state
    from two_tower_models_tpu.training.step import make_train_step
    import jax.numpy as jnp

    PT._SCATTER_KERNEL_MIN_ROWS = kernel_min_rows

    cfg = ModelConfig(
        user_id_hash_size=rows,
        user_id_embedding_dim=64,
        item_id_hash_size=rows,
        item_id_embedding_dim=64,
        user_features_size=16,
        item_features_size=16,
        user_value_weights=(1.0, 0.5, 0.25),
        history_len=32,
        history_encoder=HistoryEncoderConfig(fused_encoder=True),
        debias=Debias.BOTH,
        compute_dtype="bfloat16",
        fused_loss=True,
    )
    tcfg = TrainConfig(
        batch_size=batch,
        learning_rate=1e-3,
        pack_tables=pack,
        pack_tables_min_rows=0 if pack else (1 << 22),
    )
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    b = _make_batch(cfg, batch)
    data = SyntheticRecData(
        user_ids=b.user_id,
        user_features=b.user_features,
        user_history=b.user_history,
        item_ids=b.item_id,
        item_features=b.item_features,
        positions=b.position,
        labels=b.labels,
        catalog_ids=jnp.arange(4),
        catalog_features=jnp.zeros((4, cfg.item_features_size)),
    )
    idx = jnp.arange(batch)
    step = make_train_step(cfg, tcfg)

    for _ in range(3):
        state, metrics = step(state, data, idx)
    float(jax.device_get(metrics["loss"]))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, data, idx)
        float(jax.device_get(metrics["loss"]))
        times.append(time.perf_counter() - t0)
    step_s = min(times) / steps
    packed = state.params["item_id_table"].shape[-1] != 64
    print(
        json.dumps(
            {
                "variant": name,
                "packed": bool(packed),
                "scatter_kernel_min_rows": kernel_min_rows,
                "step_ms": round(step_s * 1e3, 2),
                "examples_per_sec": round(batch / step_s),
                "loss": round(float(jax.device_get(metrics["loss"])), 4),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=65536)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--steps", type=int, default=15)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--variants", default="base,packed_xla,packed_kernel")
    p.add_argument("--cpu", action="store_true", help="force CPU (mechanics sanity)")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for v in args.variants.split(","):
        if v == "base":
            run_variant(v, args.rows, args.batch, False, 1 << 18, args.steps, args.repeats)
        elif v == "packed_xla":
            run_variant(v, args.rows, args.batch, True, 1 << 30, args.steps, args.repeats)
        elif v == "packed_kernel":
            run_variant(v, args.rows, args.batch, True, 0, args.steps, args.repeats)
