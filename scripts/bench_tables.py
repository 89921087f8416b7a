"""Large-table train-step benchmark (the BASELINE.md "large-table scaling"
table): flagship model with production-size id tables.

  python scripts/bench_tables.py --rows 4194304 --k 1
  python scripts/bench_tables.py --rows 4194304 --k 1 --no-pack   # r2 baseline
  python scripts/bench_tables.py --rows 4194304 --k 1 --lazy      # lazy Adam

Timing follows bench.py: steps chain through the donated state, closed by a
scalar device_get; min over repeats (tunnel noise only inflates).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=4194304, help="rows per id table")
    p.add_argument("--k", type=int, default=1, help="steps per dispatch")
    p.add_argument("--steps", type=int, default=15, help="dispatches per repeat")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--lazy", action="store_true", help="lazy table Adam")
    p.add_argument("--no-pack", action="store_true", help="plain [V, D] storage")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

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

    cfg = ModelConfig(
        user_id_hash_size=args.rows,
        user_id_embedding_dim=64,
        item_id_hash_size=args.rows,
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
        batch_size=args.batch_size,
        learning_rate=1e-3,
        steps_per_dispatch=args.k,
        lazy_table_adam=args.lazy,
        pack_tables=not args.no_pack,
    )

    state = create_train_state(jax.random.key(0), cfg, tcfg)
    batch = _make_batch(cfg, args.batch_size)
    data = SyntheticRecData(
        user_ids=batch.user_id,
        user_features=batch.user_features,
        user_history=batch.user_history,
        item_ids=batch.item_id,
        item_features=batch.item_features,
        positions=batch.position,
        labels=batch.labels,
        catalog_ids=jnp.arange(4),
        catalog_features=jnp.zeros((4, cfg.item_features_size)),
    )
    idx = jnp.arange(args.batch_size)
    if args.k > 1:
        idx = jnp.tile(idx[None], (args.k, 1))
    step = make_train_step(cfg, tcfg)

    t0 = time.perf_counter()
    for _ in range(args.warmup):
        state, metrics = step(state, data, idx)
    float(jax.device_get(metrics["loss"]))
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, data, idx)
        float(jax.device_get(metrics["loss"]))
        times.append(time.perf_counter() - t0)
    step_s = min(times) / (args.steps * args.k)

    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    packed = state.params["item_id_table"].shape[-1] != cfg.item_id_embedding_dim
    print(
        json.dumps(
            {
                "rows_per_table": args.rows,
                "params": n_params,
                "packed": bool(packed),
                "lazy": bool(args.lazy),
                "k_dispatch": args.k,
                "step_ms": round(step_s * 1e3, 2),
                "examples_per_sec": round(args.batch_size / step_s),
                "warmup_s": round(compile_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
