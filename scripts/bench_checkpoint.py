"""Checkpoint-save stall measurement (VERDICT r2 #7).

At production table sizes a periodic save must not stall the step loop.
Measures, at the 134M-param config (2x 1M-row tables, D=64):

  * async save: blocking portion of ``save()`` (device->host snapshot) vs
    the end-to-end write (``wait_until_finished``);
  * sync save: the full blocking cost the loop would otherwise eat.

  python scripts/bench_checkpoint.py [--rows 1048576] [--dir /tmp/ckpt_bench]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1048576)
    p.add_argument("--dir", default="/tmp/ckpt_bench")
    args = p.parse_args(argv)

    import jax

    from two_tower_models_tpu.config import (
        Debias,
        HistoryEncoderConfig,
        ModelConfig,
        TrainConfig,
    )
    from two_tower_models_tpu.training.checkpoint import CheckpointManager
    from two_tower_models_tpu.training.state import create_train_state

    cfg = ModelConfig(
        user_id_hash_size=args.rows,
        user_id_embedding_dim=64,
        item_id_hash_size=args.rows,
        item_id_embedding_dim=64,
        user_features_size=16,
        item_features_size=16,
        user_value_weights=(1.0, 0.5, 0.25),
        history_len=32,
        history_encoder=HistoryEncoderConfig(),
        debias=Debias.BOTH,
        compute_dtype="bfloat16",
    )
    state = create_train_state(jax.random.key(0), cfg, TrainConfig())
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    jax.block_until_ready(state.params)

    results = {"params": n_params, "backend": jax.default_backend()}
    for mode, async_save in (("async", True), ("sync", False)):
        d = os.path.join(args.dir, mode)
        shutil.rmtree(d, ignore_errors=True)
        mgr = CheckpointManager(d, async_save=async_save)
        t0 = time.perf_counter()
        mgr.save(state, force=True)
        t_block = time.perf_counter() - t0
        mgr.wait_until_finished()
        t_total = time.perf_counter() - t0
        mgr.close()
        results[f"{mode}_save_block_s"] = round(t_block, 3)
        results[f"{mode}_save_total_s"] = round(t_total, 3)
        shutil.rmtree(d, ignore_errors=True)
    results["stall_reduction"] = round(
        results["sync_save_block_s"] / max(results["async_save_block_s"], 1e-9), 1
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
