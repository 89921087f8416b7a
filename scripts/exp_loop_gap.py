"""Decompose the training-LOOP vs bare-step throughput gap at the TPU anchor.

bench.py measures the bare train step at ~6.7 ms (613k ex/s, B=4096) but the
real training loop at the TPU-scale anchor sustains only ~119k ex/s (~29 ms/
step inside the K=8 scan, r5 loop A/B) — and the fused single-dispatch loop
moved it only +2% vs the eager loop, so the overhead is INSIDE the jitted
program, not host-side dispatch.  Candidate deltas vs bench:

  * bench gathers its batch from BATCH-SIZED arrays; the loop gathers from
    the 2.1M-row dataset (gather lowering may not be O(batch));
  * bench runs K=1 chained dispatches; the loop runs a K-step lax.scan;
  * the anchor preset (plain history encoder) vs bench's (history+debias) —
    bench's is strictly heavier, so this can only understate the gap;
  * the fused dispatch adds perm dynamic-slice + loss accumulation.

Arms (all B=4096, anchor model, chained-dependency timing closed by a
scalar device_get — BASELINE.md methodology):

  step_small_k1   bare step, batch-sized data      (bench equivalent)
  step_big_k1     bare step, 2.1M-row data         (isolates gather size)
  step_small_k8   K=8 scan, batch-sized data       (isolates the scan)
  step_big_k8     K=8 scan, 2.1M-row data          (the loop's actual body)
  disp_big_k8     the loop's fused dispatch        (adds slice + loss acc)

Run on the TPU:  python scripts/exp_loop_gap.py
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
    p.add_argument("--steps", type=int, default=10, help="timed dispatches per arm")
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--smoke", action="store_true", help="tiny shapes on CPU")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from two_tower_models_tpu.config import DataConfig, TrainConfig, preset
    from two_tower_models_tpu.training.data import make_synthetic_data
    from two_tower_models_tpu.training.state import create_train_state
    from two_tower_models_tpu.training.step import make_train_step

    if args.smoke:
        B, N, tables, dim, H = 64, 4096, 1024, 16, 8
    else:
        B, N, tables, dim, H = 4096, 2_097_152, 65536, 64, 32

    from two_tower_models_tpu.config import resolve_kernel_flags

    model = resolve_kernel_flags(preset(
        "two_tower_with_user_history_encoder",
        user_id_hash_size=tables, item_id_hash_size=tables,
        user_id_embedding_dim=dim, item_id_embedding_dim=dim,
        user_features_size=16, item_features_size=16,
        history_len=H, compute_dtype="bfloat16",
    ))
    # NOTE the round-5 pre-fix run of this script (kernel flags plainly
    # False) measured step_small_k1 = 31.2 ms vs bench's 6.6 ms at the same
    # shape — the loop had been running the dense XLA path; that finding
    # motivated the AUTO kernel flags this script now resolves.
    dcfg = DataConfig(
        num_samples=N, num_users=tables, num_items=tables,
        feature_dim=16, history_len=H, num_tasks=model.num_tasks,
        structured=True, seed=0,
    )
    data_big = make_synthetic_data(dcfg, structured=True)
    import dataclasses

    data_small = dataclasses.replace(
        dcfg, num_samples=B, seed=1
    )
    data_small = make_synthetic_data(data_small, structured=True)

    def timed(fn, state0, *rest):
        st = fn(state0, *rest)  # warm/compile; fn returns new state + live scalar
        jax.device_get(st[1])
        best = float("inf")
        for _ in range(args.repeats):
            state = st[0]
            t0 = time.perf_counter()
            for _ in range(args.steps):
                state, live = fn(state, *rest)
            jax.device_get(live)
            best = min(best, (time.perf_counter() - t0) / args.steps)
            st = (state, live)
        return best

    def emit(name, seconds, k):
        per_step = seconds / k
        print(json.dumps({
            "arm": name,
            "dispatch_ms": round(seconds * 1e3, 3),
            "step_ms": round(per_step * 1e3, 3),
            "examples_per_sec": round(B / per_step),
        }), flush=True)

    results = {}
    for name, k, data in (
        ("step_small_k1", 1, data_small),
        ("step_big_k1", 1, data_big),
        ("step_small_k8", 8, data_small),
        ("step_big_k8", 8, data_big),
    ):
        tcfg = TrainConfig(batch_size=B, learning_rate=1e-3, steps_per_dispatch=k)
        step = make_train_step(model, tcfg)
        state = create_train_state(jax.random.key(0), model, tcfg)
        n = data.user_ids.shape[0]
        idx = jnp.arange(B) % n
        if k > 1:
            idx = (jnp.arange(k * B).reshape(k, B)) % n

        def fn(state, data=data, idx=idx, step=step):
            state, metrics = step(state, data, idx)
            return state, metrics["loss"]

        results[name] = timed(fn, state)
        emit(name, results[name], k)

    # the loop's fused dispatch: perm slice + K-step scan + loss accumulation
    k = 8
    tcfg = TrainConfig(batch_size=B, learning_rate=1e-3, steps_per_dispatch=k)
    step = make_train_step(model, tcfg)
    state = create_train_state(jax.random.key(0), model, tcfg)
    perm = jax.random.permutation(jax.random.key(2), data_big.user_ids.shape[0])

    @jax.jit
    def disp(state, loss_sum, d, perm, start):
        idx = jax.lax.dynamic_slice_in_dim(perm, start, k * B).reshape(k, B)
        state, metrics = step.__wrapped__(state, d, idx) if hasattr(
            step, "__wrapped__"
        ) else step(state, d, idx)
        return state, loss_sum + metrics["loss"] * k

    def fn(state):
        state, ls = disp(state, jnp.zeros(()), data_big, perm, 0)
        return state, ls

    results["disp_big_k8"] = timed(fn, state)
    emit("disp_big_k8", results["disp_big_k8"], k)

    # headline deltas
    small, big = results["step_small_k1"], results["step_big_k1"]
    scan = results["step_small_k8"] / 8
    print(json.dumps({
        "gather_size_cost_ms": round((big - small) * 1e3, 3),
        "scan_cost_ms_per_step": round((scan - small) * 1e3, 3),
        "combined_ms_per_step": round(
            (results["step_big_k8"] / 8 - small) * 1e3, 3
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
