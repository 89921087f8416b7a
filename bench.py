"""Benchmark: flagship train-step throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md).  The comparison
anchor is the PyTorch reference's own train step (same model family —
history encoder + combined debiasing, same dims/batch) measured on this
container's CPU via scripts/bench_reference.py and recorded below (re-run
that script to refresh the constant).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Reference (torch CPU) examples/sec at the SAME config as _bench_cfg():
# measured with scripts/bench_reference.py on this container (see BASELINE.md).
REFERENCE_EXAMPLES_PER_SEC = 854.0

# v5e (v5litepod) single-chip peaks, for MFU / bandwidth-utilization context:
# 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.  The model is lookup/bandwidth-
# dominated at bench scale, so HBM utilization is the binding roofline;
# MFU is reported for completeness.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES = 819e9


def _cost_analysis(compiled):
    """(flops, bytes_accessed) per dispatch from XLA's compiled-cost model;
    (0, 0) when the backend doesn't expose it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _bench_cfg():
    from two_tower_models_tpu.config import Debias, HistoryEncoderConfig, ModelConfig

    return ModelConfig(
        user_id_hash_size=65536,
        user_id_embedding_dim=64,
        item_id_hash_size=65536,
        item_id_embedding_dim=64,
        user_features_size=16,
        item_features_size=16,
        user_value_weights=(1.0, 0.5, 0.25),
        history_len=32,
        history_encoder=HistoryEncoderConfig(fused_encoder=True),
        debias=Debias.BOTH,
        compute_dtype="bfloat16",
        # At B=4096 fused vs dense loss is a wash end-to-end (XLA fuses the
        # dense path well in-context); the kernel's HBM advantage appears at
        # larger global batches (36% at B=16384 — BASELINE.md).  Kept on so
        # --no-fused-loss actually toggles something.
        fused_loss=True,
    )


BATCH_SIZE = 4096


def _probe_backend(timeout_s: float = 240.0) -> str | None:
    """Probe that a JAX backend can initialize, in a SUBPROCESS with a hard
    timeout (on this container a dead axon tunnel makes ``jax.devices()``
    HANG in C code for ~25 min — an in-process try/except cannot bound it).
    Returns None when healthy, else a short error string.  The subprocess
    exits before we init our own backend (the tunnel is single-client).
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print(jax.default_backend())"],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return f"backend probe timed out after {timeout_s:.0f}s"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return "backend init failed: " + (tail[-1] if tail else f"rc={r.returncode}")
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--repeats", type=int, default=3, help="timing repeats; min is reported")
    p.add_argument("--batch-size", type=int, default=BATCH_SIZE)
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--no-fused-loss", action="store_true", help="disable the Pallas fused softmax-CE loss kernel")
    p.add_argument("--no-fused-mha", action="store_true", help="disable the Pallas fused attention-layer kernel")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="K optimizer steps per jitted dispatch (lax.scan carry aliasing)")
    p.add_argument("--fused-adam", action="store_true",
                   help="use the Pallas one-pass Adam kernel (measured ~1.1ms SLOWER end-to-end: the pallas_call is a fusion/scheduling barrier XLA's native adam chain doesn't have)")
    p.add_argument("--probe-timeout", type=float, default=240.0,
                   help="seconds before declaring the backend unavailable")
    args = p.parse_args(argv)

    # Graceful failure when the backend is down (VERDICT r3 #8): keep the
    # BENCH_r* artifact series machine-readable through tunnel outages.
    err = _probe_backend(args.probe_timeout)
    if err is not None:
        print(json.dumps({
            "metric": "train_step_examples_per_sec_per_chip",
            "value": None,
            "unit": "examples/sec",
            "vs_baseline": None,
            "error": err,
        }))
        return 1

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from two_tower_models_tpu.config import TrainConfig
    from two_tower_models_tpu.training.data import SyntheticRecData
    from two_tower_models_tpu.training.state import create_train_state
    from two_tower_models_tpu.training.step import make_train_step

    import dataclasses

    cfg = _bench_cfg()
    if args.fp32:
        cfg = dataclasses.replace(cfg, compute_dtype="float32")
    if args.no_fused_loss:
        cfg = dataclasses.replace(cfg, fused_loss=False)
    if args.no_fused_mha:
        cfg = dataclasses.replace(
            cfg,
            history_encoder=dataclasses.replace(
                cfg.history_encoder, fused_kernel=False, fused_encoder=False
            ),
        )
    tcfg = TrainConfig(
        batch_size=args.batch_size, learning_rate=1e-3,
        fused_adam=args.fused_adam,
        steps_per_dispatch=args.steps_per_dispatch,
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
    if tcfg.steps_per_dispatch > 1:
        idx = jnp.tile(idx[None], (tcfg.steps_per_dispatch, 1))
    step_jit = make_train_step(cfg, tcfg)
    # One explicit lower+compile: the executable is reused for the timing
    # loop AND exposes XLA's cost analysis (no second trace/compile).
    step = step_jit.lower(state, data, idx).compile()
    flops_d, bytes_d = _cost_analysis(step)

    for _ in range(args.warmup):
        state, metrics = step(state, data, idx)
    float(jax.device_get(metrics["loss"]))  # hard sync (device->host transfer)

    # Steps chain through the donated state, so total wall time over N steps
    # bounds real device time; a device_get closes the measurement.  (Per-step
    # block_until_ready is NOT trustworthy on the axon tunnel — it returns
    # before device completion; measured and documented in BASELINE.md.)
    # Tunnel noise only ever INFLATES chained timings (the chain lower-bounds
    # device time), so the min over repeats is the faithful estimator.
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state, data, idx)
        float(jax.device_get(metrics["loss"]))
        times.append(time.perf_counter() - t0)
    step_s = min(times) / (args.steps * tcfg.steps_per_dispatch)
    examples_per_sec = args.batch_size / step_s

    # Hardware-relative context (VERDICT r2 #5): per-step FLOPs and HBM bytes
    # from XLA's compiled cost model -> MFU and HBM-BW utilization.  The
    # train step is lookup/bandwidth-dominated (embedding gathers + scatter
    # backward + Adam state streaming), so HBM utilization is the meaningful
    # roofline; MFU is small by design, not by accident.
    k = tcfg.steps_per_dispatch
    mfu = flops_d / k / step_s / V5E_PEAK_BF16_FLOPS
    hbm_util = bytes_d / k / step_s / V5E_PEAK_HBM_BYTES

    out = {
        "metric": "train_step_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 1),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / REFERENCE_EXAMPLES_PER_SEC, 2),
        # The headline "loss" sums the reference's SUM-reduced debias aux
        # MSEs, which swamp the CE at B=4096 (documented pathology,
        # BASELINE.md) — softmax_ce is the comparable training-quality
        # number.
        "softmax_ce": round(float(metrics["softmax_ce"]), 4),
        "mfu": round(mfu, 4),
        "hbm_bw_util": round(hbm_util, 3),
    }
    print(json.dumps(out))
    print(
        json.dumps(
            {
                "detail": {
                    "backend": jax.default_backend(),
                    "batch_size": args.batch_size,
                    "mean_step_ms": round(step_s * 1e3, 3),
                    "loss": float(metrics["loss"]),
                    "softmax_ce": float(metrics["softmax_ce"]),
                    "flops_per_step": flops_d / k,
                    "hbm_bytes_per_step": bytes_d / k,
                    "compute_dtype": cfg.compute_dtype,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    sys.exit(main())
