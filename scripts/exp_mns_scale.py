"""MNS/logQ quality + throughput at TPU scale (VERDICT r3 #6).

The round-3 measured win for mixed negatives + logQ correction (+0.10
recall@100 on Zipf-skewed engagement) was CPU-toy-scale (corpus 400, 2048
samples).  This script re-runs the question at the TPU-scale training anchor
— 65,536-item corpus, 65,536 users, 2.1M samples/epoch, B=4096 bf16,
steps_per_dispatch=8 — with ``popularity_skew`` on, three arms:

  plain        in-batch softmax (reference parity semantics)
  logq         + mixed-proposal logQ correction
  mns+logq     + 64 uniform catalog extras per batch

and reports, per arm: sustained examples/sec through the real training loop
(the throughput cost of B'=64 extras + the appended −logq column on
hardware), overall recall@100 on engaged examples, and the head/tail
decomposition (head = top-20%-popularity items; under Zipf the item id order
IS the popularity rank, training/data.py:66-72).

Run on the TPU (any backend works; numbers are only meaningful on hardware):
  python scripts/exp_mns_scale.py                # full anchor, 2 seeds
  python scripts/exp_mns_scale.py --smoke        # tiny CPU sanity check
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
    p.add_argument("--seeds", type=int, nargs="+", default=[42, 43])
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--skew", type=float, default=1.0)
    p.add_argument("--lr", type=float, default=3e-3,
                   help="3e-3 is the unskewed anchor's rate; under skew the "
                        "PLAIN arm diverges at it even with grad_clip=1.0 "
                        "(duplicate head positives) — the companion run at "
                        "1e-3 gives the un-diverged comparison")
    p.add_argument("--arms", nargs="+",
                   default=["plain", "logq", "mns+logq", "stream+mns+logq"],
                   help="stream+mns+logq replaces the oracle catalog_logq "
                        "with the ONLINE decayed-count estimator "
                        "(training.freq_estimator)")
    p.add_argument("--eval_size", type=int, default=16384)
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes on CPU (correctness of the harness only)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from two_tower_models_tpu.config import (
        DataConfig,
        ExperimentConfig,
        MeshConfig,
        TrainConfig,
        preset,
    )
    from two_tower_models_tpu.retrieval.mips import mips_topk_exact, refresh_corpus
    from two_tower_models_tpu.training.data import gather_batch, make_synthetic_data
    from two_tower_models_tpu.training.loop import train
    from two_tower_models_tpu.models import two_tower
    from two_tower_models_tpu.utils.logging import JsonlLogger

    if args.smoke:
        scale = dict(num_items=400, num_users=256, num_samples=4096,
                     batch_size=256, tables=1024, spd=2, eval_size=1024)
    else:
        scale = dict(num_items=65536, num_users=65536, num_samples=2_097_152,
                     batch_size=4096, tables=65536, spd=8,
                     eval_size=args.eval_size)

    def make_exp(arm: str, seed: int) -> ExperimentConfig:
        model = preset(
            "two_tower_with_user_history_encoder",
            user_id_hash_size=scale["tables"],
            item_id_hash_size=scale["tables"],
            user_id_embedding_dim=64,
            item_id_embedding_dim=64,
            user_features_size=16,
            item_features_size=16,
            history_len=32,
            compute_dtype="bfloat16",
            mixed_negatives=64 if arm.endswith("mns+logq") else 0,
            logq_correction=arm != "plain",
        )
        data = DataConfig(
            num_samples=scale["num_samples"],
            num_users=scale["num_users"],
            num_items=scale["num_items"],
            feature_dim=16,
            history_len=32,
            num_tasks=model.num_tasks,
            structured=True,
            popularity_skew=args.skew,
            seed=seed,
        )
        train_c = TrainConfig(
            batch_size=scale["batch_size"],
            num_epochs=args.epochs,
            learning_rate=args.lr,
            # Zipf batches carry hundreds of duplicate head positives; the
            # unclipped anchor run diverged by epoch 7 (grad norm 0.12 ->
            # 4.7, CE 8.3 -> 13 — BASELINE r4).  1.0 sits ~8x above healthy
            # norms: pure divergence stop, not a tuning knob.
            grad_clip_norm=1.0,
            seed=seed,
            steps_per_dispatch=scale["spd"],
            streaming_logq=arm.startswith("stream"),
        )
        return ExperimentConfig(model=model, data=data, train=train_c,
                                mesh=MeshConfig())

    def head_tail_recall(exp: ExperimentConfig, params, k: int = 100) -> dict:
        """recall@k over engaged eval examples, split by target popularity.

        Under Zipf sampling the item id doubles as the popularity rank
        (training/data.py:66-72), so head = id < 0.2·C exactly matches the
        top-20%-popularity definition of the round-3 toy decomposition."""
        model_cfg, data_cfg = exp.model, exp.data
        data = make_synthetic_data(data_cfg, structured=True)
        corpus = refresh_corpus(params, model_cfg, data.catalog_ids,
                                data.catalog_features)
        head_cut = int(0.2 * data_cfg.num_items)
        n_eval = min(scale["eval_size"], data.num_samples)
        eval_idx = jax.random.permutation(
            jax.random.key(data_cfg.seed + 100), data.num_samples
        )[:n_eval]

        @jax.jit
        def _hits(batch):
            user_emb, _ = two_tower.compute_user_embedding(
                params, model_cfg, batch.user_id, batch.user_features,
                batch.user_history, batch.history_len,
            )
            indices, _, _ = mips_topk_exact(corpus, user_emb, k)
            hit = jnp.any(indices == batch.item_id[:, None], axis=1)
            engaged = jnp.any(batch.labels[:, : model_cfg.num_tasks] > 0, axis=1)
            is_head = batch.item_id < head_cut
            def acc(mask):
                return jnp.sum(hit & mask), jnp.sum(mask)
            return (*acc(engaged), *acc(engaged & is_head),
                    *acc(engaged & ~is_head))

        b = scale["batch_size"]
        totals = [0] * 6
        for i in range(n_eval // b):
            batch = gather_batch(data, eval_idx[i * b : (i + 1) * b])
            vals = jax.device_get(_hits(batch))
            totals = [t + int(v) for t, v in zip(totals, vals)]
        h, n, hh, nh, ht, nt = totals
        return {
            "recall": h / max(n, 1),
            "head_recall": hh / max(nh, 1),
            "tail_recall": ht / max(nt, 1),
            "n_engaged": n, "n_head": nh, "n_tail": nt,
        }

    results = []
    for seed in args.seeds:
        for arm in args.arms:
            exp = make_exp(arm, seed)
            t0 = time.monotonic()
            summary = train(exp, JsonlLogger())  # stderr jsonl
            rec = head_tail_recall(exp, summary["state"].params)
            row = {
                "arm": arm,
                "seed": seed,
                "examples_per_sec": round(summary["examples_per_sec"], 1),
                "train_seconds": round(summary["train_seconds"], 1),
                "final_loss": round(summary["final_loss"], 4),
                "wall_seconds": round(time.monotonic() - t0, 1),
                **{k: round(v, 4) if isinstance(v, float) else v
                   for k, v in rec.items()},
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    # Per-arm means across seeds
    for arm in args.arms:
        rows = [r for r in results if r["arm"] == arm]
        mean = lambda f: sum(r[f] for r in rows) / len(rows)
        print(json.dumps({
            "arm_mean": arm,
            "recall": round(mean("recall"), 4),
            "head_recall": round(mean("head_recall"), 4),
            "tail_recall": round(mean("tail_recall"), 4),
            "examples_per_sec": round(mean("examples_per_sec"), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
