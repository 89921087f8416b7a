"""End-to-end lifecycle: train -> checkpoint -> resume -> build corpus -> serve.

The complete replacement for the reference's train/train.py demo
(which trains on noise, checkpoints nothing, and retrieves from a frozen
random corpus).  Runs on CPU or TPU; ~1 min on the v5e chip.

    python examples/train_and_serve.py [--workdir /tmp/two_tower_demo]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import (
    DataConfig,
    ExperimentConfig,
    TrainConfig,
    preset,
)
from two_tower_models_tpu.serving import RetrievalEngine
from two_tower_models_tpu.training.data import make_synthetic_data
from two_tower_models_tpu.training.loop import train
from two_tower_models_tpu.utils.logging import JsonlLogger


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/two_tower_demo")
    ap.add_argument("--keep", action="store_true",
                    help="keep an existing workdir (default: start fresh so "
                         "the train->resume story replays)")
    args = ap.parse_args()
    ckpt_dir = os.path.join(args.workdir, "ckpt")
    if not args.keep and os.path.exists(ckpt_dir):
        import shutil

        print(f"removing stale demo checkpoints at {ckpt_dir}")
        shutil.rmtree(ckpt_dir)

    # 1. Configure: the history-encoder + combined-debias variant at demo
    #    scale.  `preset` accepts any reference class name.
    model = preset(
        "two_tower_with_debiasing",
        history_len=8,
        user_id_hash_size=512,
        item_id_hash_size=512,
        user_id_embedding_dim=32,
        item_id_embedding_dim=32,
        num_items=50,
        # The reference's debias aux MSEs are batch SUMS; rescale so they
        # don't drown the retrieval loss (see BASELINE.md large-batch note).
        debias_aux_weight=1.0 / 64,
    )
    data_cfg = DataConfig(
        num_samples=4096, num_users=512, num_items=512,
        feature_dim=8, history_len=8, num_tasks=model.num_tasks,
    )

    # 2. Train 2 epochs with periodic checkpoints.
    exp = ExperimentConfig(
        model=model, data=data_cfg,
        train=TrainConfig(
            batch_size=64, num_epochs=2, learning_rate=1e-3,
            checkpoint_dir=ckpt_dir, log_every=0,
        ),
    )
    first = train(exp, JsonlLogger(echo=False))
    print(f"trained 2 epochs: loss {first['epoch_losses'][0]:.4f} -> "
          f"{first['epoch_losses'][-1]:.4f}, recall@100 {first['recall_at_k']:.3f}")

    # 3. Resume: same checkpoint dir, one more epoch — completed epochs skip.
    exp3 = ExperimentConfig(
        model=model, data=data_cfg,
        train=TrainConfig(
            batch_size=64, num_epochs=3, learning_rate=1e-3,
            checkpoint_dir=ckpt_dir, log_every=0,
        ),
    )
    resumed = train(exp3, JsonlLogger(echo=False))
    print(f"resumed epoch {resumed['epoch_numbers'][0] + 1}: "
          f"loss {resumed['final_loss']:.4f}, recall@100 {resumed['recall_at_k']:.3f}")

    # 4. Serve: build the corpus from the trained item tower, compile the
    #    query function, retrieve for a batch of users.
    params = resumed["state"].params
    data = make_synthetic_data(data_cfg, label_cols=model.num_tasks)
    engine = RetrievalEngine.from_params(
        params, model, data.catalog_ids, data.catalog_features
    )
    engine.warmup(batch_size=16)
    top = engine.query(
        data.user_ids[:16], data.user_features[:16], data.user_history[:16]
    )
    print(f"served 16 queries -> top-{model.num_items} indices, "
          f"shape {tuple(top.shape)}, sample row 0: {jnp.sort(top[0])[:8].tolist()}...")

    # 5. The affinity check: retrieved items should over-represent each
    #    user's affinity group (user_id % 8 == item_id % 8 in the synthetic
    #    generator) relative to the 1/8 base rate.
    match = jnp.mean(
        (top % 8 == (data.user_ids[:16] % 8)[:, None]).astype(jnp.float32)
    )
    print(f"affinity-group rate in retrieved items: {float(match):.3f} "
          f"(random would be 0.125)")


if __name__ == "__main__":
    main()
