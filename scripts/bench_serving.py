"""End-to-end serving QPS: user tower + MIPS per query batch.

bench_mips.py measures the MIPS scan in isolation; this measures the full
query path the RetrievalEngine serves (embedding lookup + feature MLP +
history encoder + tower head + top-k over a 1M-item corpus), exact vs
approximate, on the live backend.

Run: python scripts/bench_serving.py [--corpus 1048576] [--batch 1024]
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
    ap.add_argument("--corpus", type=int, default=1 << 20)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from two_tower_models_tpu.config import Debias, HistoryEncoderConfig, ModelConfig
    from two_tower_models_tpu.models import two_tower
    from two_tower_models_tpu.serving import RetrievalEngine

    base = ModelConfig(
        user_id_hash_size=65536,
        user_id_embedding_dim=64,
        item_id_hash_size=args.corpus,
        item_id_embedding_dim=64,
        user_features_size=16,
        item_features_size=16,
        user_value_weights=(1.0, 0.5, 0.25),
        history_len=32,
        history_encoder=HistoryEncoderConfig(fused_encoder=True),
        debias=Debias.BOTH,
        compute_dtype="bfloat16",
        num_items=100,
    )
    params = two_tower.init_params(jax.random.key(0), base)
    catalog_ids = jnp.arange(args.corpus)
    catalog_features = jax.random.normal(jax.random.key(1), (args.corpus, 16))

    ks = jax.random.split(jax.random.key(2), 3)
    uid = jax.random.randint(ks[0], (args.batch,), 0, base.user_id_hash_size)
    feat = jax.random.normal(ks[1], (args.batch, 16))
    hist = jax.random.randint(ks[2], (args.batch, 32), 0, args.corpus)

    # corpus is config-independent: embed the catalog once, share it
    shared = RetrievalEngine.from_params(params, base, catalog_ids, catalog_features)
    approx = dataclasses.replace(base, approx_mips=True)
    exact_ref = None  # approx-path exact reference for recall@num_items
    for name, cfg, quant in (
        ("exact", base, None),
        ("approx_mips", approx, None),
        ("approx_int8", approx, "int8"),
        ("approx_int8_rescore", approx, "int8_rescore"),
    ):
        eng = RetrievalEngine(params, cfg, shared.corpus, quantize=quant)
        eng.warmup(args.batch)
        out = eng.query(uid, feat, hist)
        jax.device_get(out[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = eng.query(uid, feat, hist)
        jax.device_get(out[0, 0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        rec = None
        if name == "exact":
            exact_ref = jax.device_get(out)
        elif exact_ref is not None:
            import numpy as np

            got = jax.device_get(out)
            rec = round(
                sum(
                    len(set(got[b]) & set(exact_ref[b]))
                    for b in range(got.shape[0])
                ) / exact_ref.size,
                4,
            )
        print(json.dumps({
            "path": name,
            "corpus": args.corpus,
            "batch": args.batch,
            "latency_ms_per_batch": round(ms, 3),
            "qps": round(args.batch / ms * 1e3),
            "recall_vs_exact": rec,
        }))


if __name__ == "__main__":
    main()
