"""MIPS QPS benchmark on the available accelerator (BASELINE.md metric).

Measures exact top-k retrieval throughput (queries/sec) for dense and chunked
scans at production-ish corpus sizes, plus the torch-CPU reference anchor.

Run: python scripts/bench_mips.py [--corpus 1000000] [--dim 64] [--k 100]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--only", default=None,
                   help="comma-separated variant names to run (default: all)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from two_tower_models_tpu.ops.pallas.mips_topk import mips_topk_exact_pallas
    from two_tower_models_tpu.retrieval.mips import (
        chunked_mips_topk,
        mips_topk,
        mips_topk_approx,
        mips_topk_exact_tilemax,
        mips_topk_segmented,
    )

    corpus = jax.random.normal(jax.random.key(0), (args.corpus, args.dim), jnp.bfloat16)
    query = jax.random.normal(jax.random.key(1), (args.batch, args.dim), jnp.bfloat16)

    # Chained-dependency timing closed by a scalar device_get: per-call
    # block_until_ready under-reports on the tunneled TPU (BASELINE.md).
    def timed(fn):
        def chained(c, q, n):
            def body(i, q):
                idx, s, e = fn(c, q)
                # ALL outputs must stay live: consuming only s[:, :1] lets
                # XLA legally narrow top-k(100) to top-1 (slice-of-sort
                # rewrites), which under-reported the k=100 latency ~17x.
                live = (
                    jnp.sum(s, axis=1, keepdims=True)
                    + jnp.sum(e, axis=1)[:, :1]
                    + jnp.sum(idx, axis=1, keepdims=True).astype(jnp.float32)
                )
                return q + (live * 1e-12).astype(q.dtype)
            return jnp.sum(jax.lax.fori_loop(0, n, body, q))

        g = jax.jit(chained, static_argnums=2)
        # warmup with the SAME static n — a different n retraces and the
        # compile would land inside the timed region
        float(jax.device_get(g(corpus, query, args.steps)))
        t0 = time.perf_counter()
        float(jax.device_get(g(corpus, query, args.steps)))
        return (time.perf_counter() - t0) / args.steps

    results = {}
    for name, fn in {
        "dense": lambda c, q: mips_topk(c, q, args.k),
        "tilemax_xla": lambda c, q: mips_topk_exact_tilemax(c, q, args.k),
        "tilemax_pallas": lambda c, q: mips_topk_exact_pallas(c, q, args.k),
        "segmented64": lambda c, q: mips_topk_segmented(c, q, args.k, 64),
        "segmented256": lambda c, q: mips_topk_segmented(c, q, args.k, 256),
        "approx95": lambda c, q: mips_topk_approx(c, q, args.k, 0.95),
        "chunked": lambda c, q: chunked_mips_topk(c, q, args.k, 131072),
    }.items():
        if args.only and name not in args.only.split(","):
            continue
        sec = timed(fn)
        results[name] = {
            "qps": round(args.batch / sec, 1),
            "latency_ms": round(sec * 1e3, 3),
        }

    print(
        json.dumps(
            {
                "backend": jax.default_backend(),
                "corpus": args.corpus,
                "dim": args.dim,
                "k": args.k,
                "batch": args.batch,
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
