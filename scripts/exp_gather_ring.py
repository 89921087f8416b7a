"""Experiment: gather_rescore DMA ring depth vs exact-topk latency.

Pass 3 (gather_rescore) measures ~13 ms of the 25.9 ms exact pipeline at
1M x 64 / B=1024 / k=100 — ~3x its 4.1 ms DMA-traffic floor (3.36 GB of
tile reads at 819 GB/s).  Suspect: _RING=8 in-flight 32 KB DMAs leave the
HBM pipe underfilled.  Sweep the ring depth and time (a) the gather kernel
alone, (b) the full exact pipeline.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from two_tower_models_tpu.ops.pallas import mips_topk as M


# chained timing, ALL outputs live, min-of-3 (CLAUDE.md measurement rules;
# a dead output once let XLA narrow exact top-k 17x)
from scripts.exp_exact_pipeline import timed


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--rings", default="8,16,32")
    p.add_argument("--tiles", default="", help="extra full-pipeline runs at these tile sizes")
    args = p.parse_args()

    corpus = jax.random.normal(jax.random.key(0), (args.corpus, args.dim), jnp.bfloat16)
    query = jax.random.normal(jax.random.key(1), (args.batch, args.dim), jnp.bfloat16)

    # fixed candidate tiles for the kernel-only timing (uniform random)
    n_tiles = args.corpus // 128
    tidx = jax.random.randint(
        jax.random.key(2), (args.batch, args.k), 0, n_tiles, jnp.int32
    )
    dpad = (-args.dim) % 128
    corpus_dp = jnp.pad(corpus, ((0, 0), (0, dpad)))
    query_dp = jnp.pad(query, ((0, 0), (0, dpad)))
    # pad corpus rows to the chunk multiple like the pipeline does
    cpad = -(-args.corpus // 2048) * 2048 - args.corpus
    corpus_dp = jnp.pad(corpus_dp, ((0, cpad), (0, 0)))

    print(f"backend: {jax.default_backend()}", flush=True)
    for ring in [int(r) for r in args.rings.split(",")]:
        M._RING = ring
        sec_g = timed(
            lambda q: M.gather_rescore(q, corpus_dp, tidx, 128), query_dp, steps=20
        )
        sec_full = timed(
            lambda q: M.mips_topk_exact_pallas(corpus, q, args.k), query, steps=10
        )
        print(
            f"ring={ring:3d}  gather={sec_g*1e3:7.2f} ms  "
            f"full_exact={sec_full*1e3:7.2f} ms",
            flush=True,
        )
    for tile in [int(t) for t in args.tiles.split(",") if t]:
        sec_full = timed(
            lambda q: M.mips_topk_exact_pallas(corpus, q, args.k, tile=tile),
            query,
            steps=10,
        )
        print(f"tile={tile:4d} (ring={M._RING})  full_exact={sec_full*1e3:7.2f} ms", flush=True)
