"""Experiment: exact top-k pipeline ablation at 1M x 64 / B=1024 / k=100.

Round-3 changes to measure (baseline: 25.9 ms same-pipeline with flat
select + unpacked gather + XLA pass 4 on the slow-tunnel day):

  * packed gather  — P=2 row packing halves pass-3 DMA *bytes*; if the pass
    is DMA-issue-bound (102k copies x ~135 ns matches the 13.8 ms residual)
    packing alone won't move it, which this ablation distinguishes;
  * tile=256       — halves the DMA *count* (the issue-bound lever) at the
    cost of a 2x candidate pool for pass 4;
  * pruned selects — supertile-max pruning for passes 2 and 4 (~8x fewer
    tournament rows);
  * ring depth     — in-flight DMA window (latency lever).

Run on the TPU container:  python scripts/exp_exact_pipeline.py
Optionally --variants, --passes for the per-pass decomposition.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from two_tower_models_tpu.ops.pallas import mips_topk as M

C, D, B, K = 1 << 20, 64, 1024, 100


def timed(fn, q0, steps=10):
    """Chained-dependency timing closed by a scalar device_get (axon-safe)."""

    def chained(q, n):
        def body(i, q):
            out = fn(q)
            live = 0.0
            for o in out if isinstance(out, (tuple, list)) else (out,):
                live = live + jnp.sum(o.astype(jnp.float32)) * 1e-12
            return q + live.astype(q.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n, body, q))

    g = jax.jit(chained, static_argnums=1)
    float(jax.device_get(g(q0, steps)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(g(q0, steps)))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def emit(name, seconds, note=""):
    print(
        json.dumps(
            {
                "variant": name,
                "ms": round(seconds * 1e3, 2),
                "qps": round(B / seconds) if seconds else None,
                "note": note,
            }
        ),
        flush=True,
    )


def full_pipeline(corpus, query, tile):
    return lambda q: M.mips_topk_exact_pallas(corpus, q, K, tile=tile)[:2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--variants",
        default="default,pruned_select,xla_pass4,nopack,tile256,tile256_nopack,ring16,ring32",
    )
    p.add_argument("--passes", action="store_true", help="per-pass decomposition")
    p.add_argument("--pass1_sweep", action="store_true",
                   help="chunk/query_block sweep for the tile-max pass")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--verify", action="store_true", help="bit-exactness vs lax.top_k")
    p.add_argument("--cpu_small", action="store_true",
                   help="tiny shapes on forced CPU (mechanics sanity only)")
    args = p.parse_args()

    global C, B, K
    if args.cpu_small:
        jax.config.update("jax_platforms", "cpu")
        C, B, K = 1 << 15, 64, 20

    corpus = jax.random.normal(jax.random.key(0), (C, D), jnp.bfloat16)
    query = jax.random.normal(jax.random.key(1), (B, D), jnp.bfloat16)

    defaults = dict(RING=M._RING, P4=M._PASS4_MIN_POOL, PACK=M._PACK,
                    PRUNED=M._PRUNED_SELECT, UNROLL=M._GATHER_UNROLL)

    def reset():
        M._RING = defaults["RING"]
        M._PASS4_MIN_POOL = defaults["P4"]
        M._PACK = defaults["PACK"]
        M._PRUNED_SELECT = defaults["PRUNED"]
        M._GATHER_UNROLL = defaults["UNROLL"]

    for v in args.variants.split(","):
        reset()
        tile = 128
        note = ""
        if v == "default":
            note = "flat selects + packed gather, tile=128 (r4 default)"
        elif v == "flat_select":  # alias of default since the r4 flip
            note = "flat tournament for passes 2+4"
        elif v == "pruned_select":
            M._PRUNED_SELECT = True
            note = "supertile-pruned selects (r3 default; measured 1.8x worse)"
        elif v == "xla_pass4":
            M._PASS4_MIN_POOL = 1 << 30
            note = "lax.top_k for pass 4 (r2 shape)"
        elif v == "nopack":
            M._PACK = False
            note = "lane-padded gather DMAs (r2 shape)"
        elif v == "tile256":
            tile = 256
        elif v == "tile256_nopack":
            tile = 256
            M._PACK = False
        elif v == "tile256_ring16":
            tile = 256
            M._RING = 16
        elif v == "tile512":
            tile = 512
        elif v == "ring16":
            M._RING = 16
        elif v == "ring32":
            M._RING = 32
        elif v == "ring128":
            M._RING = 128
            note = "all k DMAs issued up-front; drain loop waits only"
        elif v == "unroll4":
            M._GATHER_UNROLL = 4
            note = "drain loop unrolled 4x (scalar issue overhead lever)"
        elif v == "unroll8":
            M._GATHER_UNROLL = 8
        elif v == "unroll4_ring32":
            M._GATHER_UNROLL = 4
            M._RING = 32
        elif v == "unroll8_ring128":
            M._GATHER_UNROLL = 8
            M._RING = 128
        else:
            print(f"unknown variant {v}", file=sys.stderr)
            continue
        emit(v, timed(full_pipeline(corpus, query, tile), query, args.steps), note)

    reset()
    if args.verify:
        ti, ts, _ = jax.jit(lambda c, q: M.mips_topk_exact_pallas(c, q, K))(
            corpus, query
        )
        rs, ri = jax.jit(
            lambda c, q: jax.lax.top_k(
                jnp.dot(q, c.T, preferred_element_type=jnp.float32), K
            )
        )(corpus, query)
        match = float(jnp.mean((ti == ri).astype(jnp.float32)))
        emit("verify", 0.0, f"index match {match:.6f} (want 1.0)")

    if args.pass1_sweep:
        # pass 1 is VPU-bound on the tile-max reduce, not HBM (BASELINE r3
        # analysis); chunk trades grid steps against VMEM score-block size,
        # query_block trades MXU N-dim against relayout pressure.
        tile = 128
        seen = set()
        for chunk in (1024, 2048, 4096, 8192):
            pad = -(-C // chunk) * chunk - C
            cp = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
            for qb in (256, 512, 1024):
                if (B % qb and qb < B) or f"c{chunk}_qb{min(qb, B)}" in seen:
                    continue
                seen.add(f"c{chunk}_qb{min(qb, B)}")
                emit(
                    f"pass1_c{chunk}_qb{min(qb, B)}",
                    timed(
                        lambda q, cp=cp, chunk=chunk, qb=qb: M.tile_max_scores(
                            q, cp, tile, C, chunk=chunk,
                            query_block=min(qb, B), transposed=True,
                        ),
                        query, args.steps,
                    ),
                )

    if args.passes:
        # pass decomposition at tile=128 defaults
        chunk, tile = 2048, 128
        pad = -(-C // chunk) * chunk - C
        corpus_pc = jnp.pad(corpus, ((0, pad), (0, 0))) if pad else corpus
        emit(
            "pass1_tilemax",
            timed(
                lambda q: M.tile_max_scores(
                    q, corpus_pc, tile, C, chunk=chunk, query_block=512,
                    transposed=True,
                ),
                query, args.steps,
            ),
        )
        m_t = M.tile_max_scores(
            corpus_p=corpus_pc, query=query, tile=tile, valid_count=C,
            chunk=chunk, query_block=512, transposed=True,
        )
        mt_f = jnp.asarray(m_t)
        emit(
            "pass2_pruned",
            timed(lambda q: M.select_topk_t_pruned(mt_f + q[0, 0] * 0, K), query,
                  args.steps),
        )
        emit(
            "pass2_flat",
            timed(lambda q: M.select_topk_t(mt_f + q[0, 0] * 0, K), query,
                  args.steps),
        )
        _, idx_t = M.select_topk_t_pruned(mt_f, K)
        tidx = jnp.sort(idx_t.T, axis=1)
        emit(
            "pass3_gather",
            timed(lambda q: M.gather_rescore(q, corpus_pc, tidx, tile), query,
                  args.steps),
            f"pack={'on' if M._PACK else 'off'} ring={M._RING}",
        )
        cand = M.gather_rescore(query, corpus_pc, tidx, tile)
        emit(
            "pass4_pruned",
            timed(
                lambda q: M.select_topk_t_pruned(
                    (cand + q[:1, :1] * 0).T.astype(jnp.float32), K
                ),
                query, args.steps,
            ),
        )
        emit(
            "pass4_xla",
            timed(lambda q: jax.lax.top_k(cand + q[:1, :1] * 0, K), query,
                  args.steps),
        )


if __name__ == "__main__":
    main()
