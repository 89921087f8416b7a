"""Decompose the lazy-Adam (sparse-table) train step at production table
sizes — where does 4M-row lazy spend 110 ms when dense spends 42?

Lazy Adam's value is capacity (the 8M-row / 1.07B-param single-chip demo,
BASELINE.md round-4 harvest), but it measured 2.6x SLOWER than dense at 4M
rows.  The write-back streaming (ops/pallas/rows_write copies every table
tile through VMEM) only accounts for ~15 ms of that — this script times the
rest of the machinery piece by piece so the optimization lands on the real
hot spot instead of a guess.

Probes (flagship model, 2x --rows tables, B=4096 bf16, packed storage):
  full_lazy    — the lazy step end-to-end (bench_tables --lazy)
  full_dense   — the dense step, same config (the 42.3 ms comparator)
  build_mini   — sort ids + minitable gathers + searchsorted remaps
  sort_item    — jnp.sort of the item-id stream alone ([B*(H+1)] ids)
  remap_item   — the searchsorted remaps alone
  fwd_bwd      — value_and_grad(train_loss) on prebuilt minitables
  mini_scatter — the [N, D] scatter-add inside the minitable lookup VJP
  plan         — lane_block_plan (P searchsorted passes over N)
  merge3       — merge_rows for table+mu+nu rows
  write3       — rows_write of table+mu+nu (the O(V) stream), donated
  adam_rows    — mu/nu row gathers + elementwise Adam on [N, D]

Timing: BASELINE.md methodology — N dispatches closed by one scalar
``jax.device_get`` (in-order device stream; block_until_ready lies on the
tunnel), min over repeats.

  python scripts/decompose_lazy.py --rows 4194304
  python scripts/decompose_lazy.py --rows 8388608 --skip-dense
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, args, steps, repeats, chain=None):
    # `a` evolves across repeats too: donating probes invalidate their
    # input buffers, so the chain must never rewind to a dead original
    jax = sys.modules["jax"]
    a = args
    out = fn(*a)
    if chain is not None:
        a = chain(out, a)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
            if chain is not None:
                a = chain(out, a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / steps * 1e3)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=4194304)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--skip-dense", action="store_true",
                   help="dense does not fit at 8M rows")
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
    from two_tower_models_tpu.models.two_tower import train_loss
    from two_tower_models_tpu.training.data import SyntheticRecData
    from two_tower_models_tpu.training.sparse_tables import (
        SPARSE_TABLE_KEYS,
        apply_sparse_adam,
        build_minibatch,
        split_params,
    )
    from two_tower_models_tpu.training.state import create_train_state
    from two_tower_models_tpu.training.step import make_train_step
    from two_tower_models_tpu.nn.packed_table import _packed_gather
    from two_tower_models_tpu.ops.pallas.rows_write import (
        lane_block_plan,
        merge_rows,
        rows_write,
    )

    B = args.batch_size
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

    def run_full(lazy: bool) -> float:
        tcfg = TrainConfig(
            batch_size=B, learning_rate=1e-3, steps_per_dispatch=1,
            lazy_table_adam=lazy, pack_tables=True,
        )
        state = create_train_state(jax.random.key(0), cfg, tcfg)
        batch = _make_batch(cfg, B)
        data = SyntheticRecData(
            user_ids=batch.user_id, user_features=batch.user_features,
            user_history=batch.user_history, item_ids=batch.item_id,
            item_features=batch.item_features, positions=batch.position,
            labels=batch.labels, catalog_ids=jnp.arange(4),
            catalog_features=jnp.zeros((4, cfg.item_features_size)),
        )
        idx = jnp.arange(B)
        step = make_train_step(cfg, tcfg)
        ms = _timed(
            step, (state, data, idx), args.steps, args.repeats,
            chain=lambda out, a: (out[0], a[1], a[2]),
        )
        del state
        return ms

    results = {}
    results["full_lazy"] = run_full(True)
    if not args.skip_dense:
        results["full_dense"] = run_full(False)

    # ---- piecewise probes (lazy config) --------------------------------
    tcfg = TrainConfig(
        batch_size=B, learning_rate=1e-3, steps_per_dispatch=1,
        lazy_table_adam=True, pack_tables=True,
    )
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    batch = _make_batch(cfg, B)
    params = state.params

    bm = jax.jit(functools.partial(build_minibatch, cfg))
    results["build_mini"] = _timed(bm, (params, batch), args.steps, args.repeats)
    params2, batch2, meta = jax.block_until_ready(bm(params, batch))
    s_item, dup_item = meta["item_id_table"]
    n_item = int(s_item.shape[0])

    item_ids = jnp.concatenate(
        [batch.item_id.reshape(-1), batch.user_history.reshape(-1)]
    )
    results["sort_item"] = _timed(
        jax.jit(jnp.sort), (item_ids,), args.steps, args.repeats
    )

    @jax.jit
    def remap(s, hist, item):
        return (
            jnp.searchsorted(s, hist).astype(jnp.int32),
            jnp.searchsorted(s, item).astype(jnp.int32),
        )

    results["remap_item"] = _timed(
        remap, (s_item, batch.user_history, batch.item_id),
        args.steps, args.repeats,
    )

    vg = jax.jit(
        jax.value_and_grad(lambda p, b: train_loss(p, cfg, b), has_aux=True)
    )
    results["fwd_bwd"] = _timed(
        vg, (params2, batch2), args.steps, args.repeats
    )
    (_, _), grads = jax.block_until_ready(vg(params2, batch2))
    g_item = grads["item_id_table"]

    # the [N, D] scatter-add the lookup VJP performs inside fwd_bwd
    cot = jnp.ones((B, cfg.history_len, 64), jnp.bfloat16)

    @jax.jit
    def mini_scatter(mt, hist_idx):
        def f(m):
            return jnp.sum(jnp.take(m, hist_idx, axis=0) * cot)

        return jax.grad(f)(mt)

    results["mini_scatter"] = _timed(
        mini_scatter, (params2["item_id_table"], batch2.user_history),
        args.steps, args.repeats,
    )

    pack = params["item_id_table"].shape[-1] // 64
    plan_fn = jax.jit(functools.partial(lane_block_plan, pack=pack))
    results["plan"] = _timed(
        plan_fn, (s_item, dup_item), args.steps, args.repeats
    )
    plan = jax.block_until_ready(plan_fn(s_item, dup_item))

    rows_f32 = params2["item_id_table"].astype(jnp.float32)

    @jax.jit
    def merge3(pl_, sid, r):
        return (
            merge_rows(pl_, sid, r),
            merge_rows(pl_, sid, r * 0.5),
            merge_rows(pl_, sid, r * 0.25),
        )

    results["merge3"] = _timed(
        merge3, (plan, s_item, rows_f32), args.steps, args.repeats
    )
    vals = jax.block_until_ready(merge_rows(plan, s_item, rows_f32))
    pids, bits = plan[0], plan[1]

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def write3(tab, mu, nu, v):
        return (
            rows_write(tab, pids, bits, v, block_dim=64),
            rows_write(mu, pids, bits, v, block_dim=64),
            rows_write(nu, pids, bits, v, block_dim=64),
        )

    def write_args():
        moments = state.opt_state["tables"]
        return (
            params["item_id_table"] + 0,
            moments["mu"]["item_id_table"] + 0,
            moments["nu"]["item_id_table"] + 0,
            vals,
        )

    results["write3"] = _timed(
        write3, write_args(), args.steps, args.repeats,
        chain=lambda out, a: (out[0], out[1], out[2], a[3]),
    )

    @jax.jit
    def adam_rows(mu, nu, g, mini):
        rm = _packed_gather(mu, s_item, 64)
        rn = _packed_gather(nu, s_item, 64)
        g = g.astype(jnp.float32)
        mu2 = 0.9 * rm + 0.1 * g
        nu2 = 0.999 * rn + 0.001 * (g * g)
        upd = 1e-3 * (mu2 / 0.1) / (jnp.sqrt(nu2 / 0.001) + 1e-8)
        return mini.astype(jnp.float32) - upd, mu2, nu2

    moments = state.opt_state["tables"]
    results["adam_rows"] = _timed(
        adam_rows,
        (
            moments["mu"]["item_id_table"],
            moments["nu"]["item_id_table"],
            g_item,
            params2["item_id_table"],
        ),
        args.steps,
        args.repeats,
    )

    results = {k: round(v, 2) for k, v in results.items()}
    results["n_item_lookups"] = n_item
    results["rows"] = args.rows
    results["backend"] = jax.default_backend()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
