"""Decompose the flagship train step into component timings.

Uses the chained-dependency timing methodology from BASELINE.md (per-step
block_until_ready is unreliable on the axon tunnel): each probe is a jitted
fn iterated N times with the output feeding the next input, closed by a
scalar device_get.

Probes (flagship bench config, B from --batch-size):
  full        — train step (grad + Adam) as bench.py runs it
  fwd         — train_loss forward only
  hist_fb     — history encoder (embed lookup + fused MHA stack) fwd+bwd
  emb_fb      — embedding lookups (user id + history ids) fwd+bwd
  towers_fb   — full loss with history encoder OFF (towers + loss + debias)
  loss_fb     — fused softmax-CE loss alone fwd+bwd
  adam        — optimizer update alone on the param pytree
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import optax


def _timed(fn, args, steps, chain=None):
    """Run fn(*args) `steps` times, chaining via `chain(out, args)->args`."""
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        if chain is not None:
            args = chain(out, args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / steps * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=30)
    args = p.parse_args()
    B = args.batch_size

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from __graft_entry__ import _make_batch
    from two_tower_models_tpu.config import TrainConfig
    from two_tower_models_tpu.models import two_tower
    from two_tower_models_tpu.models.history_encoder import history_encoder_apply
    from two_tower_models_tpu.nn.layers import embedding_lookup
    from two_tower_models_tpu.training.data import SyntheticRecData
    from two_tower_models_tpu.training.state import create_train_state
    from two_tower_models_tpu.training.step import make_train_step

    cfg = bench._bench_cfg()
    tcfg = TrainConfig(batch_size=B, learning_rate=1e-3)
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    # the full-step probe donates `state`; keep an undonated copy for the rest
    probe = create_train_state(jax.random.key(0), cfg, tcfg)
    batch = _make_batch(cfg, B)
    params = probe.params
    results = {}

    # full step ------------------------------------------------------------
    data = SyntheticRecData(
        user_ids=batch.user_id, user_features=batch.user_features,
        user_history=batch.user_history, item_ids=batch.item_id,
        item_features=batch.item_features, positions=batch.position,
        labels=batch.labels, catalog_ids=jnp.arange(4),
        catalog_features=jnp.zeros((4, cfg.item_features_size)),
    )
    idx = jnp.arange(B)
    step = make_train_step(cfg, tcfg)
    st = state

    def _run_full():
        nonlocal st
        st, m = step(st, data, idx)
        return m["loss"]

    _run_full()
    jax.device_get(_run_full())
    t0 = time.perf_counter()
    for _ in range(args.steps):
        out = _run_full()
    jax.device_get(out)
    results["full"] = (time.perf_counter() - t0) / args.steps * 1e3

    # forward only ----------------------------------------------------------
    fwd = jax.jit(lambda p, b: two_tower.train_loss(p, cfg, b)[0])
    results["fwd"] = _timed(fwd, (params, batch), args.steps)

    # history encoder fwd+bwd (lookup + MHA stack -> scalar) -----------------
    def hist_loss(p, hist_ids):
        emb = embedding_lookup(p["item_id_table"], hist_ids)
        out = history_encoder_apply(p["history_encoder"], emb, cfg.history_encoder, cfg.cdtype)
        return jnp.sum(out.astype(jnp.float32))

    hist_fb = jax.jit(jax.grad(hist_loss))
    results["hist_fb"] = _timed(hist_fb, (params, batch.user_history), args.steps)

    # embedding lookups fwd+bwd ----------------------------------------------
    def emb_loss(p, uid, hist_ids):
        a = embedding_lookup(p["user_id_table"], uid)
        c = embedding_lookup(p["item_id_table"], hist_ids)
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(c.astype(jnp.float32))

    emb_fb = jax.jit(jax.grad(emb_loss))
    results["emb_fb"] = _timed(emb_fb, (params, batch.user_id, batch.user_history), args.steps)

    # towers + loss with history encoder OFF ---------------------------------
    cfg_nohist = dataclasses.replace(cfg, history_encoder=None)
    params_nh = {k: v for k, v in params.items() if k != "history_encoder"}
    # user tower head input shrinks without history; re-init that head only
    from two_tower_models_tpu.nn.layers import linear_init
    params_nh["user_tower_head"] = linear_init(
        jax.random.key(7), cfg_nohist.user_tower_input_dim, cfg.item_id_embedding_dim, cfg.pdtype
    )
    nh_fb = jax.jit(jax.grad(lambda p, b: two_tower.train_loss(p, cfg_nohist, b)[0]))
    results["towers_fb_nohist"] = _timed(nh_fb, (params_nh, batch), args.steps)

    # fused CE loss alone fwd+bwd --------------------------------------------
    from two_tower_models_tpu.ops.pallas.fused_softmax import fused_in_batch_ce

    ue = jax.random.normal(jax.random.key(1), (B, cfg.item_id_embedding_dim), jnp.float32)
    ie = jax.random.normal(jax.random.key(2), (B, cfg.item_id_embedding_dim), jnp.float32)
    loss_fb = jax.jit(jax.grad(lambda u, i: jnp.sum(fused_in_batch_ce(u, i)[0]), argnums=(0, 1)))
    results["loss_fb"] = _timed(loss_fb, (ue, ie), args.steps)

    # Adam update alone -------------------------------------------------------
    from two_tower_models_tpu.training.state import make_optimizer

    tx = make_optimizer(tcfg)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def adam(p, o):
        u, o2 = tx.update(grads, o, p)
        return optax.apply_updates(p, u), o2

    results["adam"] = _timed(adam, (params, probe.opt_state), args.steps,
                             chain=lambda out, a: out)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(json.dumps({"batch_size": B, "n_params": n_params,
                      "ms": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
