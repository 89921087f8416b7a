"""Training driver + CLI.

Equivalent of the reference's ``train/train.py`` (argparse CLI, epoch loop)
with the systems layer it lacks: jitted state-donating steps, on-device
metric accumulation, corpus refresh + recall@k eval, jsonl logging, optional
checkpointing and profiling.

Run:  python -m two_tower_models_tpu.training.loop --preset two_tower_base_retrieval
"""

from __future__ import annotations

import argparse
import math
import signal
import threading
import time
from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    PRESET_NAMES,
    TrainConfig,
    preset,
    resolve_kernel_flags,
)
from two_tower_models_tpu.retrieval.mips import refresh_corpus
from two_tower_models_tpu.training.data import gather_batch, make_synthetic_data
from two_tower_models_tpu.training.state import create_train_state
from two_tower_models_tpu.training.step import make_eval_recall_fn, make_train_step
from two_tower_models_tpu.utils.logging import JsonlLogger


def install_preemption_handler(
    flag: Optional[threading.Event] = None,
) -> threading.Event:
    """Route SIGTERM (the preemption notice on preemptible/spot TPU VMs) to a
    flag the train loop checks at dispatch boundaries: the current state is
    checkpointed and the loop exits cleanly instead of losing the epoch.
    The reference has no failure handling at all (SURVEY §5 — a crash loses
    everything); with this, kill -TERM <pid> == "finish the step, save,
    exit", and the next identical invocation resumes from the saved step."""
    flag = flag or threading.Event()

    def _handler(signum, frame):
        flag.set()

    signal.signal(signal.SIGTERM, _handler)
    return flag


def _hits_gate(every: int, global_step: int, executed: int) -> bool:
    """True if any step in this dispatch's covered range (global_step -
    executed, global_step] hits the every-N modulo: (g // every) increments
    across the range exactly when a multiple of ``every`` lies inside it."""
    return bool(every) and global_step // every > (global_step - executed) // every


def train(
    exp: ExperimentConfig,
    logger: Optional[JsonlLogger] = None,
    preempt_flag: Optional[threading.Event] = None,
) -> dict:
    """Run the experiment; returns summary dict (final loss, recall, timings).

    ``preempt_flag``: optional event (see ``install_preemption_handler``);
    when set mid-training the loop checkpoints (if configured) and returns
    early with ``summary["preempted"] = True``."""
    logger = logger or JsonlLogger()
    # AUTO Pallas-kernel flags resolve against the live backend here (the
    # dense XLA fallback costs ~4.7x per step on TPU — BASELINE.md round 5)
    exp = replace(exp, model=resolve_kernel_flags(exp.model))
    model_cfg, train_cfg, data_cfg = exp.model, exp.train, exp.data
    prev_debug_nans = jax.config.jax_debug_nans
    if train_cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    try:
        return _train_inner(exp, logger, preempt_flag)
    finally:
        if train_cfg.debug_nans:
            jax.config.update("jax_debug_nans", prev_debug_nans)


def _train_inner(
    exp: ExperimentConfig,
    logger: JsonlLogger,
    preempt_flag: Optional[threading.Event] = None,
) -> dict:
    model_cfg, train_cfg, data_cfg = exp.model, exp.train, exp.data

    label_cols = model_cfg.num_tasks * (2 if model_cfg.kd else 1)
    data = make_synthetic_data(
        data_cfg, structured=data_cfg.structured, label_cols=label_cols
    )
    mesh_cfg = exp.mesh
    on_mesh = mesh_cfg.data * mesh_cfg.model > 1
    state = create_train_state(
        jax.random.key(train_cfg.seed), model_cfg, train_cfg,
        # big tables pack on the single chip and on BOTH mesh paths (the
        # explicit step row-shards packed storage; GSPMD partitions the
        # packed gather/scatter like a plain one)
        pack=True,
        model_shards=mesh_cfg.model if on_mesh else 1,
        catalog_size=data.catalog_ids.shape[0],
    )
    mesh = None
    if mesh_cfg.data * mesh_cfg.model > 1:
        if train_cfg.fused_adam:
            raise ValueError(
                "fused_adam is a single-chip optimization; the sharded "
                "shard_map step uses the optax path (and measures faster "
                "anyway, BASELINE.md) — unset TrainConfig.fused_adam"
            )
        if train_cfg.lazy_table_adam:
            raise NotImplementedError(
                "lazy_table_adam is single-chip for now; on a mesh the "
                "row-sharded tables already bound per-chip table cost "
                "(parallel.embedding) — unset TrainConfig.lazy_table_adam"
            )
        if mesh_cfg.ring_negatives and not mesh_cfg.explicit_collectives:
            raise ValueError(
                "ring_negatives needs the explicit shard_map step (the "
                "GSPMD path traces the single-chip loss, where the ring "
                "collective has no axis) — drop --gspmd"
            )
        # Multi-chip: shard the state over the mesh and run the explicit-
        # collectives shard_map step; batches reshard on entry via GSPMD.
        from two_tower_models_tpu.parallel.mesh import make_mesh
        from two_tower_models_tpu.parallel.sharding import shard_state
        from two_tower_models_tpu.parallel.train_step import make_sharded_train_step

        mesh = make_mesh(mesh_cfg)
        state = shard_state(state, mesh, mesh_cfg.tower_tp)

        def _make_mesh_step(tc):
            if mesh_cfg.explicit_collectives:
                return make_sharded_train_step(model_cfg, tc, mesh, mesh_cfg)
            from two_tower_models_tpu.parallel.train_step import make_gspmd_train_step

            return make_gspmd_train_step(model_cfg, tc, mesh, mesh_cfg)

        gather = jax.jit(gather_batch)
        _mesh_step = _make_mesh_step(train_cfg)
        from two_tower_models_tpu.training.data import extend_batch_for_idx

        _neg_base = jax.random.key(train_cfg.seed + 1789)

        if jax.process_count() > 1:
            # Multi-host: the batch schedule is identical on every host
            # (pure function of seed), but each host materializes only ITS
            # rows and lifts them into a global P('data') array — host
            # memory and host->device transfer stay at 1/n_hosts
            # (parallel.multihost).
            from two_tower_models_tpu.parallel.multihost import (
                global_batch_from_host_local,
                host_batch_slice,
            )
            import numpy as _np

            # With streaming_logq the negative DRAW stays host-local and
            # logq-less; the correction columns attach in a global jit from
            # the replicated estimator, which every host advances
            # identically (the update reads the GLOBAL batch ids — zero
            # extra communication).
            _draw_cfg = (
                replace(model_cfg, logq_correction=False)
                if train_cfg.streaming_logq
                else model_cfg
            )

            def _to_global(d, idx):
                idx = _np.asarray(idx)
                # negatives key off the GLOBAL idx before host slicing —
                # identical on every host and across checkpoint resume
                local = extend_batch_for_idx(
                    _draw_cfg, d, gather_batch(d, host_batch_slice(idx)),
                    _neg_base, idx,
                )
                return global_batch_from_host_local(
                    local, mesh, stack_dims=idx.ndim - 1
                )

            if train_cfg.streaming_logq:
                from jax.sharding import NamedSharding, PartitionSpec as _P

                from two_tower_models_tpu.training.data import (
                    attach_streaming_logq,
                )

                _attach = jax.jit(
                    lambda b, est, cat: attach_streaming_logq(
                        model_cfg, train_cfg, b, est, cat
                    )
                )
                # catalog ids lift ONCE as a global replicated constant
                _cat_cache = {}

                def _cat_global(d):
                    k = id(d.catalog_ids)
                    if k not in _cat_cache:
                        _cat_cache[k] = jax.make_array_from_process_local_data(
                            NamedSharding(mesh, _P()),
                            _np.asarray(d.catalog_ids),
                        )
                    return _cat_cache[k]

                def _wrap_mh(mesh_step):
                    def fn(s, d, idx):
                        gb, est = _attach(
                            _to_global(d, idx), s.logq_state, _cat_global(d)
                        )
                        return mesh_step(s._replace(logq_state=est), gb)

                    return fn

                train_step = _wrap_mh(_mesh_step)

                def _make_single():
                    return _wrap_mh(
                        _make_mesh_step(replace(train_cfg, steps_per_dispatch=1))
                    )

            else:

                def train_step(s, d, idx):
                    return _mesh_step(s, _to_global(d, idx))

                def _make_single():
                    one = _make_mesh_step(
                        replace(train_cfg, steps_per_dispatch=1)
                    )
                    return lambda s, d, idx: one(s, _to_global(d, idx))

        else:
            extended = model_cfg.mixed_negatives or model_cfg.logq_correction
            if extended and train_cfg.streaming_logq:
                # streaming estimator on the mesh: the (small, replicated)
                # estimator state hops out of TrainState for the batch-build
                # jit and back in for the sharded step
                from two_tower_models_tpu.training.data import (
                    stream_extend_for_idx,
                )

                _gather_s = jax.jit(
                    lambda d, idx, est: stream_extend_for_idx(
                        model_cfg, train_cfg, d, gather_batch(d, idx),
                        _neg_base, idx, est,
                    )
                )

                def _wrap(mesh_step):
                    def fn(s, d, idx):
                        batch, est = _gather_s(d, idx, s.logq_state)
                        return mesh_step(s._replace(logq_state=est), batch)

                    return fn

                train_step = _wrap(_mesh_step)

                def _make_single():
                    return _wrap(
                        _make_mesh_step(replace(train_cfg, steps_per_dispatch=1))
                    )

            else:
                if extended:
                    # mesh path: negatives/logq attach where batches are
                    # built (both mesh steps consume the extended Batch); the
                    # key derivation stays inside jit — no device round trip
                    _gather = jax.jit(
                        lambda d, idx: extend_batch_for_idx(
                            model_cfg, d, gather_batch(d, idx), _neg_base, idx
                        )
                    )
                else:
                    _gather = gather

                def train_step(s, d, idx):
                    # idx is [B] (single step) or [K, B] (multi-step
                    # dispatch); gather_batch fancy-indexing produces
                    # matching batch ranks.
                    return _mesh_step(s, _gather(d, idx))

                def _make_single():
                    one = _make_mesh_step(
                        replace(train_cfg, steps_per_dispatch=1)
                    )
                    return lambda s, d, idx: one(s, _gather(d, idx))

    else:
        train_step = make_train_step(model_cfg, train_cfg)

        def _make_single():
            return make_train_step(model_cfg, replace(train_cfg, steps_per_dispatch=1))

    # Multi-step dispatch (steps_per_dispatch > 1): group K batch-index rows
    # into one jitted call.  Single-step fallback handles epoch remainders.
    k_dispatch = max(1, train_cfg.steps_per_dispatch)
    single_step = _make_single() if k_dispatch > 1 else train_step

    # Single-chip fast path: ONE jitted call per dispatch.  The eager version
    # issues several tiny device ops per dispatch (the per-batch perm slices,
    # jnp.stack of the index buffer, and the loss_sum accumulation), each a
    # host->device round trip — on a remote/tunneled TPU those RPCs dominate
    # the loop (measured: the steady-state loop ran 2-4x slower than the bare
    # step, BASELINE.md round-5).  Folding index slicing + K-step dispatch +
    # loss accumulation into one jit makes the loop cost exactly one dispatch
    # per K steps.  Mesh/multihost paths keep their sharding-annotated entry
    # (resharding on entry / host-local batch assembly cannot move into this
    # jit).
    fused_dispatch = None
    if mesh is None:
        _k, _b = k_dispatch, train_cfg.batch_size

        def _disp(state, loss_sum, d, perm, start):
            idx = jax.lax.dynamic_slice_in_dim(perm, start, _k * _b)
            if _k > 1:
                idx = idx.reshape(_k, _b)
            state, metrics = train_step(state, d, idx)
            return state, metrics, loss_sum + metrics["loss"] * _k

        fused_dispatch = jax.jit(_disp, donate_argnums=(0, 1))
    recall_fn = make_eval_recall_fn(model_cfg, train_cfg.eval_top_k)

    ckpt_mgr = None
    if train_cfg.checkpoint_dir:
        from two_tower_models_tpu.training.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(train_cfg.checkpoint_dir)
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = restored
            logger.log("restored", step=int(state.step))

    n_batches = data.num_samples // train_cfg.batch_size
    logger.log(
        "start",
        backend=jax.default_backend(),
        devices=jax.device_count(),
        num_batches_per_epoch=n_batches,
        num_params=sum(p.size for p in jax.tree_util.tree_leaves(state.params)),
    )

    if mesh is not None:
        # Mesh-aware eval (VERDICT r1 #2): the corpus re-embeds DATA-parallel
        # and lands row-sharded over every device; top-k runs shard-local with
        # an exact candidate merge — the full corpus / [B, C] score matrix
        # never materializes on one chip.
        from two_tower_models_tpu.parallel.retrieval import (
            make_sharded_recall_fn,
            make_sharded_refresh_fn,
            pad_catalog,
        )

        pad_ids, pad_feats, valid_c = pad_catalog(
            data.catalog_ids, data.catalog_features, mesh
        )
        if jax.process_count() > 1:
            # Each host feeds only its catalog rows; the refresh consumes a
            # P('data')-sharded global array.
            from jax.sharding import NamedSharding, PartitionSpec as _P
            import numpy as _np

            from two_tower_models_tpu.parallel.mesh import DATA_AXIS as _DA

            _sh = NamedSharding(mesh, _P(_DA))
            _n, _p = jax.process_count(), jax.process_index()
            _rows = pad_ids.shape[0] // _n
            pad_ids = jax.make_array_from_process_local_data(
                _sh, _np.asarray(pad_ids[_p * _rows : (_p + 1) * _rows])
            )
            pad_feats = jax.make_array_from_process_local_data(
                NamedSharding(mesh, _P(_DA, None)),
                _np.asarray(pad_feats[_p * _rows : (_p + 1) * _rows]),
            )
        sharded_refresh = make_sharded_refresh_fn(
            model_cfg, mesh, tower_tp=mesh_cfg.tower_tp
        )
        sharded_recall = make_sharded_recall_fn(
            model_cfg, mesh, train_cfg.eval_top_k, tower_tp=mesh_cfg.tower_tp
        )
        # host_batch_slice also needs the batch to divide process_count()
        # (ADVICE r2: data=1 x model=N multihost meshes eval too)
        _ev_mult = math.lcm(mesh_cfg.data, jax.process_count())
        n_eval = max(
            _ev_mult,
            min(1024, data.num_samples) // _ev_mult * _ev_mult,
        )

        def eval_recall(params):
            corpus = sharded_refresh(params, pad_ids, pad_feats)
            eval_key = jax.random.key(data_cfg.seed + 100)
            eval_idx = jax.random.permutation(eval_key, data.num_samples)[:n_eval]
            if jax.process_count() > 1:
                from two_tower_models_tpu.parallel.multihost import (
                    global_batch_from_host_local,
                    host_batch_slice,
                )
                import numpy as _np

                local = gather_batch(data, host_batch_slice(_np.asarray(eval_idx)))
                batch = global_batch_from_host_local(local, mesh)
            else:
                batch = gather_batch(data, eval_idx)
            return corpus, float(sharded_recall(params, corpus, batch, valid_c))

    else:

        def eval_recall(params):
            """Refresh the corpus from the current item tower, then recall@k
            on a held-out sample (the reference cannot do this at all: its
            corpus is frozen random noise, SURVEY §2.4)."""
            corpus = refresh_corpus(
                params, model_cfg, data.catalog_ids, data.catalog_features
            )
            eval_key = jax.random.key(data_cfg.seed + 100)
            eval_idx = jax.random.permutation(eval_key, data.num_samples)[
                : min(1024, data.num_samples)
            ]
            return corpus, float(
                recall_fn(params, corpus, gather_batch(data, eval_idx))
            )

    # Resumable data-iterator state (SURVEY §5): the batch schedule is a pure
    # function of (seed, epoch), so a restored step count reconstructs the
    # exact position — completed epochs and leading batches are skipped
    # instead of retrained.
    start_step = int(state.step)
    start_epoch = min(start_step // n_batches, train_cfg.num_epochs)
    if start_epoch:
        logger.log("resume_skip", epochs=start_epoch, steps=start_step)

    epoch_losses = []
    t_train0 = time.monotonic()
    examples = 0
    for epoch in range(start_epoch, train_cfg.num_epochs):
        key = jax.random.fold_in(jax.random.key(train_cfg.seed + 1), epoch)
        skip = start_step - epoch * n_batches if epoch == start_epoch else 0
        loss_sum = jnp.zeros(())
        t0 = time.monotonic()
        n_run = 0
        profiling = False
        # One device op per epoch; batches are slices of this permutation.
        # (epoch_batches yields exactly these slices — kept for API users.)
        perm = jax.random.permutation(key, data.num_samples)
        bsz = train_cfg.batch_size
        i = skip
        while i < n_batches:
            # Full K-step dispatches while they fit; the epoch remainder
            # (n_batches % K trailing batches) runs as single steps.
            take = k_dispatch if i + k_dispatch <= n_batches else 1
            # Profile a small post-warmup window of epoch 0: the dispatch(es)
            # covering steps 3..7 (dispatch-granular when k_dispatch > 1).
            if (
                train_cfg.profile_dir and epoch == 0
                and not profiling and i <= 3 < i + take
            ):
                jax.profiler.start_trace(train_cfg.profile_dir)
                profiling = True
            if fused_dispatch is not None and take == k_dispatch:
                # single-chip: index slicing + K steps + loss accumulation in
                # ONE dispatch (zero eager device ops per iteration)
                state, metrics, loss_sum = fused_dispatch(
                    state, loss_sum, data, perm, i * bsz
                )
            elif take == k_dispatch and k_dispatch > 1:
                idx = jnp.stack(
                    [perm[(i + j) * bsz : (i + j + 1) * bsz]
                     for j in range(k_dispatch)]
                )
                state, metrics = train_step(state, data, idx)
                # multi-step metrics are K-step means; sum-equivalent:
                loss_sum = loss_sum + metrics["loss"] * k_dispatch
            else:
                state, metrics = single_step(
                    state, data, perm[i * bsz : (i + 1) * bsz]
                )
                loss_sum = loss_sum + metrics["loss"]  # stays on device
            executed = take
            n_run += executed
            examples += executed * bsz
            i += take
            if train_cfg.profile_dir and epoch == 0 and profiling and i > 7:
                jax.block_until_ready(metrics["loss"])
                jax.profiler.stop_trace()
                profiling = False
                logger.log("profile_written", dir=train_cfg.profile_dir)
            # Host-side step counter: int(state.step) would force a
            # host-device sync EVERY iteration, serializing async dispatch.
            global_step = epoch * n_batches + i
            _gate = lambda every: _hits_gate(every, global_step, executed)
            if _gate(train_cfg.log_every):
                logger.log_metrics("step", metrics, epoch=epoch, step=int(state.step))
            if _gate(train_cfg.eval_every):
                _, recall_mid = eval_recall(state.params)
                logger.log(
                    "eval", step=global_step, recall_at_k=recall_mid,
                    top_k=train_cfg.eval_top_k,
                )
            if ckpt_mgr and _gate(train_cfg.checkpoint_every):
                ckpt_mgr.save(state)
            if preempt_flag is not None and preempt_flag.is_set():
                # Dispatch boundary = consistent state; save it, land the
                # write (close waits), and exit cleanly.  The resume logic
                # below reconstructs the exact schedule position from the
                # restored step on the next identical invocation.
                if ckpt_mgr:
                    ckpt_mgr.save(state, force=True)
                    ckpt_mgr.close()
                step_now = int(state.step)
                logger.log("preempted", step=step_now, epoch=epoch)
                secs = time.monotonic() - t_train0
                return {
                    "epoch_losses": [l for _, l in epoch_losses],
                    "epoch_numbers": [e for e, _ in epoch_losses],
                    "final_loss": epoch_losses[-1][1] if epoch_losses else None,
                    "recall_at_k": None,
                    "train_seconds": secs,
                    "examples_per_sec": examples / max(secs, 1e-9),
                    "state": state,
                    "corpus": None,
                    "preempted": True,
                }
        avg_loss = float(loss_sum) / max(n_run, 1)  # one sync per epoch
        epoch_losses.append((epoch, avg_loss))
        logger.log(
            "epoch",
            epoch=epoch,
            avg_loss=avg_loss,
            seconds=round(time.monotonic() - t0, 3),
        )
    train_seconds = time.monotonic() - t_train0

    # Refresh corpus from the trained item tower, then eval recall@k.
    corpus, recall = eval_recall(state.params)
    logger.log("eval", recall_at_k=recall, top_k=train_cfg.eval_top_k)

    if ckpt_mgr:
        ckpt_mgr.save(state, force=True)
        ckpt_mgr.close()

    return {
        "epoch_losses": [l for _, l in epoch_losses],
        "epoch_numbers": [e for e, _ in epoch_losses],
        "final_loss": epoch_losses[-1][1] if epoch_losses else None,
        "recall_at_k": recall,
        "train_seconds": train_seconds,
        "examples_per_sec": examples / max(train_seconds, 1e-9),
        "state": state,
        "corpus": corpus,
        "preempted": False,
    }


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a TPU-native two-tower model")
    p.add_argument("--preset", choices=PRESET_NAMES, default="two_tower_base_retrieval")
    # reference driver flags (train/train.py:186-254)
    p.add_argument("--num_users", type=int, default=100)
    p.add_argument("--num_items_to_return", type=int, default=10)
    p.add_argument("--user_id_hash_size", type=int, default=1024)
    p.add_argument("--item_id_hash_size", type=int, default=1024)
    p.add_argument("--user_history_seqlen", type=int, default=10)
    p.add_argument("--num_items", type=int, default=200)
    p.add_argument("--embedding_dim", type=int, default=32)
    p.add_argument("--feature_dim", type=int, default=8)
    p.add_argument("--num_samples", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--mixed_negatives", type=int, default=0,
                   help="extra uniformly-sampled catalog negatives per batch (MNS)")
    p.add_argument("--logq_correction", action="store_true",
                   help="subtract each candidate's log sampling probability from its logit (sampled-softmax correction)")
    p.add_argument("--streaming_logq", action="store_true",
                   help="estimate item frequencies ONLINE from the training "
                        "stream (decayed counts, training.freq_estimator) "
                        "instead of the synthetic data's oracle catalog_logq")
    p.add_argument("--logq_decay", type=float, default=0.999,
                   help="streaming-estimator decay: effective window "
                        "~1/(1-decay) batches")
    p.add_argument("--popularity_skew", type=float, default=0.0,
                   help="Zipf exponent for synthetic item engagement (0 = uniform)")
    p.add_argument("--variable_history", action="store_true",
                   help="per-example history lengths in [1, H] (Batch.history_len "
                        "masks the encoder's mean/attention/PE)")
    p.add_argument("--noise_labels", action="store_true",
                   help="pure-noise labels like the reference demo (recall@k becomes random)")
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--grad_clip_norm", type=float, default=None,
                   help="global-norm gradient clip before Adam (off by "
                        "default = reference parity)")
    # systems flags the reference lacks
    p.add_argument("--compute_dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--log_file", default=None)
    p.add_argument("--tensorboard_dir", default=None, help="mirror scalar events to TensorBoard")
    p.add_argument("--profile_dir", default=None, help="write an xprof trace of steps 3-7")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--debug_nans", action="store_true", help="abort on first NaN (jax_debug_nans)")
    p.add_argument("--eval_every", type=int, default=0, help="mid-training recall@k every N steps")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="K optimizer steps per jitted dispatch (lax.scan)")
    # mesh: data*model must divide the available device count
    p.add_argument("--mesh_data", type=int, default=1, help="data-parallel mesh axis")
    p.add_argument("--mesh_model", type=int, default=1, help="table-sharding mesh axis")
    p.add_argument("--tower_tp", action="store_true",
                   help="tensor-parallel feature MLPs over the model axis (Megatron split)")
    p.add_argument("--ring_negatives", action="store_true",
                   help="flash-style ppermute ring for the global-negative "
                        "softmax (O(B_local) memory at any global batch)")
    p.add_argument("--sparse_table_grads", choices=["auto", "on", "off"],
                   default="auto",
                   help="cross-chip table grads as a dedup'd (ids, rows) "
                        "all_gather instead of the dense [V_shard, D] psum "
                        "when it moves fewer bytes (parallel.sparse_grads)")
    p.add_argument("--gspmd", action="store_true",
                   help="multi-chip via GSPMD (jit + NamedSharding) instead of explicit shard_map collectives")
    p.add_argument(
        "--multihost", action="store_true",
        help="call jax.distributed.initialize before building the mesh (TPU pods)",
    )
    return p


def config_from_args(args: argparse.Namespace) -> ExperimentConfig:
    model = preset(
        args.preset,
        num_items=args.num_items_to_return,
        user_id_hash_size=args.user_id_hash_size,
        user_id_embedding_dim=args.embedding_dim,
        user_features_size=args.feature_dim,
        item_id_hash_size=args.item_id_hash_size,
        item_id_embedding_dim=args.embedding_dim,
        item_features_size=args.feature_dim,
        history_len=args.user_history_seqlen,
        compute_dtype=args.compute_dtype,
        mixed_negatives=args.mixed_negatives,
        logq_correction=args.logq_correction,
    )
    data = DataConfig(
        num_samples=args.num_samples,
        num_users=args.num_users,
        num_items=args.num_items,
        feature_dim=args.feature_dim,
        history_len=args.user_history_seqlen,
        num_tasks=model.num_tasks,
        structured=not args.noise_labels,
        variable_history=args.variable_history,
        popularity_skew=args.popularity_skew,
    )
    train_c = TrainConfig(
        batch_size=args.batch_size,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
        grad_clip_norm=args.grad_clip_norm,
        streaming_logq=args.streaming_logq,
        logq_decay=args.logq_decay,
        seed=args.seed,
        checkpoint_dir=args.checkpoint_dir,
        profile_dir=args.profile_dir,
        debug_nans=args.debug_nans,
        eval_every=args.eval_every,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    from two_tower_models_tpu.config import MeshConfig

    mesh = MeshConfig(
        data=args.mesh_data, model=args.mesh_model,
        explicit_collectives=not args.gspmd,
        tower_tp=args.tower_tp,
        ring_negatives=args.ring_negatives,
        sparse_table_grads=args.sparse_table_grads,
    )
    return ExperimentConfig(model=model, data=data, train=train_c, mesh=mesh)


def _maybe_init_multihost(args) -> None:
    if getattr(args, "multihost", False):
        from two_tower_models_tpu.parallel.mesh import initialize_multihost

        initialize_multihost()


def main(argv=None):
    args = build_argparser().parse_args(argv)
    _maybe_init_multihost(args)
    exp = config_from_args(args)
    logger = JsonlLogger(args.log_file, tensorboard_dir=args.tensorboard_dir)
    preempt = install_preemption_handler()
    try:
        summary = train(exp, logger, preempt_flag=preempt)
    finally:
        logger.close()
    for epoch, loss in zip(summary["epoch_numbers"], summary["epoch_losses"]):
        print(f"Epoch [{epoch + 1}/{exp.train.num_epochs}] - Loss: {loss:.4f}")
    if summary.get("preempted"):
        print("preempted: state checkpointed; re-run to resume")
    else:
        print(f"recall@{exp.train.eval_top_k}: {summary['recall_at_k']:.4f}")
    return summary


if __name__ == "__main__":
    main()
