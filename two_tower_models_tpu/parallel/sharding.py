"""Sharding layout for the parameter pytree and train state.

Placement policy (the scaling-book recipe: pick a mesh, annotate, let XLA
insert collectives):

  * Embedding tables (``user_id_table``, ``item_id_table``) — row-sharded
    over the ``model`` axis: P('model', None).  These dominate parameter
    memory at production scale; each chip owns V/n rows.
  * Tower MLPs / heads / debias heads / rankers — replicated (tiny: ~100K
    params).  Their gradients all-reduce over ``data``; replicating avoids
    latency-bound small-matmul TP.
  * Optimizer state mirrors the param layout (Adam moments shard with their
    rows).
  * Batch arrays — sharded over ``data`` on the leading axis.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from two_tower_models_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Row-sharded over `model`; everything else replicates.  (The position-bias
# table is NOT here: 100 x 1 — sharding it would cost a collective per lookup
# to save 400 bytes.)
_TABLE_KEYS = ("user_id_table", "item_id_table")
# Feature-MLP keys eligible for tensor parallelism (MeshConfig.tower_tp):
# layer 0 column-split, layer 1 row-split — the Megatron MLP pattern (one
# psum after layer 1, activation stays shard-local).
_TP_MLP_KEYS = ("user_features_mlp", "item_features_mlp")


def _path_parts(path):
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(p.key)
        elif hasattr(p, "idx"):
            out.append(p.idx)
        else:
            out.append(str(p))
    return out


def _tp_mlp_spec(parts):
    """TP spec for an (mlp-name, layer-index, 'w'|'b') path suffix, else None."""
    for i, n in enumerate(parts):
        if n in _TP_MLP_KEYS:
            if i + 2 >= len(parts):
                return None
            layer, leafn = parts[i + 1], parts[i + 2]
            if layer == 0:  # column-parallel: out features split
                return P(None, MODEL_AXIS) if leafn == "w" else P(MODEL_AXIS)
            if layer == 1:  # row-parallel: in features split, bias replicated
                return P(MODEL_AXIS, None) if leafn == "w" else P()
            return P()
    return None


def param_pspecs(params: Dict, tower_tp: bool = False) -> Dict:
    """PartitionSpec pytree matching ``params``."""

    def spec_for(path, leaf):
        parts = _path_parts(path)
        if parts[0] in _TABLE_KEYS:
            return P(MODEL_AXIS, None)
        if tower_tp:
            tp = _tp_mlp_spec(parts)
            if tp is not None:
                return tp
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def state_pspecs(state, tower_tp: bool = False) -> "TrainStateSpecs":
    """Spec pytree for the full TrainState: opt_state mirrors params."""
    from two_tower_models_tpu.training.state import TrainState

    pspecs = param_pspecs(state.params, tower_tp)

    def opt_spec(path, leaf):
        # Adam moments (mu/nu) replicate the params' tree structure, so the
        # param path appears as a suffix of the opt-state path; match on it.
        parts = _path_parts(path)
        names = set(parts)
        if names & set(_TABLE_KEYS) and getattr(leaf, "ndim", 0) == 2:
            return P(MODEL_AXIS, None)
        if tower_tp:
            tp = _tp_mlp_spec(parts)
            if tp is not None:
                return tp
        return P()

    opt_specs = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    # streaming-logQ estimator state: replicated ([C] f32 counts — <=16 MB
    # even at 4M catalog items; every chip updates it identically)
    logq_specs = jax.tree_util.tree_map(lambda _: P(), state.logq_state)
    return TrainState(
        step=P(), params=pspecs, opt_state=opt_specs, rng=P(),
        logq_state=logq_specs,
    )


def shard_state(state, mesh: Mesh, tower_tp: bool = False):
    """Place a host-built TrainState onto the mesh per the layout.

    Single-process: a plain resharding device_put.  Multi-process: every
    host holds the identical host-built state (deterministic init), and
    each contributes the shards its local devices own via
    ``make_array_from_callback`` — device_put cannot target non-addressable
    devices.  Typed PRNG keys go through key_data/wrap_key_data (their
    extended dtype has no numpy view).
    """
    specs = state_pspecs(state, tower_tp)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
        )
    import numpy as np

    def place(x, s):
        sharding = NamedSharding(mesh, s)
        if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            impl = jax.random.key_impl(x)
            data = np.asarray(jax.random.key_data(x))
            placed = jax.make_array_from_callback(
                data.shape,
                NamedSharding(mesh, P(*s, *([None] * (data.ndim - getattr(x, "ndim", 0))))),
                lambda idx: data[idx],
            )
            return jax.random.wrap_key_data(placed, impl=impl)
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree_util.tree_map(place, state, specs)


def batch_pspec() -> P:
    return P(DATA_AXIS)


def data_pspecs(data) -> object:
    """SyntheticRecData sharding: replicate (datasets here are small); batch
    slicing shards activations instead.  Multi-host runs never ship the
    dataset through this — each host materializes only its rows of every
    batch and lifts them to global P('data') arrays (parallel.multihost)."""
    return jax.tree_util.tree_map(lambda _: P(), data)
