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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from two_tower_models_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Row-sharded over `model`; everything else replicates.  (The position-bias
# table is NOT here: 100 x 1 — sharding it would cost a collective per lookup
# to save 400 bytes.)
_TABLE_KEYS = ("user_id_table", "item_id_table")


def param_pspecs(params: Dict) -> Dict:
    """PartitionSpec pytree matching ``params``."""

    def spec_for(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top in _TABLE_KEYS:
            return P(MODEL_AXIS, None)
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def state_pspecs(state) -> "TrainStateSpecs":
    """Spec pytree for the full TrainState: opt_state mirrors params."""
    from two_tower_models_tpu.training.state import TrainState

    pspecs = param_pspecs(state.params)

    def opt_spec(path, leaf):
        # Adam moments (mu/nu) replicate the params' tree structure, so the
        # table name appears somewhere in the key path; match on it.
        names = {
            p.key if hasattr(p, "key") else str(p) for p in path
        }
        if (
            names & set(_TABLE_KEYS)
            and getattr(leaf, "ndim", 0) == 2
        ):
            return P(MODEL_AXIS, None)
        return P()

    opt_specs = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    return TrainState(step=P(), params=pspecs, opt_state=opt_specs, rng=P())


def shard_state(state, mesh: Mesh):
    """Place a host-built TrainState onto the mesh per the layout."""
    specs = state_pspecs(state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def batch_pspec() -> P:
    return P(DATA_AXIS)


def data_pspecs(data) -> object:
    """SyntheticRecData sharding: replicate (datasets here are small); batch
    slicing shards activations instead.  For large datasets swap to
    P('data') leading-axis sharding + per-shard index streams."""
    return jax.tree_util.tree_map(lambda _: P(), data)
