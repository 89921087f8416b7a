"""Per-step collective-traffic accounting for the explicit sharded train step.

Every collective in ``parallel.train_step.make_sharded_train_step`` is a
static function of (model config, mesh, global batch): this module enumerates
them with byte counts, so the multi-chip scaling story is FALSIFIABLE —
``tests/test_comms.py`` checks the predicted bytes against the collectives
XLA actually emits for the virtual-mesh program, and
``scripts/scaling_prediction.py`` turns them into a predicted 1 -> N chip
efficiency under an ICI bandwidth model (BASELINE.md "predicted scaling").

Inventory (flagship preset, psum lookup, global negatives — the default
layout; B_l = per-chip batch, B_g = global batch, n_d/n_m = mesh axes):

  forward
    psum    [B_l,   DU] f32   user-id lookup combine        (model axis)
    psum    [B_l*H, DI] f32   history-id lookup combine     (model axis)
    psum    [B_l,   DI] f32   item-id lookup combine        (model axis)
    all_gather [B_l, DI] -> [B_g, DI] cdtype  negative pool (data axis)
    all_gather [B_l]     -> [B_g]     f32     nuv max-norm  (data axis)
  backward (transposes)
    psum    same three lookup shapes AGAIN — the transpose of psum is psum
            (each shard's x feeds every shard's output; verified in the
            compiled virtual-mesh HLO, which shows the second model-axis
            all-reduce tuple with identical shapes)
    reduce_scatter [B_g, DI] -> [B_l, DI]  d(negatives)      (data axis)
    reduce_scatter [B_g]     -> [B_l]      d(nuv gather)     (data axis)
  gradient reduction (parallel/train_step.py reduce_grad)
    psum    replicated leaves (data); per-table [V_shard, D] psum OR the
            sparse (ids, rows) all_gather exchange when it moves fewer
            bytes (parallel.sparse_grads — MeshConfig.sparse_table_grads)
    pmean   replicated leaves only                            (model axis)
  (+ ~6 scalar psums for loss/metrics — counted as one 24-byte lump)

Wire-cost model: ring algorithms (the scaling-book formulas) —
  all_reduce(A)       2 * (n-1)/n * A   sent per chip
  all_gather(shard s) (n-1) * s         sent per chip
  reduce_scatter(A)   (n-1)/n * A       sent per chip
  all_to_all(A)       (n-1)/n * A       sent per chip
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import MeshConfig, ModelConfig
from two_tower_models_tpu.parallel.sharding import (
    _TABLE_KEYS,
    _path_parts,
    _tp_mlp_spec,
)

# v5e ICI: 1600 Gbps aggregate interchip bandwidth per chip (public spec);
# the efficiency prediction uses it as the per-chip send bandwidth.  A 2D
# torus gives each chip multiple links, so concurrent ring phases on
# different axes can exceed this on real slices — the prediction is
# conservative.
V5E_ICI_BYTES_PER_S = 200e9
# per-collective launch/sync latency (ICI hop + runtime), conservative
COLLECTIVE_LATENCY_S = 2e-6


@dataclasses.dataclass(frozen=True)
class Collective:
    name: str
    op: str  # all_reduce | all_gather | reduce_scatter | all_to_all | collective_permute
    axis: str  # 'data' | 'model'
    n: int  # participants
    payload_bytes: int  # per-chip INPUT bytes handed to the collective
    # how many times the op EXECUTES per step (a ppermute inside a lax.scan
    # body appears once in the HLO but fires once per ring hop)
    executions: int = 1

    @property
    def wire_bytes(self) -> int:
        """Bytes SENT per chip under ring algorithms."""
        n, a = self.n, self.payload_bytes
        if n <= 1:
            return 0
        if self.op == "all_reduce":
            return int(2 * (n - 1) / n * a) * self.executions
        if self.op == "all_gather":
            return int((n - 1) * a) * self.executions
        if self.op in ("reduce_scatter", "all_to_all"):
            return int((n - 1) / n * a) * self.executions
        if self.op == "collective_permute":
            # one hop: every chip sends its full payload once
            return a * self.executions
        raise ValueError(self.op)

    @property
    def hlo_result_bytes(self) -> int:
        """Bytes of the collective's RESULT array in the SPMD program — the
        quantity test_comms.py extracts from the compiled HLO (static text:
        executions inside loop bodies do NOT multiply here)."""
        n, a = self.n, self.payload_bytes
        if self.op == "all_gather":
            return a * n
        if self.op == "reduce_scatter":
            return a // n
        return a  # all_reduce / all_to_all / collective_permute: result == operand


def param_byte_split(model_cfg: ModelConfig, mesh_cfg: MeshConfig):
    """(replicated_bytes, table_shard_bytes_per_chip, tp_shard_bytes_per_chip)
    of the parameter pytree, from shapes only (jax.eval_shape — no init)."""
    from two_tower_models_tpu.models.two_tower import init_params

    shapes = jax.eval_shape(
        lambda: init_params(jax.random.key(0), model_cfg)
    )
    rep = tab = tp = 0
    n_m = max(mesh_cfg.model, 1)
    for path, leaf in jax.tree_util.tree_leaves_with_path(shapes):
        parts = _path_parts(path)
        nbytes = leaf.size * leaf.dtype.itemsize
        spec = _tp_mlp_spec(parts) if mesh_cfg.tower_tp else None
        if parts[0] in _TABLE_KEYS:
            tab += nbytes // n_m
        elif spec is not None and any(s is not None for s in spec):
            tp += nbytes // n_m
        else:
            rep += nbytes
    return rep, tab, tp


def step_collectives(
    model_cfg: ModelConfig,
    mesh_cfg: MeshConfig,
    global_batch: int,
    lookup_strategy: str = "psum",
) -> List[Collective]:
    """All collectives of ONE explicit-path train step, per chip."""
    n_d, n_m = mesh_cfg.data, mesh_cfg.model
    assert global_batch % max(n_d, 1) == 0
    b_l = global_batch // max(n_d, 1)
    du = model_cfg.user_id_embedding_dim
    di = model_cfg.item_id_embedding_dim
    h = model_cfg.history_len if model_cfg.history_encoder is not None else 0
    f32, cb = 4, jnp.dtype(model_cfg.cdtype).itemsize
    out: List[Collective] = []
    add = lambda *a: out.append(Collective(*a))

    # --- sharded-table lookups over `model` (forward AND backward: the
    # transpose of psum is psum, of all_to_all is all_to_all) ---
    b_extra = int(model_cfg.mixed_negatives)  # replicated MNS extras' lookups
    if n_m > 1:
        if lookup_strategy == "psum":
            for direction in ("", ":d"):
                add(f"lookup:user_id{direction}", "all_reduce", "model", n_m,
                    b_l * du * f32)
                if h:
                    add(f"lookup:history{direction}", "all_reduce", "model", n_m,
                        b_l * h * di * f32)
                add(f"lookup:item_id{direction}", "all_reduce", "model", n_m,
                    b_l * di * f32)
                if b_extra:
                    add(f"lookup:neg_items{direction}", "all_reduce", "model",
                        n_m, b_extra * di * f32)
        else:  # all_to_all: ids there (+mask), rows back; backward reverses rows
            for name, cnt, d in (
                ("user_id", b_l, du),
                ("history", b_l * h, di),
                ("item_id", b_l, di),
                ("neg_items", b_extra, di),
            ):
                if cnt == 0:
                    continue
                add(f"lookup:{name}:ids", "all_to_all", "model", n_m, n_m * cnt * 4 + n_m * cnt)
                add(f"lookup:{name}:rows", "all_to_all", "model", n_m, n_m * cnt * d * f32)
                add(f"lookup:{name}:d(rows)", "all_to_all", "model", n_m, n_m * cnt * d * f32)

    # --- forward: TP feature MLPs (one psum per row-split layer out) ---
    if mesh_cfg.tower_tp and n_m > 1:
        add("tp:user_mlp:psum", "all_reduce", "model", n_m, b_l * du * f32)
        add("tp:item_mlp:psum", "all_reduce", "model", n_m, b_l * di * f32)
        # backward: dx of the row-split layer psums partial products
        add("tp:user_mlp:d(x)", "all_reduce", "model", n_m,
            b_l * model_cfg.user_features_size * f32)
        add("tp:item_mlp:d(x)", "all_reduce", "model", n_m,
            b_l * model_cfg.item_features_size * f32)

    # --- forward: cross-chip negative pool + nuv max-norm over `data` ---
    ring = (
        mesh_cfg.ring_negatives
        and mesh_cfg.global_negatives
        and not model_cfg.reward_model
    )
    if n_d > 1 and mesh_cfg.global_negatives and ring:
        # parallel.ring_loss: n_d block hops forward; n_d (block + f32 grad
        # block) hops backward.  Total wire ~= all_gather + reduce_scatter
        # of the global pool, but O(B_local) memory and per-hop overlap.
        out.append(Collective(
            "negatives:ring(fwd block)", "collective_permute", "data", n_d,
            b_l * di * cb, executions=n_d,
        ))
        out.append(Collective(
            "negatives:ring(bwd block)", "collective_permute", "data", n_d,
            b_l * di * cb, executions=n_d,
        ))
        out.append(Collective(
            "negatives:ring(bwd grad)", "collective_permute", "data", n_d,
            b_l * di * f32, executions=n_d,
        ))
        if model_cfg.logq_correction:
            # the [B_l] −logQ vector travels with its block: one extra f32
            # hop in the forward scan and one in the backward recompute
            # (parallel.ring_loss.ring_lse_corr)
            out.append(Collective(
                "negatives:ring(fwd corr)", "collective_permute", "data",
                n_d, b_l * f32, executions=n_d,
            ))
            out.append(Collective(
                "negatives:ring(bwd corr)", "collective_permute", "data",
                n_d, b_l * f32, executions=n_d,
            ))
    elif n_d > 1 and mesh_cfg.global_negatives:
        add("negatives:all_gather", "all_gather", "data", n_d, b_l * di * cb)
        add("negatives:d(gather)", "reduce_scatter", "data", n_d, n_d * b_l * di * cb)
    if n_d > 1 and model_cfg.light_ranker is None:
        add("nuv:all_gather", "all_gather", "data", n_d, b_l * f32)
        add("nuv:d(gather)", "reduce_scatter", "data", n_d, n_d * b_l * f32)

    # --- gradient reduction ---
    # Table grads over `data`: dense [V_shard, D] all-reduce OR the sparse
    # (ids, rows) all_gather exchange (parallel.sparse_grads, VERDICT r3 #2)
    # — decision mirrors sparse_table_grad_names exactly (same formula;
    # consistency asserted in tests/test_sparse_grads.py).
    from two_tower_models_tpu.parallel.sparse_grads import (
        sparse_exchange_wins,
        touched_id_counts,
    )

    rep, tab, tp = param_byte_split(model_cfg, mesh_cfg)
    if n_d > 1:
        add("grads:psum(replicated+tp)", "all_reduce", "data", n_d, rep + tp)
        counts = touched_id_counts(model_cfg, b_l)
        tables = {
            "user_id_table": (model_cfg.user_id_hash_size, du),
            "item_id_table": (model_cfg.item_id_hash_size, di),
        }
        mode = mesh_cfg.sparse_table_grads
        for name, (v, d) in tables.items():
            v_shard = v // max(n_m, 1)
            sparse = mode == "on" or (
                mode == "auto"
                and sparse_exchange_wins(counts[name], v_shard, d, n_d)
            )
            if sparse:
                add(f"grads:sparse_ids({name})", "all_gather", "data", n_d,
                    counts[name] * 4)
                add(f"grads:sparse_rows({name})", "all_gather", "data", n_d,
                    counts[name] * d * f32)
            else:
                add(f"grads:psum({name})", "all_reduce", "data", n_d,
                    v_shard * d * f32)
    if n_m > 1:
        add("grads:pmean(replicated)", "all_reduce", "model", n_m, rep)

    # --- scalar losses/metrics lump (loss, aux, ce, nuv_mean, ...) ---
    if n_d > 1:
        add("metrics:scalars", "all_reduce", "data", n_d, 6 * f32)
    return out


def predict_step_time(
    collectives: List[Collective],
    compute_s: float,
    ici_bytes_per_s: float = V5E_ICI_BYTES_PER_S,
    overlap: float = 0.0,
) -> dict:
    """Step-time / efficiency model.

    compute_s: measured single-chip step time at the PER-CHIP batch (weak
    scaling keeps it constant; the [B_l, B_g] loss growth is added by the
    caller if material).  overlap: fraction of comm time hidden under
    compute (0 = serial, 1 = fully overlapped).
    """
    wire = sum(c.wire_bytes for c in collectives)
    # each EXECUTION pays the launch/sync latency: ring_negatives issues its
    # ppermutes once per hop (executions = n), not once per step
    lat = sum(c.executions for c in collectives if c.n > 1) * COLLECTIVE_LATENCY_S
    comm_s = wire / ici_bytes_per_s + lat
    step_s = compute_s + (1.0 - overlap) * comm_s
    return {
        "wire_bytes_per_chip": wire,
        "comm_s": comm_s,
        "step_s": step_s,
        "efficiency": compute_s / step_s,
    }
