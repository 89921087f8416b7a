"""Collective-traffic accounting (parallel.comms) validated against the
collectives XLA ACTUALLY emits for the explicit sharded step on the virtual
8-device mesh — the predicted per-step byte counts must match the compiled
HLO, which makes the BASELINE.md scaling prediction falsifiable."""

import re
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tests.conftest import make_batch
from two_tower_models_tpu.config import (
    Debias,
    HistoryEncoderConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from two_tower_models_tpu.parallel.comms import (
    Collective,
    param_byte_split,
    predict_step_time,
    step_collectives,
)
from two_tower_models_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from two_tower_models_tpu.parallel.sharding import shard_state
from two_tower_models_tpu.parallel.train_step import make_sharded_train_step
from two_tower_models_tpu.training.state import create_train_state

requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

CFG = ModelConfig(
    user_id_hash_size=256,
    user_id_embedding_dim=16,
    item_id_hash_size=256,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    feature_hidden_dim=16,
    user_value_weights=(1.0, 0.5),
    history_len=4,
    history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
    debias=Debias.BOTH,
)

_DT_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
    "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8,
}
_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s64|u64|f64|pred|s8|u8)\[([0-9,]*)\]")
_OP_RE = re.compile(
    r"= (.*?) (all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start)?\("
)
_GROUP_RE = re.compile(r"replica_groups=\{\{([0-9,]+)\}")
_PAIRS_RE = re.compile(r"source_target_pairs=\{\{(\d+),(\d+)\}")


def _shape_bytes(s: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(s):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DT_BYTES[dt]
    return total


def hlo_collective_bytes(hlo: str, mesh) -> dict:
    """{(op, axis): result_bytes} summed over the program.  The axis is
    recovered from the first replica group: consecutive device ids mean the
    minor (model) mesh axis."""
    n_m = mesh.shape[MODEL_AXIS]
    totals = defaultdict(int)
    for line in hlo.splitlines():
        if "-done(" in line:
            continue  # async completion: counted at the -start
        m = _OP_RE.search(line)
        if not m:
            continue
        if m.group(2) == "collective-permute":
            # permutes carry source_target_pairs, not replica_groups; the
            # hop stride recovers the mesh axis (1 = minor/model axis)
            pr = _PAIRS_RE.search(line)
            if not pr:
                continue
            stride = abs(int(pr.group(2)) - int(pr.group(1)))
            axis = "model" if (stride == 1 and n_m > 1) else "data"
            totals[("collective_permute", axis)] += _shape_bytes(m.group(1))
            continue
        g = _GROUP_RE.search(line)
        ids = [int(x) for x in g.group(1).split(",")] if g else []
        if len(ids) <= 1:
            continue  # size-1 groups: the collective is a no-op, zero wire
        axis = (
            "model"
            if len(ids) == n_m and ids == list(range(ids[0], ids[0] + len(ids)))
            else "data"
        )
        op = m.group(2).replace("-", "_").replace("all_to_all", "all_to_all")
        totals[(m.group(2).replace("-", "_"), axis)] += _shape_bytes(m.group(1))
    return dict(totals)


def predicted_hlo_bytes(collectives) -> dict:
    totals = defaultdict(int)
    for c in collectives:
        totals[(c.op.replace("all_reduce", "all_reduce"), c.axis)] += c.hlo_result_bytes
    # normalize op naming to the HLO's
    return {
        (op.replace("all_reduce", "all_reduce"), ax): v
        for (op, ax), v in totals.items()
    }


def _compile_sharded_step(mesh_cfg, strategy, batch_size=64):
    mesh = make_mesh(mesh_cfg)
    tcfg = TrainConfig(batch_size=batch_size, donate_state=False)
    state = create_train_state(jax.random.key(0), CFG, tcfg, pack=False)
    sharded = shard_state(state, mesh)
    batch = make_batch(jax.random.key(1), CFG, batch_size)
    step = make_sharded_train_step(CFG, tcfg, mesh, mesh_cfg, lookup_strategy=strategy)
    fn = step.build(sharded, batch)
    return mesh, fn.lower(sharded, batch).compile().as_text()


@requires_8
@pytest.mark.parametrize(
    "mesh_cfg",
    [MeshConfig(data=4, model=2), MeshConfig(data=2, model=4), MeshConfig(data=8, model=1)],
)
def test_predicted_bytes_match_hlo_psum(mesh_cfg):
    mesh, hlo = _compile_sharded_step(mesh_cfg, "psum")
    actual = hlo_collective_bytes(hlo, mesh)
    predicted = predicted_hlo_bytes(
        step_collectives(CFG, mesh_cfg, global_batch=64, lookup_strategy="psum")
    )
    keys = set(actual) | set(predicted)
    for key in keys:
        a, p = actual.get(key, 0), predicted.get(key, 0)
        # scalars fold unpredictably into combined tuples; 2% + 64B slack
        assert abs(a - p) <= max(64, 0.02 * max(a, p)), (key, a, p, actual, predicted)


@requires_8
@pytest.mark.parametrize(
    "mesh_cfg",
    [MeshConfig(data=8, model=1, ring_negatives=True),
     MeshConfig(data=4, model=2, ring_negatives=True)],
)
def test_predicted_bytes_match_hlo_ring(mesh_cfg):
    """Ring-negatives mode: the predicted collective-permute hops (one fwd
    block + bwd block + bwd f32 grad block, each once in the HLO text, n_d
    executions on the wire) must match the compiled program, and the
    [B_global, DI] pool gather must be GONE."""
    mesh, hlo = _compile_sharded_step(mesh_cfg, "psum")
    actual = hlo_collective_bytes(hlo, mesh)
    predicted = predicted_hlo_bytes(
        step_collectives(CFG, mesh_cfg, global_batch=64, lookup_strategy="psum")
    )
    for key in set(actual) | set(predicted):
        a, p = actual.get(key, 0), predicted.get(key, 0)
        assert abs(a - p) <= max(64, 0.02 * max(a, p)), (key, a, p, actual, predicted)
    assert ("collective_permute", "data") in actual


@requires_8
def test_predicted_bytes_match_hlo_all_to_all():
    mesh_cfg = MeshConfig(data=2, model=4)
    mesh, hlo = _compile_sharded_step(mesh_cfg, "all_to_all")
    actual = hlo_collective_bytes(hlo, mesh)
    predicted = predicted_hlo_bytes(
        step_collectives(CFG, mesh_cfg, global_batch=64, lookup_strategy="all_to_all")
    )
    for key in set(actual) | set(predicted):
        a, p = actual.get(key, 0), predicted.get(key, 0)
        assert abs(a - p) <= max(64, 0.05 * max(a, p)), (key, a, p, actual, predicted)


def test_param_byte_split_accounts_everything():
    rep, tab, tp = param_byte_split(CFG, MeshConfig(data=2, model=4))
    shapes = jax.eval_shape(
        lambda: __import__(
            "two_tower_models_tpu.models.two_tower", fromlist=["init_params"]
        ).init_params(jax.random.key(0), CFG)
    )
    total = sum(
        l.size * l.dtype.itemsize for l in jax.tree_util.tree_leaves(shapes)
    )
    assert rep + tab * 4 + tp * 4 == total  # shards scale back up by n_model
    assert tab == 2 * 256 * 16 * 4 // 4  # two tables, quarter rows each


def test_wire_byte_formulas():
    ar = Collective("x", "all_reduce", "data", 4, 1000)
    ag = Collective("x", "all_gather", "data", 4, 1000)
    rs = Collective("x", "reduce_scatter", "data", 4, 1000)
    assert ar.wire_bytes == int(2 * 3 / 4 * 1000)
    assert ag.wire_bytes == 3000 and ag.hlo_result_bytes == 4000
    assert rs.wire_bytes == 750 and rs.hlo_result_bytes == 250
    assert Collective("x", "all_reduce", "data", 1, 1000).wire_bytes == 0


def test_predict_step_time_monotone():
    cs = step_collectives(CFG, MeshConfig(data=4, model=2), 4096)
    base = predict_step_time(cs, compute_s=7e-3)
    fast = predict_step_time(cs, compute_s=7e-3, ici_bytes_per_s=1e12)
    assert 0 < base["efficiency"] <= 1
    assert fast["efficiency"] > base["efficiency"]
    assert base["wire_bytes_per_chip"] > 0


@requires_8
def test_predicted_bytes_match_hlo_ring_with_corrections():
    """ring_negatives + mixed_negatives + logQ: the corr-block ppermutes
    (one fwd, one bwd hop of [B_l] f32) must be accounted, and the predicted
    bytes still match the compiled program."""
    import dataclasses

    from two_tower_models_tpu.config import DataConfig
    from two_tower_models_tpu.training.data import (
        extend_batch,
        gather_batch,
        make_synthetic_data,
    )

    cfg = dataclasses.replace(CFG, mixed_negatives=8, logq_correction=True)
    mesh_cfg = MeshConfig(data=4, model=2, ring_negatives=True)
    mesh = make_mesh(mesh_cfg)
    tcfg = TrainConfig(batch_size=64, donate_state=False)
    state = create_train_state(jax.random.key(0), cfg, tcfg, pack=False)
    sharded = shard_state(state, mesh)
    data = make_synthetic_data(
        DataConfig(
            num_samples=128, num_users=cfg.user_id_hash_size,
            num_items=cfg.item_id_hash_size, feature_dim=8,
            history_len=cfg.history_len, num_tasks=2,
        )
    )
    batch = extend_batch(
        cfg, data, gather_batch(data, jnp.arange(64)), jax.random.key(2)
    )
    step = make_sharded_train_step(cfg, tcfg, mesh, mesh_cfg)
    hlo = step.build(sharded, batch).lower(sharded, batch).compile().as_text()
    actual = hlo_collective_bytes(hlo, mesh)
    predicted = predicted_hlo_bytes(
        step_collectives(cfg, mesh_cfg, global_batch=64)
    )
    for key in set(actual) | set(predicted):
        a, p = actual.get(key, 0), predicted.get(key, 0)
        assert abs(a - p) <= max(64, 0.02 * max(a, p)), (key, a, p, actual, predicted)
