"""Sharding layer on a virtual 8-device CPU mesh: lookup exchange parity and
sharded-vs-single-chip train-step parity (SURVEY §4 new-framework strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tests.conftest import make_batch
from two_tower_models_tpu.config import (
    HistoryEncoderConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.parallel.embedding import sharded_embedding_lookup
from two_tower_models_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from two_tower_models_tpu.parallel.sharding import shard_state
from two_tower_models_tpu.parallel.train_step import make_sharded_train_step
from two_tower_models_tpu.training.state import create_train_state
from two_tower_models_tpu.training.step import make_train_step


requires_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

# debias=BOTH makes nuv param-dependent, so the global max-normalization and
# the debias aux losses are on the differentiated path (a pmax here once broke
# only under grad — keep this config adversarial).
from two_tower_models_tpu.config import Debias

CFG = ModelConfig(
    user_id_hash_size=64,
    user_id_embedding_dim=16,
    item_id_hash_size=64,
    item_id_embedding_dim=16,
    user_features_size=8,
    item_features_size=8,
    feature_hidden_dim=32,
    user_value_weights=(1.0, 0.5),
    history_len=8,
    history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
    debias=Debias.BOTH,
)


@requires_8
@pytest.mark.parametrize("strategy", ["psum", "all_to_all"])
def test_sharded_lookup_matches_take(strategy):
    mesh = make_mesh(MeshConfig(data=1, model=4))
    vocab, dim, B = 64, 16, 24
    table = jax.random.normal(jax.random.key(0), (vocab, dim))
    ids = jax.random.randint(jax.random.key(1), (B,), 0, vocab)

    def f(table_shard, ids):
        return sharded_embedding_lookup(table_shard, ids, MODEL_AXIS, strategy)

    mapped = jax.jit(
        jax.shard_map(
            f,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    out = mapped(table, ids)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
    )


@requires_8
@pytest.mark.parametrize("strategy", ["psum", "all_to_all"])
def test_sharded_lookup_gradient_matches(strategy):
    mesh = make_mesh(MeshConfig(data=1, model=4))
    vocab, dim, B = 32, 8, 16
    table = jax.random.normal(jax.random.key(0), (vocab, dim))
    # include duplicate ids to exercise scatter-add in the backward
    ids = jnp.concatenate(
        [jax.random.randint(jax.random.key(1), (B - 4,), 0, vocab), jnp.array([3, 3, 3, 7])]
    )

    def loss_sharded(table):
        def f(table_shard, ids):
            emb = sharded_embedding_lookup(table_shard, ids, MODEL_AXIS, strategy)
            return jnp.sum(emb**2)

        return jax.shard_map(
            f, mesh=mesh, in_specs=(P(MODEL_AXIS, None), P()), out_specs=P(),
            check_vma=False,
        )(table, ids)

    def loss_ref(table):
        return jnp.sum(jnp.take(table, ids, axis=0) ** 2)

    g_sharded = jax.grad(loss_sharded)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-5)


@requires_8
@pytest.mark.parametrize(
    "mesh_shape,fused_loss",
    [((4, 2), False), ((8, 1), False), ((1, 4), False), ((4, 2), True)],
)
def test_sharded_train_step_parity_with_single_chip(mesh_shape, fused_loss):
    """One sharded step == one single-chip step (same init, same batch).

    fused_loss=True additionally checks the rectangular fused_lse kernel
    (cross-chip negatives) against the single-chip square fused kernel."""
    import dataclasses

    cfg = dataclasses.replace(CFG, fused_loss=fused_loss)
    d, m = mesh_shape
    mesh = make_mesh(MeshConfig(data=d, model=m))
    mesh_cfg = MeshConfig(data=d, model=m, global_negatives=True)
    tcfg = TrainConfig(batch_size=32, learning_rate=1e-3)

    state = create_train_state(jax.random.key(0), cfg, tcfg)
    batch = make_batch(jax.random.key(1), cfg, 32)

    # single-chip reference step (no data/idx indirection: call loss directly)
    ref_step = make_train_step(cfg, TrainConfig(batch_size=32, donate_state=False))
    # build a fake "data" with exactly this batch to reuse the step fn
    from two_tower_models_tpu.training.data import SyntheticRecData

    data = SyntheticRecData(
        user_ids=batch.user_id,
        user_features=batch.user_features,
        user_history=batch.user_history,
        item_ids=batch.item_id,
        item_features=batch.item_features,
        positions=batch.position,
        labels=batch.labels,
        catalog_ids=jnp.arange(4),
        catalog_features=jnp.zeros((4, CFG.item_features_size)),
    )
    ref_state, ref_metrics = ref_step(state, data, jnp.arange(32))

    orig_params = jax.device_get(state.params)  # host copy (step donates buffers)
    sharded = shard_state(state, mesh)
    step = make_sharded_train_step(cfg, tcfg, mesh, mesh_cfg)
    new_state, metrics = step(sharded, batch)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    # the step applied an update everywhere params had gradient signal
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(new_state.params),
        orig_params,
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


@requires_8
@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 4)])
def test_sharded_gradients_match_single_chip(mesh_shape):
    """Gradients through shard_map (collectives + lookup exchange) equal the
    single-chip gradients.  (Post-Adam params are NOT compared: Adam's first
    step normalizes g/|g|, amplifying float noise on near-zero grads.)"""
    from two_tower_models_tpu.parallel.train_step import sharded_loss_fn

    d, m = mesh_shape
    mesh = make_mesh(MeshConfig(data=d, model=m))
    mesh_cfg = MeshConfig(data=d, model=m, global_negatives=True)
    params = two_tower.init_params(jax.random.key(0), CFG)
    batch = make_batch(jax.random.key(1), CFG, 32)

    batch_specs = type(batch)(*([P(DATA_AXIS)] * 7))

    def loss_sharded(params, batch):
        from two_tower_models_tpu.parallel.sharding import param_pspecs

        return jax.shard_map(
            lambda p, b: sharded_loss_fn(p, CFG, mesh_cfg, b)[0],
            mesh=mesh,
            in_specs=(param_pspecs(params), batch_specs),
            out_specs=P(),
            check_vma=False,
        )(params, batch)

    g_sharded = jax.grad(loss_sharded)(params, batch)
    g_ref = jax.grad(lambda p: two_tower.train_loss(p, CFG, batch)[0])(params)

    flat_s = jax.tree_util.tree_leaves_with_path(g_sharded)
    flat_r = {jax.tree_util.keystr(p): g for p, g in jax.tree_util.tree_leaves_with_path(g_ref)}
    for path, g in flat_s:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_r[key]), rtol=5e-4, atol=1e-6,
            err_msg=f"grad mismatch at {key}",
        )


def _small_preset(name: str):
    """The named preset at test scale (tiny dims, 1 attention layer)."""
    from two_tower_models_tpu.config import preset

    over = dict(
        user_id_hash_size=64,
        user_id_embedding_dim=16,
        item_id_hash_size=64,
        item_id_embedding_dim=16,
        user_features_size=8,
        item_features_size=8,
        feature_hidden_dim=32,
        user_value_weights=(1.0, 0.5),
        history_len=8,
    )
    if preset(name).history_encoder is not None:
        over["history_encoder"] = HistoryEncoderConfig(num_heads=2, num_layers=1)
    return preset(name, **over)


ALL_PRESETS = [
    "two_tower_base_retrieval",
    "two_tower_with_user_history_encoder",
    "two_tower_with_position_debiased_weights",
    "two_tower_with_user_debiased_weights",
    "two_tower_with_debiasing",
    "two_tower_plus_light_ranker",
    "two_tower_plus_light_ranker_kd",
    "two_tower_with_main_ranker_reward",
]


@requires_8
@pytest.mark.parametrize("preset_name", ALL_PRESETS)
def test_sharded_loss_and_grads_match_single_chip_all_presets(preset_name):
    """The WHOLE zoo trains the single-chip objective on a mesh: sharded loss
    AND every parameter gradient (incl. ranker heads, KD aux logits, proxy
    ranker) match two_tower.train_loss on the global batch (VERDICT r1 #1)."""
    from two_tower_models_tpu.parallel.sharding import param_pspecs
    from two_tower_models_tpu.parallel.train_step import sharded_loss_fn

    cfg = _small_preset(preset_name)
    d, m = 4, 2
    mesh = make_mesh(MeshConfig(data=d, model=m))
    mesh_cfg = MeshConfig(data=d, model=m, global_negatives=True)
    params = two_tower.init_params(jax.random.key(0), cfg)
    label_cols = cfg.num_tasks * (2 if cfg.kd else 1)
    batch = make_batch(jax.random.key(1), cfg, 32, num_label_cols=label_cols)
    batch_specs = type(batch)(*([P(DATA_AXIS)] * 7))

    def loss_sharded(params, batch):
        return jax.shard_map(
            lambda p, b: sharded_loss_fn(p, cfg, mesh_cfg, b)[0],
            mesh=mesh,
            in_specs=(param_pspecs(params), batch_specs),
            out_specs=P(),
            check_vma=False,
        )(params, batch)

    loss_s, g_sharded = jax.value_and_grad(loss_sharded)(params, batch)
    loss_r, g_ref = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, cfg, batch)[0]
    )(params)
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)

    flat_s = jax.tree_util.tree_leaves_with_path(g_sharded)
    flat_r = {
        jax.tree_util.keystr(p): g
        for p, g in jax.tree_util.tree_leaves_with_path(g_ref)
    }
    # Light-ranker presets skip nuv max-normalization (reference semantics,
    # two_tower_plus_light_ranker.py:286-289) while the BOTH-debias estimate
    # clamps at 1e-3, so weighted-CE intermediates reach O(1e3): f32
    # reassociation noise through that cancellation is ~1e-5 absolute on
    # O(1e-3) grads.  Max-normalized presets stay at the tighter bound.
    atol = 5e-5 if cfg.light_ranker is not None else 1e-6
    for path, g in flat_s:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_r[key]), rtol=5e-4, atol=atol,
            err_msg=f"grad mismatch at {key}",
        )
        # the heads round 1 trained frozen must actually receive signal
        # (debias heads excluded: USER's clamp-before-MSE legitimately
        # saturates to zero grad at init — reference semantics)
        if any(s in key for s in ("ranker", "proxy")):
            assert np.abs(np.asarray(g)).max() > 0, f"zero grad at {key}"


@requires_8
@pytest.mark.parametrize("preset_name", ["two_tower_plus_light_ranker_kd",
                                         "two_tower_with_main_ranker_reward"])
def test_sharded_train_step_runs_full_zoo(preset_name):
    """End-to-end sharded step (jit + shard_map + optimizer) for the presets
    the round-1 path refused: params move, metrics include the new terms."""
    cfg = _small_preset(preset_name)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    mesh_cfg = MeshConfig(data=4, model=2, global_negatives=True)
    tcfg = TrainConfig(batch_size=32, learning_rate=1e-3)
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    label_cols = cfg.num_tasks * (2 if cfg.kd else 1)
    batch = make_batch(jax.random.key(1), cfg, 32, num_label_cols=label_cols)

    orig = jax.device_get(state.params)
    sharded = shard_state(state, mesh)
    step = make_sharded_train_step(cfg, tcfg, mesh, mesh_cfg)
    new_state, metrics = step(sharded, batch)
    assert np.isfinite(float(metrics["loss"]))
    if cfg.light_ranker is not None:
        assert "light_ranker_bce" in metrics
    if cfg.kd:
        assert "kd_loss" in metrics
    if cfg.reward_model:
        assert "reward_kl" in metrics and "proxy_ranker_bce" in metrics
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(new_state.params), orig,
    )
    # ranker/proxy heads must move — round 1 trained them frozen at init
    for name in ("ranker_user_tower", "light_ranker_head", "proxy_ranker"):
        if name in moved:
            assert max(jax.tree_util.tree_leaves(moved[name])) > 0, name


@requires_8
@pytest.mark.parametrize("preset_name", ["two_tower_base_retrieval",
                                         "two_tower_with_debiasing"])
def test_tower_tp_matches_single_chip(preset_name):
    """Tensor-parallel feature MLPs (Megatron column/row split over `model`):
    sharded loss AND grads equal the single-chip objective, and the MLP
    params/moments actually shard (SURVEY §2.5 optional-TP line)."""
    from jax.sharding import NamedSharding
    from two_tower_models_tpu.parallel.sharding import param_pspecs
    from two_tower_models_tpu.parallel.train_step import sharded_loss_fn

    cfg = _small_preset(preset_name)
    d, m = 2, 4
    mesh = make_mesh(MeshConfig(data=d, model=m))
    mesh_cfg = MeshConfig(data=d, model=m, global_negatives=True, tower_tp=True)
    params = two_tower.init_params(jax.random.key(0), cfg)
    batch = make_batch(jax.random.key(1), cfg, 32)
    batch_specs = type(batch)(*([P(DATA_AXIS)] * 7))
    pspecs = param_pspecs(params, tower_tp=True)
    # layer-0 weight column-split, layer-1 weight row-split
    assert pspecs["user_features_mlp"][0]["w"] == P(None, MODEL_AXIS)
    assert pspecs["item_features_mlp"][1]["w"] == P(MODEL_AXIS, None)

    def loss_sharded(params, batch):
        return jax.shard_map(
            lambda p, b: sharded_loss_fn(p, cfg, mesh_cfg, b)[0],
            mesh=mesh,
            in_specs=(pspecs, batch_specs),
            out_specs=P(),
            check_vma=False,
        )(params, batch)

    loss_s, g_s = jax.value_and_grad(loss_sharded)(params, batch)
    loss_r, g_r = jax.value_and_grad(
        lambda p: two_tower.train_loss(p, cfg, batch)[0]
    )(params)
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    flat_r = {
        jax.tree_util.keystr(p): g
        for p, g in jax.tree_util.tree_leaves_with_path(g_r)
    }
    for path, g in jax.tree_util.tree_leaves_with_path(g_s):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_r[key]), rtol=5e-4, atol=1e-6,
            err_msg=f"grad mismatch at {key}",
        )


@requires_8
def test_tower_tp_full_step_and_eval():
    """End-to-end tower_tp: sharded train step runs, MLP params are placed
    sharded on the mesh, and the sharded eval recall matches single-device."""
    from two_tower_models_tpu.parallel.retrieval import (
        make_sharded_recall_fn,
        make_sharded_refresh_fn,
        pad_catalog,
    )
    from two_tower_models_tpu.retrieval.mips import refresh_corpus
    from two_tower_models_tpu.training.step import make_eval_recall_fn

    cfg = _small_preset("two_tower_with_user_history_encoder")
    mesh = make_mesh(MeshConfig(data=2, model=4))
    mesh_cfg = MeshConfig(data=2, model=4, tower_tp=True)
    tcfg = TrainConfig(batch_size=32, learning_rate=1e-3)
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    params_host = jax.device_get(state.params)
    sharded = shard_state(state, mesh, tower_tp=True)
    w0 = sharded.params["user_features_mlp"][0]["w"]
    assert w0.sharding.shard_shape(w0.shape)[1] == w0.shape[1] // 4

    batch = make_batch(jax.random.key(1), cfg, 32)

    # eval path with TP towers — BEFORE the train step (the step donates the
    # sharded buffers, which on the CPU backend may alias the originals)
    ids = jax.random.randint(jax.random.key(3), (64,), 0, cfg.item_id_hash_size)
    feats = jax.random.normal(jax.random.key(4), (64, cfg.item_features_size))
    ref_corpus = refresh_corpus(params_host, cfg, ids, feats)
    ref = float(make_eval_recall_fn(cfg, 10)(params_host, ref_corpus, batch))
    pad_ids, pad_feats, valid_c = pad_catalog(ids, feats, mesh)
    corpus = make_sharded_refresh_fn(cfg, mesh, tower_tp=True)(
        sharded.params, pad_ids, pad_feats
    )
    got = float(
        make_sharded_recall_fn(cfg, mesh, 10, tower_tp=True)(
            sharded.params, corpus, batch, valid_c
        )
    )
    assert got == pytest.approx(ref, abs=1e-6)

    step = make_sharded_train_step(cfg, tcfg, mesh, mesh_cfg)
    new_state, metrics = step(sharded, batch)
    assert np.isfinite(float(metrics["loss"]))


@requires_8
def test_gspmd_tower_tp_parity():
    """GSPMD + tower_tp: the TP shardings are spec-driven — the partitioned
    step must match the single-chip loss with MLP params model-sharded."""
    from two_tower_models_tpu.parallel.train_step import make_gspmd_train_step

    cfg = _small_preset("two_tower_base_retrieval")
    mesh = make_mesh(MeshConfig(data=2, model=4))
    mesh_cfg = MeshConfig(data=2, model=4, tower_tp=True)
    tcfg = TrainConfig(batch_size=32, learning_rate=1e-3)
    state = create_train_state(jax.random.key(0), cfg, tcfg)
    batch = make_batch(jax.random.key(1), cfg, 32)

    ref_loss, _ = two_tower.train_loss(state.params, cfg, batch)

    sharded = shard_state(state, mesh, tower_tp=True)
    w0 = sharded.params["user_features_mlp"][0]["w"]
    assert w0.sharding.shard_shape(w0.shape)[1] == w0.shape[1] // 4
    step = make_gspmd_train_step(cfg, tcfg, mesh, mesh_cfg)
    new_state, metrics = step(sharded, batch)
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss), rtol=1e-5)
    # updated MLP params keep their TP sharding
    w0b = new_state.params["user_features_mlp"][0]["w"]
    assert w0b.sharding.shard_shape(w0b.shape)[1] == w0b.shape[1] // 4


@requires_8
def test_gspmd_gradients_match_single_chip_with_kernels():
    """GSPMD path WITH Pallas kernels (shard_map islands): gradients through
    the partitioned program equal the unsharded gradients (VERDICT r1 #6 —
    the round-1 test compared only the loss scalar, and kernels were
    banned outright)."""
    import dataclasses

    from two_tower_models_tpu.parallel.islands import kernel_islands
    from two_tower_models_tpu.parallel.sharding import param_pspecs
    from jax.sharding import NamedSharding

    cfg = dataclasses.replace(
        CFG,
        fused_loss=True,
        history_encoder=dataclasses.replace(
            CFG.history_encoder, fused_encoder=True
        ),
    )
    mesh = make_mesh(MeshConfig(data=4, model=2))
    params = two_tower.init_params(jax.random.key(0), cfg)
    batch = make_batch(jax.random.key(1), cfg, 32)

    def loss(p, b):
        return two_tower.train_loss(p, cfg, b)[0]

    g_ref = jax.grad(loss)(params, batch)  # single-chip, kernels on

    to_sh = lambda s: NamedSharding(mesh, s)
    p_sh = jax.tree_util.tree_map(to_sh, param_pspecs(params))
    b_sh = type(batch)(*([to_sh(P(DATA_AXIS))] * 7))
    gspmd_grad = jax.jit(jax.grad(loss), in_shardings=(p_sh, b_sh))
    with kernel_islands(mesh):
        g_gspmd = gspmd_grad(params, batch)

    flat_r = {
        jax.tree_util.keystr(p): g
        for p, g in jax.tree_util.tree_leaves_with_path(g_ref)
    }
    for path, g in jax.tree_util.tree_leaves_with_path(g_gspmd):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_r[key]), rtol=5e-4, atol=1e-6,
            err_msg=f"gspmd grad mismatch at {key}",
        )


@requires_8
def test_gspmd_steps_per_dispatch():
    """K steps per GSPMD dispatch (lax.scan) advance the state K steps and
    produce finite mean metrics."""
    from two_tower_models_tpu.parallel.train_step import make_gspmd_train_step

    mesh = make_mesh(MeshConfig(data=4, model=2))
    tcfg = TrainConfig(batch_size=16, learning_rate=1e-3, steps_per_dispatch=3)
    state = create_train_state(jax.random.key(0), CFG, tcfg)
    state = shard_state(state, mesh)
    batches = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[make_batch(jax.random.key(i), CFG, 16) for i in range(3)],
    )
    step = make_gspmd_train_step(CFG, tcfg, mesh)
    new_state, metrics = step(state, batches)
    assert int(new_state.step) == 3
    assert np.isfinite(float(metrics["loss"]))


@requires_8
def test_gspmd_step_parity_with_single_chip():
    """The GSPMD path (jit + NamedSharding over the single-chip step) must
    match the single-chip step exactly — same traced program, partitioned."""
    from two_tower_models_tpu.parallel.train_step import make_gspmd_train_step

    mesh = make_mesh(MeshConfig(data=4, model=2))
    tcfg = TrainConfig(batch_size=32, learning_rate=1e-3)
    state = create_train_state(jax.random.key(0), CFG, tcfg)
    batch = make_batch(jax.random.key(1), CFG, 32)

    ref_step = make_train_step(CFG, TrainConfig(batch_size=32, donate_state=False))
    from two_tower_models_tpu.training.data import SyntheticRecData

    data = SyntheticRecData(
        user_ids=batch.user_id, user_features=batch.user_features,
        user_history=batch.user_history, item_ids=batch.item_id,
        item_features=batch.item_features, positions=batch.position,
        labels=batch.labels, catalog_ids=jnp.arange(4),
        catalog_features=jnp.zeros((4, CFG.item_features_size)),
    )
    ref_state, ref_metrics = ref_step(state, data, jnp.arange(32))

    sharded = shard_state(state, mesh)
    step = make_gspmd_train_step(CFG, tcfg, mesh)
    new_state, metrics = step(sharded, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    # Post-Adam params are not compared elementwise (first-step g/|g|
    # normalization amplifies float noise on near-zero grads — see
    # test_sharded_gradients_match_single_chip).  The loss equality above is
    # the semantic check: it's the same traced program, partitioned.
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))


@requires_8
def test_packed_table_mesh_routing():
    """Packed [Vp/P, P·D] leaves run on BOTH mesh paths (VERDICT r3 #3):
    the explicit shard_map path row-shards them natively, and since commit
    12d91f6 the GSPMD path partitions the packed gather/scatter exactly like
    a plain table's (trajectory-level packed-vs-plain parity lives in
    tests/test_packed_mesh.py).  Sharded steps donate their state, so every
    entry gets a fresh one."""
    from two_tower_models_tpu.parallel.train_step import make_gspmd_train_step

    tcfg = TrainConfig(
        batch_size=16, pack_tables_min_rows=32, donate_state=False
    )  # force packing
    mesh_cfg = MeshConfig(data=2, model=2)
    mesh = make_mesh(mesh_cfg)
    batch = make_batch(jax.random.key(1), CFG, 16)

    def fresh_state():
        return shard_state(
            create_train_state(
                jax.random.key(0), CFG, tcfg, model_shards=mesh_cfg.model
            ),
            mesh,
        )

    state = fresh_state()
    assert state.params["user_id_table"].shape[-1] != CFG.user_id_embedding_dim

    # explicit shard_map path: packed leaves accepted end to end
    step = make_sharded_train_step(CFG, tcfg, mesh, mesh_cfg)
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # GSPMD path: packed leaves accepted too (partitioned like plain ones)
    gspmd = make_gspmd_train_step(CFG, tcfg, mesh, mesh_cfg)
    _, metrics_g = gspmd(fresh_state(), batch)
    assert np.isfinite(float(metrics_g["loss"]))

    # pack=False works on the same explicit step (shape-keyed retrace)
    state2 = create_train_state(jax.random.key(0), CFG, tcfg, pack=False)
    state2 = shard_state(state2, mesh)
    _, metrics2 = step(state2, batch)
    assert np.isfinite(float(metrics2["loss"]))
