"""Per-example history lengths (VERDICT r2 #8): every encoder tier must
equal a per-example TRUNCATED run — run the encoder on history[:L] alone and
the length-masked full-width run must reproduce it (mean over L, keys
masked, PE flipped at L)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import make_batch
from two_tower_models_tpu.config import (
    DataConfig,
    HistoryEncoderConfig,
    ModelConfig,
    TrainConfig,
    preset,
)
from two_tower_models_tpu.models import two_tower
from two_tower_models_tpu.models.history_encoder import (
    history_encoder_apply,
    history_encoder_init,
)

H, D, NH, NL = 12, 16, 2, 2
B = 8


def _params(key=0):
    cfg = HistoryEncoderConfig(num_heads=NH, num_layers=NL)
    return history_encoder_init(jax.random.key(key), D, cfg), cfg


def _lengths(key=1):
    # cover the extremes: full-length, length-1, and a mix
    lens = jax.random.randint(jax.random.key(key), (B,), 1, H + 1)
    return lens.at[0].set(H).at[1].set(1)


@pytest.mark.parametrize(
    "tier",
    ["dense", "blockwise", "fused_layer", "fused_encoder"],
)
@pytest.mark.parametrize("use_pe", [True, False])
def test_truncated_equivalence(tier, use_pe):
    params, cfg = _params()
    cfg = dataclasses.replace(
        cfg,
        use_positional_encoding=use_pe,
        blockwise_kernel=tier == "blockwise",
        fused_kernel=tier == "fused_layer",
        fused_encoder=tier == "fused_encoder",
    )
    emb = jax.random.normal(jax.random.key(2), (B, H, D))
    lens = _lengths()

    got = history_encoder_apply(params, emb, cfg, lengths=lens)  # [B, 2, D]

    # oracle: per-example truncated DENSE run (kernel tiers must agree with
    # the dense semantics, which their own no-length parity tests pin)
    dense_cfg = dataclasses.replace(
        cfg, blockwise_kernel=False, fused_kernel=False, fused_encoder=False
    )
    for b in range(B):
        L = int(lens[b])
        want = history_encoder_apply(
            params, emb[b : b + 1, :L, :], dense_cfg
        )  # [1, 2, D]
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(want[0]), rtol=2e-4, atol=2e-5,
            err_msg=f"tier={tier} example={b} L={L}",
        )


def test_full_lengths_match_no_lengths():
    """lengths == H everywhere must be numerically identical to lengths=None."""
    params, cfg = _params()
    emb = jax.random.normal(jax.random.key(3), (B, H, D))
    full = jnp.full((B,), H, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(history_encoder_apply(params, emb, cfg, lengths=full)),
        np.asarray(history_encoder_apply(params, emb, cfg)),
        rtol=1e-6,
        atol=1e-7,
    )


@pytest.mark.parametrize("tier", ["dense", "fused_encoder"])
def test_gradients_flow_and_ignore_padding(tier):
    """Gradients w.r.t. the history embeddings are zero at padded positions
    and match the truncated run at valid ones."""
    params, cfg = _params()
    cfg = dataclasses.replace(cfg, fused_encoder=tier == "fused_encoder")
    emb = jax.random.normal(jax.random.key(4), (B, H, D))
    lens = _lengths()

    def loss(e):
        return jnp.sum(history_encoder_apply(params, e, cfg, lengths=lens) ** 2)

    g = jax.grad(loss)(emb)
    pos = np.arange(H)
    for b in range(B):
        L = int(lens[b])
        np.testing.assert_array_equal(
            np.asarray(g[b, L:, :]), np.zeros((H - L, D)), err_msg=f"b={b}"
        )
        assert np.abs(np.asarray(g[b, :L, :])).max() > 0

    dense_cfg = dataclasses.replace(cfg, fused_encoder=False)
    b = 2
    L = int(lens[b])

    def loss_trunc(e_b):
        return jnp.sum(
            history_encoder_apply(params, e_b[None], dense_cfg) ** 2
        )

    g_trunc = jax.grad(loss_trunc)(emb[b, :L, :])
    np.testing.assert_allclose(
        np.asarray(g[b, :L, :]), np.asarray(g_trunc), rtol=2e-4, atol=2e-5
    )


def test_train_loss_accepts_history_len():
    cfg = preset(
        "two_tower_with_debiasing",
        user_id_hash_size=64,
        user_id_embedding_dim=16,
        item_id_hash_size=64,
        item_id_embedding_dim=16,
        user_features_size=8,
        item_features_size=8,
        feature_hidden_dim=16,
        history_len=H,
        history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
    )
    params = two_tower.init_params(jax.random.key(0), cfg)
    batch = make_batch(jax.random.key(1), cfg, B)
    lens = _lengths()
    pos = jnp.arange(H)
    # truncating by hand must give the same loss as masking via history_len
    hist_masked = jnp.where(pos[None, :] < lens[:, None], batch.user_history, 3)
    b_len = batch._replace(user_history=hist_masked, history_len=lens)
    hist_same_pad = jnp.where(pos[None, :] < lens[:, None], batch.user_history, 5)
    b_len2 = batch._replace(user_history=hist_same_pad, history_len=lens)
    l1, _ = two_tower.train_loss(params, cfg, b_len)
    l2, _ = two_tower.train_loss(params, cfg, b_len2)
    # padding CONTENT is invisible once lengths mask it
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(lambda p: two_tower.train_loss(p, cfg, b_len)[0])(params)
    assert np.isfinite(float(l1))
    assert float(jnp.abs(g1["item_id_table"]).sum()) > 0


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 (virtual) devices")
def test_lengths_through_kernel_islands():
    """GSPMD path: the encoder kernels run in shard_map islands with the
    lengths sharded over data alongside the batch."""
    from two_tower_models_tpu.config import MeshConfig
    from two_tower_models_tpu.parallel.islands import kernel_islands
    from two_tower_models_tpu.parallel.mesh import make_mesh

    params, cfg = _params()
    cfg = dataclasses.replace(cfg, fused_encoder=True)
    dense_cfg = dataclasses.replace(cfg, fused_encoder=False)
    emb = jax.random.normal(jax.random.key(5), (B, H, D))
    lens = _lengths()
    mesh = make_mesh(MeshConfig(data=4, model=2))
    with kernel_islands(mesh):
        got = jax.jit(
            lambda p, e, L: history_encoder_apply(p, e, cfg, lengths=L)
        )(params, emb, lens)
    want = history_encoder_apply(params, emb, dense_cfg, lengths=lens)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_variable_history_end_to_end_training():
    """Trainer loop with DataConfig.variable_history: loss decreases and
    eval runs (history_len flows through step + recall paths)."""
    from two_tower_models_tpu.config import ExperimentConfig
    from two_tower_models_tpu.training.loop import train
    from two_tower_models_tpu.utils.logging import JsonlLogger

    exp = ExperimentConfig(
        model=preset(
            "two_tower_with_user_history_encoder",
            user_id_hash_size=64,
            user_id_embedding_dim=16,
            item_id_hash_size=64,
            item_id_embedding_dim=16,
            user_features_size=8,
            item_features_size=8,
            feature_hidden_dim=16,
            history_len=6,
            history_encoder=HistoryEncoderConfig(num_heads=2, num_layers=1),
        ),
        data=DataConfig(
            num_samples=256, num_users=64, num_items=64, history_len=6,
            variable_history=True,
        ),
        train=TrainConfig(batch_size=32, num_epochs=2, log_every=0),
    )
    summary = train(exp, JsonlLogger(echo=False))
    assert np.isfinite(summary["final_loss"])
    assert summary["epoch_losses"][-1] < summary["epoch_losses"][0]
    assert 0.0 <= summary["recall_at_k"] <= 1.0
