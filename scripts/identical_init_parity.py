"""Identical-init injection parity: inject THE SAME weights into the torch
reference and this framework, feed THE SAME batch, and compare the training
loss and inference top-k exactly.

Distribution tests (scripts/parity_vs_reference.py) show the loss CURVES
match across seeds; this removes init variance entirely and checks the loss
RECIPE is the same function, to float tolerance, on the base-retrieval
config (SURVEY §2.2 semantics; the reference's runnable surface).

``--import_check`` verifies the OPPOSITE direction through the public
interop API (two_tower_models_tpu.interop): a TORCH-initialized reference's
``state_dict()`` imports via ``params_from_reference_state_dict`` and
reproduces the torch train loss — the migration path for reference users
with existing checkpoints.

Run: PYTHONPATH=/root/reference python scripts/identical_init_parity.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the torch reference lives outside the repo; auto-locate the default mount
if os.path.isdir("/root/reference") and "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

import numpy as np

U, I, DU, DI, IU, II, B, C = 128, 256, 24, 16, 6, 6, 32, 64
T = 2
UVW = [1.0, 0.5]
NUM_ITEMS = 10


def _import_check():
    """Torch-initialized reference -> state_dict -> interop import -> same
    loss.  Covers base and history+position-debias (the reference's runnable,
    shape-clean surface — see _history_variant on why combined-debias can't
    match bitwise)."""
    import jax
    import jax.numpy as jnp
    import torch

    from two_tower_models_tpu.config import Debias, HistoryEncoderConfig, ModelConfig
    from two_tower_models_tpu.interop import params_from_reference_state_dict
    from two_tower_models_tpu.models import two_tower

    from src.baseline_mips_module import BaselineMIPSModule
    from src.two_tower_base_retrieval import TwoTowerBaseRetrieval
    from src.two_tower_with_position_debiased_weights import (
        TwoTowerWithPositionDebiasedWeights,
    )

    H = 8
    all_ok = True
    for name, make_ref, cfg in (
        (
            "two_tower_base_retrieval",
            lambda m: TwoTowerBaseRetrieval(
                num_items=NUM_ITEMS,
                user_id_hash_size=U, user_id_embedding_dim=DU,
                user_features_size=IU,
                item_id_hash_size=I, item_id_embedding_dim=DI,
                item_features_size=II,
                user_value_weights=UVW, mips_module=m,
            ),
            ModelConfig(
                user_id_hash_size=U, user_id_embedding_dim=DU,
                item_id_hash_size=I, item_id_embedding_dim=DI,
                user_features_size=IU, item_features_size=II,
                user_value_weights=tuple(UVW), num_items=NUM_ITEMS,
                history_len=1,
            ),
        ),
        (
            "two_tower_with_position_debiased_weights",
            lambda m: TwoTowerWithPositionDebiasedWeights(
                num_items=NUM_ITEMS,
                user_id_hash_size=U, user_id_embedding_dim=DU,
                user_features_size=IU, user_history_seqlen=H,
                item_id_hash_size=I, item_id_embedding_dim=DI,
                item_features_size=II,
                user_value_weights=UVW, mips_module=m,
            ),
            ModelConfig(
                user_id_hash_size=U, user_id_embedding_dim=DU,
                item_id_hash_size=I, item_id_embedding_dim=DI,
                user_features_size=IU, item_features_size=II,
                user_value_weights=tuple(UVW), num_items=NUM_ITEMS,
                history_len=H, history_encoder=HistoryEncoderConfig(),
                debias=Debias.POSITION,
            ),
        ),
    ):
        torch.manual_seed(7)
        ref = make_ref(BaselineMIPSModule(corpus_size=C, embedding_dim=DI))
        params = params_from_reference_state_dict(ref.state_dict(), cfg)

        rng = np.random.default_rng(2)
        hlen = cfg.history_len
        user_id = rng.integers(0, U, B)
        user_feat = rng.normal(size=(B, IU)).astype(np.float32)
        hist = rng.integers(0, I, (B, hlen))
        item_id = rng.integers(0, I, B)
        item_feat = rng.normal(size=(B, II)).astype(np.float32)
        position = rng.integers(0, 100, B)
        labels = rng.integers(0, 2, (B, T)).astype(np.float32)

        with torch.no_grad():
            loss_t = ref.train_forward(
                torch.from_numpy(user_id), torch.from_numpy(user_feat),
                torch.from_numpy(hist), torch.from_numpy(item_id),
                torch.from_numpy(item_feat), torch.from_numpy(position),
                torch.from_numpy(labels),
            )
        batch = two_tower.Batch(
            user_id=jnp.asarray(user_id), user_features=jnp.asarray(user_feat),
            user_history=jnp.asarray(hist), item_id=jnp.asarray(item_id),
            item_features=jnp.asarray(item_feat),
            position=jnp.asarray(position), labels=jnp.asarray(labels),
        )
        loss_j, _ = two_tower.train_loss(params, cfg, batch)
        gap = abs(float(loss_t) - float(loss_j))
        ok = gap < 1e-4 * max(1.0, abs(float(loss_t)))
        all_ok = all_ok and ok
        print(json.dumps({
            "import_check": name,
            "train_loss_torch": round(float(loss_t), 8),
            "train_loss_jax_imported": round(float(loss_j), 8),
            "abs_gap": gap,
            "loss_parity": bool(ok),
        }))
    return all_ok


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from two_tower_models_tpu.config import ModelConfig
    from two_tower_models_tpu.models import two_tower

    from src.baseline_mips_module import BaselineMIPSModule
    from src.two_tower_base_retrieval import TwoTowerBaseRetrieval

    rng = np.random.default_rng(0)
    cfg = ModelConfig(
        user_id_hash_size=U, user_id_embedding_dim=DU,
        item_id_hash_size=I, item_id_embedding_dim=DI,
        user_features_size=IU, item_features_size=II,
        user_value_weights=tuple(UVW), num_items=NUM_ITEMS, history_len=1,
    )
    params = two_tower.init_params(jax.random.key(0), cfg)

    torch.manual_seed(0)
    mips = BaselineMIPSModule(corpus_size=C, embedding_dim=DI)
    ref = TwoTowerBaseRetrieval(
        num_items=NUM_ITEMS,
        user_id_hash_size=U, user_id_embedding_dim=DU, user_features_size=IU,
        item_id_hash_size=I, item_id_embedding_dim=DI, item_features_size=II,
        user_value_weights=UVW, mips_module=mips,
    )

    # ---- inject OUR params into the torch reference --------------------
    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        ref.user_id_embedding_arch.weight.copy_(t(params["user_id_table"]))
        ref.item_id_embedding_arch.weight.copy_(t(params["item_id_table"]))
        for seq, ours in (
            (ref.user_features_arch, params["user_features_mlp"]),
            (ref.item_features_arch, params["item_features_mlp"]),
        ):
            linears = [m for m in seq if isinstance(m, torch.nn.Linear)]
            assert len(linears) == len(ours)
            for lin, layer in zip(linears, ours):
                lin.weight.copy_(t(layer["w"]).T)  # ours [in,out] -> torch [out,in]
                lin.bias.copy_(t(layer["b"]))
        ref.user_tower_arch.weight.copy_(t(params["user_tower_head"]["w"]).T)
        ref.user_tower_arch.bias.copy_(t(params["user_tower_head"]["b"]))
        ref.item_tower_arch.weight.copy_(t(params["item_tower_head"]["w"]).T)
        ref.item_tower_arch.bias.copy_(t(params["item_tower_head"]["b"]))

    # ---- one identical batch -------------------------------------------
    user_id = rng.integers(0, U, B)
    user_feat = rng.normal(size=(B, IU)).astype(np.float32)
    hist = rng.integers(0, I, (B, 1))
    item_id = rng.integers(0, I, B)
    item_feat = rng.normal(size=(B, II)).astype(np.float32)
    position = rng.integers(0, 100, B)
    labels = rng.integers(0, 2, (B, T)).astype(np.float32)

    loss_t = ref.train_forward(
        torch.from_numpy(user_id), torch.from_numpy(user_feat),
        torch.from_numpy(hist), torch.from_numpy(item_id),
        torch.from_numpy(item_feat), torch.from_numpy(position),
        torch.from_numpy(labels),
    )
    batch = two_tower.Batch(
        user_id=jnp.asarray(user_id), user_features=jnp.asarray(user_feat),
        user_history=jnp.asarray(hist), item_id=jnp.asarray(item_id),
        item_features=jnp.asarray(item_feat), position=jnp.asarray(position),
        labels=jnp.asarray(labels),
    )
    loss_j, _ = two_tower.train_loss(params, cfg, batch)

    gap = abs(float(loss_t) - float(loss_j))
    ok_loss = gap < 1e-5 * max(1.0, abs(float(loss_t)))

    # ---- inference: identical corpus -> identical top-k ------------------
    corpus = rng.normal(size=(C, DI)).astype(np.float32)
    mips.corpus = torch.from_numpy(corpus)  # plain attribute in the reference
    idx_t = ref(
        torch.from_numpy(user_id), torch.from_numpy(user_feat),
        torch.from_numpy(hist),
    ).numpy()
    idx_j = np.asarray(
        two_tower.retrieve(
            params, cfg, jnp.asarray(corpus),
            jnp.asarray(user_id), jnp.asarray(user_feat), jnp.asarray(hist),
        )
    )
    # compare as per-row sets (tie order may differ at float equality)
    ok_topk = all(set(a.tolist()) == set(b.tolist()) for a, b in zip(idx_t, idx_j))

    print(json.dumps({
        "model": "two_tower_base_retrieval",
        "train_loss_torch": round(float(loss_t), 8),
        "train_loss_jax": round(float(loss_j), 8),
        "abs_gap": gap,
        "loss_parity": bool(ok_loss),
        "topk_identical": bool(ok_topk),
    }))

    ok_hist = _history_variant()
    ok_import = _import_check()
    return 0 if (ok_loss and ok_topk and ok_hist and ok_import) else 1


def _history_variant():
    """Same injection through the HISTORY + POSITION-DEBIAS tower: covers the
    UserHistoryEncoder (stacked nn.MultiheadAttention + flipped sinusoidal
    PE) and the position-debias hook.  (The combined-debias variant cannot
    match exactly — its reference MSE silently broadcasts [B,1] vs [B], a
    verified defect we fixed; the position variant is shape-clean.)"""
    import jax
    import jax.numpy as jnp
    import torch

    from two_tower_models_tpu.config import Debias, HistoryEncoderConfig, ModelConfig
    from two_tower_models_tpu.models import two_tower

    from src.baseline_mips_module import BaselineMIPSModule
    from src.two_tower_with_position_debiased_weights import (
        TwoTowerWithPositionDebiasedWeights,
    )

    H = 8
    rng = np.random.default_rng(1)
    cfg = ModelConfig(
        user_id_hash_size=U, user_id_embedding_dim=DU,
        item_id_hash_size=I, item_id_embedding_dim=DI,
        user_features_size=IU, item_features_size=II,
        user_value_weights=tuple(UVW), num_items=NUM_ITEMS, history_len=H,
        history_encoder=HistoryEncoderConfig(),  # 4 heads / 3 layers / PE on,
        # matching the reference's hardcoded choice
        debias=Debias.POSITION,
    )
    params = two_tower.init_params(jax.random.key(1), cfg)

    torch.manual_seed(0)
    mips = BaselineMIPSModule(corpus_size=C, embedding_dim=DI)
    ref = TwoTowerWithPositionDebiasedWeights(
        num_items=NUM_ITEMS,
        user_id_hash_size=U, user_id_embedding_dim=DU, user_features_size=IU,
        user_history_seqlen=H,
        item_id_hash_size=I, item_id_embedding_dim=DI, item_features_size=II,
        user_value_weights=UVW, mips_module=mips,
    )

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        ref.user_id_embedding_arch.weight.copy_(t(params["user_id_table"]))
        ref.item_id_embedding_arch.weight.copy_(t(params["item_id_table"]))
        for seq, ours in (
            (ref.user_features_arch, params["user_features_mlp"]),
            (ref.item_features_arch, params["item_features_mlp"]),
        ):
            linears = [m for m in seq if isinstance(m, torch.nn.Linear)]
            for lin, layer in zip(linears, ours):
                lin.weight.copy_(t(layer["w"]).T)
                lin.bias.copy_(t(layer["b"]))
        ref.user_tower_arch.weight.copy_(t(params["user_tower_head"]["w"]).T)
        ref.user_tower_arch.bias.copy_(t(params["user_tower_head"]["b"]))
        ref.item_tower_arch.weight.copy_(t(params["item_tower_head"]["w"]).T)
        ref.item_tower_arch.bias.copy_(t(params["item_tower_head"]["b"]))
        ref.position_bias_net_user_value.weight.copy_(
            t(params["position_bias_table"])
        )
        for mha, ours in zip(
            ref.user_history_encoder.multihead_attn_layers,
            params["history_encoder"]["attn_layers"],
        ):
            mha.in_proj_weight.copy_(t(ours["in_proj"]["w"]).T)
            mha.in_proj_bias.copy_(t(ours["in_proj"]["b"]))
            mha.out_proj.weight.copy_(t(ours["out_proj"]["w"]).T)
            mha.out_proj.bias.copy_(t(ours["out_proj"]["b"]))

    user_id = rng.integers(0, U, B)
    user_feat = rng.normal(size=(B, IU)).astype(np.float32)
    hist = rng.integers(0, I, (B, H))
    item_id = rng.integers(0, I, B)
    item_feat = rng.normal(size=(B, II)).astype(np.float32)
    position = rng.integers(0, 100, B)
    labels = rng.integers(0, 2, (B, T)).astype(np.float32)

    with torch.no_grad():
        loss_t = ref.train_forward(
            torch.from_numpy(user_id), torch.from_numpy(user_feat),
            torch.from_numpy(hist), torch.from_numpy(item_id),
            torch.from_numpy(item_feat), torch.from_numpy(position),
            torch.from_numpy(labels),
        )
    batch = two_tower.Batch(
        user_id=jnp.asarray(user_id), user_features=jnp.asarray(user_feat),
        user_history=jnp.asarray(hist), item_id=jnp.asarray(item_id),
        item_features=jnp.asarray(item_feat), position=jnp.asarray(position),
        labels=jnp.asarray(labels),
    )
    loss_j, _ = two_tower.train_loss(params, cfg, batch)
    gap = abs(float(loss_t) - float(loss_j))
    ok = gap < 1e-4 * max(1.0, abs(float(loss_t)))
    print(json.dumps({
        "model": "two_tower_with_position_debiased_weights (history encoder)",
        "train_loss_torch": round(float(loss_t), 8),
        "train_loss_jax": round(float(loss_j), 8),
        "abs_gap": gap,
        "loss_parity": bool(ok),
    }))
    return ok


if __name__ == "__main__":
    if "--import_check" in sys.argv[1:]:
        import jax

        jax.config.update("jax_platforms", "cpu")
        sys.exit(0 if _import_check() else 1)
    sys.exit(main())
