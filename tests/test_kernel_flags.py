"""AUTO Pallas-kernel-flag resolution (config.resolve_kernel_flags).

Round-5 finding: with plain ``False`` defaults, the training loop silently
ran the dense XLA encoder/loss at ~4.7x the kernelized step time on TPU
(31.2 vs 6.6 ms at the bench shape) — only bench.py, which sets the flags
explicitly, got the kernels.  ``None`` now means "enabled iff the default
backend is TPU", resolved once at every entry point.  These tests run on
the forced-CPU backend, so AUTO must resolve to False here; the TPU side is
covered by the hardware sweep (the trainer and bench then agree).
"""

import dataclasses

from two_tower_models_tpu.config import (
    HistoryEncoderConfig,
    ModelConfig,
    preset,
    resolve_kernel_flags,
)

BASE = dict(
    user_id_hash_size=64, user_id_embedding_dim=8,
    item_id_hash_size=64, item_id_embedding_dim=8,
    user_features_size=4, item_features_size=4,
    user_value_weights=(1.0,), num_items=4, history_len=4,
)


def test_auto_defaults_are_none():
    cfg = preset("two_tower_with_user_history_encoder", **BASE)
    assert cfg.fused_loss is None
    assert cfg.history_encoder.fused_encoder is None


def test_auto_resolves_false_on_cpu():
    cfg = resolve_kernel_flags(
        preset("two_tower_with_user_history_encoder", **BASE)
    )
    assert cfg.fused_loss is False
    assert cfg.history_encoder.fused_encoder is False


def test_explicit_values_pass_through():
    cfg = ModelConfig(
        **BASE,
        history_encoder=HistoryEncoderConfig(fused_encoder=True),
        fused_loss=True,
    )
    out = resolve_kernel_flags(cfg)
    assert out.fused_loss is True
    assert out.history_encoder.fused_encoder is True
    # and explicit False stays False even where auto would pick the backend
    cfg_f = dataclasses.replace(
        cfg,
        fused_loss=False,
        history_encoder=HistoryEncoderConfig(fused_encoder=False),
    )
    out_f = resolve_kernel_flags(cfg_f)
    assert out_f.fused_loss is False
    assert out_f.history_encoder.fused_encoder is False


def test_explicit_kernel_tier_wins_over_auto():
    # a user who chose the per-layer or blockwise kernel keeps it: auto must
    # not stack the whole-encoder kernel on top
    cfg = ModelConfig(
        **BASE, history_encoder=HistoryEncoderConfig(fused_kernel=True)
    )
    out = resolve_kernel_flags(cfg)
    assert out.history_encoder.fused_encoder is False
    assert out.history_encoder.fused_kernel is True


def test_unresolved_none_reads_as_dense_path():
    # truthiness contract: every consumer gates with `if cfg.fused_loss:` /
    # `if cfg.fused_encoder:`, so an unresolved None must act like False
    cfg = preset("two_tower_with_user_history_encoder", **BASE)
    assert not cfg.fused_loss
    assert not cfg.history_encoder.fused_encoder


def test_zoo_builder_resolves():
    from two_tower_models_tpu.models import zoo

    model = zoo.two_tower_with_user_history_encoder(
        num_items=4,
        user_id_hash_size=64, user_id_embedding_dim=8, user_features_size=4,
        item_id_hash_size=64, item_id_embedding_dim=8, item_features_size=4,
        user_value_weights=[1.0], user_history_seqlen=4,
    )
    assert model.cfg.fused_loss is not None
    assert model.cfg.history_encoder.fused_encoder is not None
