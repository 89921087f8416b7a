"""Whole-encoder Pallas kernel (ops/pallas/fused_encoder.py) vs the dense
history-encoder path.  Runs in interpret mode on the forced-CPU test backend
(tests/conftest.py); the same code compiles via Mosaic on TPU."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from two_tower_models_tpu.config import HistoryEncoderConfig
from two_tower_models_tpu.models.history_encoder import (
    history_encoder_apply,
    history_encoder_init,
)
from two_tower_models_tpu.ops.pallas.fused_encoder import fused_history_encoder


def _setup(b, h, d, nh, nl, seed=0):
    cfg = HistoryEncoderConfig(num_heads=nh, num_layers=nl)
    params = history_encoder_init(jax.random.key(seed), d, cfg)
    x = jax.random.normal(jax.random.key(seed + 1), (b, h, d), jnp.float32)
    return cfg, params, x


@pytest.mark.parametrize(
    "b,h,d,nh,nl",
    [
        (48, 32, 64, 4, 3),  # flagship shape (padded batch: 48 % 64 != 0)
        (64, 10, 64, 2, 1),  # h needs sublane padding; single layer
        (130, 16, 128, 4, 2),
    ],
)
def test_forward_matches_dense(b, h, d, nh, nl):
    cfg, params, x = _setup(b, h, d, nh, nl)
    ref = history_encoder_apply(params, x, cfg)
    out = history_encoder_apply(
        params, x, dataclasses.replace(cfg, fused_encoder=True)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_forward_no_positional_encoding():
    cfg, params, x = _setup(32, 8, 64, 2, 2)
    cfg = dataclasses.replace(cfg, use_positional_encoding=False)
    ref = history_encoder_apply(params, x, cfg)
    out = history_encoder_apply(
        params, x, dataclasses.replace(cfg, fused_encoder=True)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "b,h,d,nh,nl",
    [
        (48, 32, 64, 4, 3),  # flagship
        (64, 10, 64, 2, 1),  # single layer: the ps-less residual path
    ],
)
def test_vjp_matches_dense(b, h, d, nh, nl):
    cfg, params, x = _setup(b, h, d, nh, nl)

    def loss(variant_cfg):
        def f(p, xx):
            out = history_encoder_apply(p, xx, variant_cfg)
            # weight both output rows asymmetrically so mean-pool and
            # attention-path grads are distinguishable
            w = jnp.asarray([1.0, 0.25])[None, :, None]
            return jnp.sum((out * w) ** 2)

        return jax.grad(f, argnums=(0, 1))(params, x)

    g_ref = loss(cfg)
    g_fused = loss(dataclasses.replace(cfg, fused_encoder=True))
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves(g_fused)
    for (path, a), b_ in zip(flat_ref, flat_fused):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=5e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pe_gradient_matches_dense():
    """The PE argument is differentiable: its cotangent must match autodiff
    through the dense path (a learnable-PE caller relies on this)."""
    cfg, params, x = _setup(48, 16, 64, 4, 2)
    pe = jax.random.normal(jax.random.key(9), (16, 64), jnp.float32) * 0.1
    layers = params["attn_layers"]
    stacked = (
        jnp.stack([l["in_proj"]["w"] for l in layers]),
        jnp.stack([l["in_proj"]["b"] for l in layers]),
        jnp.stack([l["out_proj"]["w"] for l in layers]),
        jnp.stack([l["out_proj"]["b"] for l in layers]),
    )

    def dense_fn(pe_):
        # dense equivalent: add pe, run layers, take (row0, mean-of-input)
        h = x + pe_[None]
        from two_tower_models_tpu.ops.pallas.fused_mha import mha_layer_reference

        for l in layers:
            h = mha_layer_reference(
                h, l["in_proj"]["w"], l["in_proj"]["b"],
                l["out_proj"]["w"], l["out_proj"]["b"], 4,
            )
        out = jnp.stack([h[:, 0, :], jnp.mean(x, axis=1)], axis=1)
        return jnp.sum(out**2)

    def fused_fn(pe_):
        return jnp.sum(fused_history_encoder(x, pe_, *stacked, 4) ** 2)

    g_ref = jax.grad(dense_fn)(pe)
    g_fused = jax.grad(fused_fn)(pe)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=5e-4, atol=5e-4
    )


def test_weight_grads_accumulate_across_tiles():
    # grads must be identical whether the batch spans 1 grid tile or many
    cfg, params, x = _setup(128, 16, 64, 4, 2)
    pe = jnp.zeros((16, 64), jnp.float32)
    layers = params["attn_layers"]
    args = (
        jnp.stack([l["in_proj"]["w"] for l in layers]),
        jnp.stack([l["in_proj"]["b"] for l in layers]),
        jnp.stack([l["out_proj"]["w"] for l in layers]),
        jnp.stack([l["out_proj"]["b"] for l in layers]),
    )

    def gw(tile):
        f = lambda wi: jnp.sum(
            fused_history_encoder(x, pe, wi, args[1], args[2], args[3], 4, tile) ** 2
        )
        return jax.grad(f)(args[0])

    np.testing.assert_allclose(
        np.asarray(gw(128)), np.asarray(gw(32)), rtol=2e-4, atol=2e-4
    )


def test_bf16_input_close_to_f32():
    cfg, params, x = _setup(64, 32, 64, 4, 3)
    fcfg = dataclasses.replace(cfg, fused_encoder=True)
    ref = history_encoder_apply(params, x, fcfg)
    out = history_encoder_apply(params, x, fcfg, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.06, atol=0.06
    )
