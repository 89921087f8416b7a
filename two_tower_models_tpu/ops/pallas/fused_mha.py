"""Fully-fused multi-head self-attention layer — Pallas TPU kernels.

Motivation (measured, BASELINE.md): XLA lowers the standard head-split
attention ([B, nh, H, hd]) with hd = D/nh = 16 in the minor dimension; TPU
pads minor dims to 128 lanes, inflating HBM traffic ~8x, and relayouts the
134 MB activations repeatedly — 13 ms forward + 31 ms backward per layer at
B = 16384, H = 32, D = 64 where the pure matmul cost is < 1 ms.

This kernel computes the ENTIRE layer per batch tile inside VMEM:

    qkv = x @ W_in + b_in                      (MXU, D-lane layouts only)
    per head h:  S_h = (q . m_h) K^T / sqrt(hd)    (masked full-D contraction:
                 m_h zeroes other heads' columns, so no hd-minor tensor ever
                 exists; the extra flops are nh x on a tiny matmul)
                 out += softmax(S_h) (v . m_h)
    y = out @ W_out + b_out

HBM traffic: read x once, write y once (+ weights).  The backward kernel
recomputes attention per tile and accumulates weight gradients across the
sequential grid.  Forward-for-inference and custom-VJP training paths both
parity-tested against the dense reference in interpret mode and on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _head_mask(h: int, hd: int, d: int):
    """[1, 1, D] one-hot column mask for head h, built in-kernel (iota —
    Pallas forbids captured host constants)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    return (col // hd == h).astype(jnp.float32)


def _attend(q, k, v, num_heads, hd, h_true):
    """Per-head masked-contraction attention on VMEM-resident [TB, H, D]
    tensors.  Returns [TB, H, D].  Shared by fwd and bwd kernels."""
    scale = 1.0 / (hd**0.5)
    tb, hp, d = q.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, hp, hp), 2)
    out = jnp.zeros_like(v)
    probs = []
    for h in range(num_heads):
        m = _head_mask(h, hd, d)
        s = (
            jax.lax.dot_general(
                q * m, k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [TB, H, H]
        s = jnp.where(col < h_true, s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        probs.append(p)
        out = out + jax.lax.dot_general(
            p, v * m,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    return out, probs


def _fwd_kernel(
    x_ref, wi_ref, bi_ref, wo_ref, bo_ref, y_ref, *, num_heads, h_true
):
    tb, hp, d = x_ref.shape
    hd = d // num_heads

    x2 = x_ref[...].reshape(tb * hp, d)
    qkv = (
        jnp.dot(x2, wi_ref[...], preferred_element_type=jnp.float32)
        + bi_ref[...]
    )  # [TB*H, 3D]
    q = qkv[:, :d].reshape(tb, hp, d)
    k = qkv[:, d : 2 * d].reshape(tb, hp, d)
    v = qkv[:, 2 * d :].reshape(tb, hp, d)

    out, _ = _attend(q, k, v, num_heads, hd, h_true)
    y2 = (
        jnp.dot(out.reshape(tb * hp, d), wo_ref[...], preferred_element_type=jnp.float32)
        + bo_ref[...]
    )
    y_ref[...] = y2.reshape(tb, hp, d).astype(y_ref.dtype)


def _bwd_kernel(
    x_ref, g_ref, wi_ref, bi_ref, wo_ref, bo_ref,
    dx_ref, dwi_ref, dbi_ref, dwo_ref, dbo_ref,
    *, num_heads, h_true,
):
    tb, hp, d = x_ref.shape
    hd = d // num_heads
    scale = 1.0 / (hd**0.5)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    # --- recompute forward ---
    x2 = x_ref[...].reshape(tb * hp, d)
    qkv = (
        jnp.dot(x2, wi_ref[...], preferred_element_type=jnp.float32)
        + bi_ref[...]
    )
    q = qkv[:, :d].reshape(tb, hp, d)
    k = qkv[:, d : 2 * d].reshape(tb, hp, d)
    v = qkv[:, 2 * d :].reshape(tb, hp, d)
    attn_out, probs = _attend(q, k, v, num_heads, hd, h_true)

    # --- output projection backward ---
    g2 = g_ref[...].reshape(tb * hp, d).astype(jnp.float32)
    ao2 = attn_out.reshape(tb * hp, d)
    dwo_ref[...] += jax.lax.dot_general(
        ao2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D, D]
    dbo_ref[...] += jnp.sum(g2, axis=0, keepdims=True)
    do = jnp.dot(
        g2, wo_ref[...].T, preferred_element_type=jnp.float32
    ).reshape(tb, hp, d)

    # --- attention backward per head ---
    dq = jnp.zeros_like(q)
    dk = jnp.zeros_like(k)
    dv = jnp.zeros_like(v)
    for h in range(num_heads):
        m = _head_mask(h, hd, d)
        p = probs[h]  # [TB, H, H]
        vm = v * m
        # dP = do @ vm^T
        dp = jax.lax.dot_general(
            do, vm, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TB, H, H]
        # dv += (P^T @ do) . m   (contract over query axis)
        dv = dv + jax.lax.dot_general(
            p, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * m
        # softmax backward
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # [TB, H, H]
        ds = ds * scale
        # dq += (dS @ K) . m
        dq = dq + jax.lax.dot_general(
            ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * m
        # dk += dS^T @ (Q . m)   (contract over query axis)
        dk = dk + jax.lax.dot_general(
            ds, q * m, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    dqkv = jnp.concatenate(
        [
            dq.reshape(tb * hp, d),
            dk.reshape(tb * hp, d),
            dv.reshape(tb * hp, d),
        ],
        axis=1,
    )  # [TB*H, 3D]
    dx2 = jnp.dot(dqkv, wi_ref[...].T, preferred_element_type=jnp.float32)
    dx_ref[...] = dx2.reshape(tb, hp, d).astype(dx_ref.dtype)
    dwi_ref[...] += jax.lax.dot_general(
        x2, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [D, 3D]
    dbi_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)


def _pad_bh(x, tb, hp):
    b, h, d = x.shape
    return jnp.pad(
        x.astype(jnp.float32), ((0, _round_up(b, tb) - b), (0, hp - h), (0, 0))
    )


def _fwd_impl(x, w_in, b_in, w_out, b_out, num_heads, tile_b):
    b, h_true, d = x.shape
    hp = _round_up(h_true, 8)
    xp = _pad_bh(x, tile_b, hp)
    bp = xp.shape[0]
    grid = (bp // tile_b,)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, h_true=h_true),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, hp, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * hp * d * (4 * d + 2 * num_heads * hp),
            bytes_accessed=2 * bp * hp * d * 4,
            transcendentals=bp * hp * hp * num_heads,
        ),
        interpret=_interpret(),
    )(xp, w_in, b_in.reshape(1, -1), w_out, b_out.reshape(1, -1))
    return y[:b, :h_true].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_mha_layer(
    x: jnp.ndarray,  # [B, H, D]
    w_in: jnp.ndarray,  # [D, 3D]
    b_in: jnp.ndarray,  # [3D]
    w_out: jnp.ndarray,  # [D, D]
    b_out: jnp.ndarray,  # [D]
    num_heads: int,
    tile_b: int = 64,
) -> jnp.ndarray:
    """Whole attention layer (QKV proj + MHA + out proj) in one kernel."""
    return _fwd_impl(x, w_in, b_in, w_out, b_out, num_heads, tile_b)


def _vjp_fwd(x, w_in, b_in, w_out, b_out, num_heads, tile_b):
    y = _fwd_impl(x, w_in, b_in, w_out, b_out, num_heads, tile_b)
    return y, (x, w_in, b_in, w_out, b_out)


def _vjp_bwd(num_heads, tile_b, res, g):
    x, w_in, b_in, w_out, b_out = res
    b, h_true, d = x.shape
    # The backward kernel holds ~2x the forward's live VMEM (recomputed
    # probs for all heads + dq/dk/dv + the concat); halve the tile to stay
    # under the 16 MB scoped limit (tile 64 OOMs at H=32, D=64 — measured).
    tile_b = max(16, tile_b // 2)
    hp = _round_up(h_true, 8)
    xp = _pad_bh(x, tile_b, hp)
    gp = _pad_bh(g, tile_b, hp)
    bp = xp.shape[0]
    grid = (bp // tile_b,)
    const = lambda i: (0, 0)
    dx, dwi, dbi, dwo, dbo = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, h_true=h_true),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, hp, d), jnp.float32),
            jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(xp, gp, w_in, b_in.reshape(1, -1), w_out, b_out.reshape(1, -1))
    return (
        dx[:b, :h_true].astype(x.dtype),
        dwi.astype(w_in.dtype),
        dbi[0].astype(b_in.dtype),
        dwo.astype(w_out.dtype),
        dbo[0].astype(b_out.dtype),
    )


fused_mha_layer.defvjp(_vjp_fwd, _vjp_bwd)


def mha_layer_reference(x, w_in, b_in, w_out, b_out, num_heads):
    """Dense head-split reference (same math) for parity tests."""
    b, h, d = x.shape
    hd = d // num_heads
    qkv = x @ w_in + b_in
    q, k, v = jnp.split(qkv, 3, axis=-1)
    heads = lambda t: t.reshape(b, h, num_heads, hd).transpose(0, 2, 1, 3)
    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum("bnqd,bnkd->bnqk", q, k) / (hd**0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnqk,bnkd->bnqd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(b, h, d)
    return o @ w_out + b_out
