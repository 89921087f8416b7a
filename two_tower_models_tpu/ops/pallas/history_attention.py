"""Blockwise (flash-style) self-attention over the user-history axis.

The reference runs full O(H^2) ``nn.MultiheadAttention`` per layer
(user_history_encoder.py:103-108) and punts on long histories.  This kernel
computes the same unmasked self-attention with an online softmax over
key/value tiles, so the [H, H] score matrix never materializes — the seam
where ring/context-parallel attaches if histories outgrow one chip's VMEM
(SURVEY §5 long-context plan).

Layout: heads fold into the batch grid axis — inputs arrive
[N = B * num_heads, H, Dh].  Head dim pads to the 128-lane width (zero
columns are inert through q.k^T and p@v); H pads to the kv tile with -inf
masking.  For production shapes (H <= 128) XLA's fusion is already optimal —
the wrapper in ``attention_apply`` picks the kernel only past a threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, h_true, kv_tile, scale):
    """One program = one (batch*head, q-tile).  Loops kv tiles online."""
    q = q_ref[0]  # [Tq, Dh']
    tq, dh = q.shape
    hp = k_ref.shape[1]
    n_kv = hp // kv_tile

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(j * kv_tile, kv_tile), :]  # [Tkv, Dh']
        v = v_ref[0, pl.ds(j * kv_tile, kv_tile), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # [Tq, Tkv]
        col = j * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < h_true, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((tq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, dh), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def blockwise_self_attention(
    q: jnp.ndarray,  # [N, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 128,
    kv_tile: int = 128,
) -> jnp.ndarray:
    """Unmasked softmax(q k^T / sqrt(Dh)) v per leading index; O(H) memory in
    the forward.  Backward currently recomputes densely (O(H^2) there only) —
    the flash backward kernel is the planned follow-up."""
    return _blockwise_fwd_impl(q, k, v, q_tile, kv_tile)


def _blockwise_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 128,
    kv_tile: int = 128,
) -> jnp.ndarray:
    n, h_true, dh_true = q.shape
    scale = 1.0 / (dh_true**0.5)
    dh = _round_up(dh_true, 128)
    q_tile = min(q_tile, _round_up(h_true, 8))
    hp_q = _round_up(h_true, q_tile)
    hp_kv = _round_up(h_true, kv_tile)

    def pad(x, hp):
        return jnp.pad(
            x.astype(jnp.float32),
            ((0, 0), (0, hp - h_true), (0, dh - dh_true)),
        )

    qp, kp, vp = pad(q, hp_q), pad(k, hp_kv), pad(v, hp_kv)
    grid = (n, hp_q // q_tile)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, h_true=h_true, kv_tile=kv_tile, scale=scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile, dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp_kv, dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp_kv, dh), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, q_tile, dh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp_q, dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * hp_q * hp_kv * dh,
            bytes_accessed=3 * n * hp_kv * dh * 4 + n * hp_q * dh * 4,
            transcendentals=n * hp_q * hp_kv,
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out[:, :h_true, :dh_true].astype(q.dtype)


def _blockwise_vjp_fwd(q, k, v, q_tile, kv_tile):
    return _blockwise_fwd_impl(q, k, v, q_tile, kv_tile), (q, k, v)


def _blockwise_vjp_bwd(q_tile, kv_tile, res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


blockwise_self_attention.defvjp(_blockwise_vjp_fwd, _blockwise_vjp_bwd)


def attention_reference(q, k, v):
    """Dense reference for parity tests."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("nqd,nkd->nqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )
