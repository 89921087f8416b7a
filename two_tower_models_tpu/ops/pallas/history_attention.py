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


def _attn_kernel(
    lens_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, kv_tile, scale
):
    """One program = one (batch*head, q-tile).  Loops kv tiles online.
    ``lens_ref`` (scalar-prefetch SMEM, [N]) holds each leading index's valid
    key count — the static history length, or per-example lengths."""
    h_true = lens_ref[pl.program_id(0)]
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
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # per-row log-sum-exp, saved for the flash backward ([1, Tq] row layout
    # so the backward's transposed-score kernels consume it without a
    # per-tile relayout)
    lse_ref[0] = (m + jnp.log(l)).reshape(1, tq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _blockwise_core(
    q: jnp.ndarray,  # [N, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    lens: jnp.ndarray,  # [N] int32 valid key count per leading index
    q_tile: int = 128,
    kv_tile: int = 128,
) -> jnp.ndarray:
    out, _ = _blockwise_fwd_impl(q, k, v, lens, q_tile, kv_tile)
    return out


def blockwise_self_attention(
    q: jnp.ndarray,  # [N, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 128,
    kv_tile: int = 128,
    lengths: jnp.ndarray = None,  # optional [N] int32 valid key counts
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(Dh)) v per leading index; O(H) memory in BOTH
    directions: the forward saves only per-row LSE, and the flash backward
    recomputes probabilities tile-by-tile from it — the [H, H] score matrix
    exists in neither pass (standard two-pass flash bwd).  ``lengths`` masks
    keys >= the leading index's length (queries past it produce garbage
    rows the encoder contract never consumes)."""
    n, h_true, _ = q.shape
    lens = (
        jnp.full((n,), h_true, jnp.int32)
        if lengths is None
        else jnp.clip(lengths.astype(jnp.int32), 1, h_true)
    )
    return _blockwise_core(q, k, v, lens, q_tile, kv_tile)


def _pad_shapes(h_true, dh_true, q_tile, kv_tile):
    dh = _round_up(dh_true, 128)
    q_tile = min(q_tile, _round_up(h_true, 8))
    return dh, q_tile, _round_up(h_true, q_tile), _round_up(h_true, kv_tile)


def _pad3(x, h_true, hp, dh):
    return jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (0, hp - h_true), (0, dh - x.shape[-1])),
    )


def _blockwise_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lens: jnp.ndarray,  # [N] int32
    q_tile: int = 128,
    kv_tile: int = 128,
):
    """Returns (out [N, H, Dh], lse [N, 1, hp_q] f32)."""
    n, h_true, dh_true = q.shape
    scale = 1.0 / (dh_true**0.5)
    dh, q_tile, hp_q, hp_kv = _pad_shapes(h_true, dh_true, q_tile, kv_tile)

    qp = _pad3(q, h_true, hp_q, dh)
    kp, vp = _pad3(k, h_true, hp_kv, dh), _pad3(v, h_true, hp_kv, dh)
    grid = (n, hp_q // q_tile)
    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, kv_tile=kv_tile, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, q_tile, dh), lambda b, i, L: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hp_kv, dh), lambda b, i, L: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hp_kv, dh), lambda b, i, L: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, q_tile, dh), lambda b, i, L: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, q_tile), lambda b, i, L: (b, 0, i), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hp_q, dh), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, hp_q), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * hp_q * hp_kv * dh,
            bytes_accessed=3 * n * hp_kv * dh * 4 + n * hp_q * dh * 4,
            transcendentals=n * hp_q * hp_kv,
        ),
        interpret=_interpret(),
    )(lens.astype(jnp.int32), qp, kp, vp)
    return out[:, :h_true, :dh_true].astype(q.dtype), lse


def _dq_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, kv_tile, scale,
):
    """One program = one (n, q-tile); loops kv tiles.  Scores are computed
    TRANSPOSED ([Tkv, Tq]) so lse/delta broadcast from their [1, Tq] row
    layout — no relayouts inside the loop."""
    h_true = lens_ref[pl.program_id(0)]
    q = q_ref[0]  # [Tq, Dh']
    do = do_ref[0]  # [Tq, Dh']
    lse = lse_ref[0]  # [1, Tq]
    delta = delta_ref[0]  # [1, Tq]
    tq, dh = q.shape
    n_kv = k_ref.shape[1] // kv_tile

    def body(j, acc):
        k = k_ref[0, pl.ds(j * kv_tile, kv_tile), :]  # [Tkv, Dh']
        v = v_ref[0, pl.ds(j * kv_tile, kv_tile), :]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tkv, Tq]
        row = j * kv_tile + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0)
        s_t = jnp.where(row < h_true, s_t, _NEG_INF)
        p_t = jnp.exp(s_t - lse)  # [Tkv, Tq]
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Tkv, Tq]
        ds_t = p_t * (dp_t - delta)
        # dq[r, d] = sum_c ds_t[c, r] * k[c, d]
        return acc + jax.lax.dot_general(
            ds_t, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc0 = jnp.zeros((tq, dh), jnp.float32)
    dq_ref[0] = jax.lax.fori_loop(0, n_kv, body, acc0) * scale


def _dkv_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, q_tile, scale,
):
    """One program = one (n, kv-tile); loops q tiles with the same
    transposed-score orientation."""
    h_true = lens_ref[pl.program_id(0)]
    k = k_ref[0]  # [Tkv, Dh']
    v = v_ref[0]
    tkv, dh = k.shape
    n_q = q_ref.shape[1] // q_tile
    kv0 = pl.program_id(1) * tkv
    row = kv0 + jax.lax.broadcasted_iota(jnp.int32, (tkv, q_tile), 0)

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * q_tile, q_tile), :]  # [Tq, Dh']
        do = do_ref[0, pl.ds(i * q_tile, q_tile), :]
        lse = lse_ref[0, :, pl.ds(i * q_tile, q_tile)]  # [1, Tq]
        delta = delta_ref[0, :, pl.ds(i * q_tile, q_tile)]
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tkv, Tq]
        s_t = jnp.where(row < h_true, s_t, _NEG_INF)
        p_t = jnp.exp(s_t - lse)
        dv_acc = dv_acc + jnp.dot(p_t, do, preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds_t = p_t * (dp_t - delta)
        dk_acc = dk_acc + jnp.dot(ds_t, q, preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    z = jnp.zeros((tkv, dh), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (z, z))
    dk_ref[0] = dk * scale
    dv_ref[0] = dv


def _blockwise_vjp_fwd(q, k, v, lens, q_tile, kv_tile):
    out, lse = _blockwise_fwd_impl(q, k, v, lens, q_tile, kv_tile)
    return out, (q, k, v, lens, out, lse)


def _blockwise_vjp_bwd(q_tile, kv_tile, res, g):
    q, k, v, lens, out, lse = res
    n, h_true, dh_true = q.shape
    scale = 1.0 / (dh_true**0.5)
    dh, q_tile, hp_q, hp_kv = _pad_shapes(h_true, dh_true, q_tile, kv_tile)
    lens = lens.astype(jnp.int32)

    qp = _pad3(q, h_true, hp_q, dh)
    kp, vp = _pad3(k, h_true, hp_kv, dh), _pad3(v, h_true, hp_kv, dh)
    dop = _pad3(g, h_true, hp_q, dh)
    # delta[b, r] = sum_d do[b, r, d] * o[b, r, d] — O(H) elementwise+reduce
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [N, H]
    delta = jnp.pad(delta, ((0, 0), (0, hp_q - h_true)))[:, None, :]  # [N,1,hp_q]

    qspec = pl.BlockSpec((1, q_tile, dh), lambda b, i, L: (b, i, 0), memory_space=pltpu.VMEM)
    kvspec_full = pl.BlockSpec((1, hp_kv, dh), lambda b, i, L: (b, 0, 0), memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, 1, q_tile), lambda b, i, L: (b, 0, i), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, kv_tile=kv_tile, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, hp_q // q_tile),
            in_specs=[qspec, kvspec_full, kvspec_full, qspec, rowspec, rowspec],
            out_specs=qspec,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp_q, dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=_interpret(),
    )(lens, qp, kp, vp, dop, lse, delta)

    kvspec = pl.BlockSpec((1, kv_tile, dh), lambda b, j, L: (b, j, 0), memory_space=pltpu.VMEM)
    qspec_full = pl.BlockSpec((1, hp_q, dh), lambda b, j, L: (b, 0, 0), memory_space=pltpu.VMEM)
    rowspec_full = pl.BlockSpec((1, 1, hp_q), lambda b, j, L: (b, 0, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, q_tile=q_tile, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n, hp_kv // kv_tile),
            in_specs=[qspec_full, kvspec, kvspec, qspec_full, rowspec_full, rowspec_full],
            out_specs=(kvspec, kvspec),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hp_kv, dh), jnp.float32),
            jax.ShapeDtypeStruct((n, hp_kv, dh), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=_interpret(),
    )(lens, qp, kp, vp, dop, lse, delta)

    def crop(x, dtype):
        return x[:, :h_true, :dh_true].astype(dtype)

    import numpy as np

    dlens = np.zeros(lens.shape, jax.dtypes.float0)
    return crop(dq, q.dtype), crop(dk, k.dtype), crop(dv, v.dtype), dlens


_blockwise_core.defvjp(_blockwise_vjp_fwd, _blockwise_vjp_bwd)


def attention_reference(q, k, v):
    """Dense reference for parity tests."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("nqd,nkd->nqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", p, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )
