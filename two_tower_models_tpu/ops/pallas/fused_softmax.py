"""Fused in-batch sampled-softmax cross-entropy — Pallas TPU kernel.

Computes ce[b] = logsumexp_j(u_b . i_j) - u_b . i_b without materializing the
[B, B] logit matrix in HBM (the reference materializes it:
two_tower_base_retrieval.py:287).  Flash-style single pass: the score tile
[TB, TC] lives only in VMEM/registers; running (max, sumexp) accumulators
carry across column tiles.  At B = 8192 fp32 that's 256 MB of HBM traffic
saved per step (plus the same again in the backward).

Custom VJP: two more tiled passes recompute probability tiles from the saved
logsumexp (p = exp(s - lse), numerically stable) and contract them against
the cotangent:

    dU_b = g_b * (sum_j p_bj i_j - i_b)
    dI_j = sum_b g_b p_bj u_b - g_j u_j

Padding: the wrapper pads B up to the tile size; padded columns are masked to
-inf inside the kernel (mask from the static true B), padded rows sliced off.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 512
_NEG_INF = -1e30


def _interpret() -> bool:
    """Mosaic compiles only on TPU; interpret everywhere else (CPU tests)."""
    import jax

    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _eff_tile(tile: int, b_true: int) -> int:
    """Shrink the tile for small batches (min 128-lane alignment) so padding
    waste stays bounded; forward and backward must agree (both call this)."""
    return max(128, min(tile, _round_up(b_true, 128)))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(u_ref, i_ref, ce_ref, lse_ref, m_ref, l_ref, d_ref,
                *, c_true, tile, with_diag):
    bi = pl.program_id(0)  # row-tile index (parallel)
    bj = pl.program_id(1)  # col-tile index (sequential)
    nc = pl.num_programs(1)

    @pl.when(bj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        d_ref[:] = jnp.zeros_like(d_ref)

    s = jnp.dot(u_ref[:], i_ref[:].T, preferred_element_type=jnp.float32)  # [TB, TC]

    # Mask padded columns to -inf (they are zero rows -> score 0 otherwise).
    col_ids = bj * tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col_ids < c_true, s, _NEG_INF)

    if with_diag:
        # Capture the diagonal when this tile straddles it (square tiles:
        # only the bi == bj tile does).
        @pl.when(bi == bj)
        def _diag():
            row_l = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            col_l = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            d_ref[:] = jnp.sum(
                jnp.where(row_l == col_l, s, 0.0), axis=1, keepdims=True
            )

    # Online logsumexp update.
    m_prev = m_ref[:]  # [TB, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    l_ref[:] = l_ref[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=1, keepdims=True
    )
    m_ref[:] = m_new

    @pl.when(bj == nc - 1)
    def _finish():
        lse = m_ref[:] + jnp.log(l_ref[:])  # [TB, 1]
        lse_ref[:] = lse
        ce_ref[:] = lse - d_ref[:]


def _fwd(user_emb: jnp.ndarray, item_emb: jnp.ndarray, tile: int,
         with_diag: bool = True):
    b_true, d = user_emb.shape
    c_true = item_emb.shape[0]
    tile = _eff_tile(tile, max(b_true, c_true) if with_diag else c_true)
    bp = _round_up(b_true, tile)
    cp = _round_up(c_true, tile)
    # Keep the embedding dtype: bf16 operands run the MXU at full rate,
    # while every reduction below accumulates in f32.
    u = jnp.pad(user_emb, ((0, bp - b_true), (0, 0)))
    it = jnp.pad(item_emb, ((0, cp - c_true), (0, 0)))

    grid = (bp // tile, cp // tile)
    kernel = functools.partial(
        _fwd_kernel, c_true=c_true, tile=tile, with_diag=with_diag
    )
    ce, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, 1), jnp.float32),  # running max
            pltpu.VMEM((tile, 1), jnp.float32),  # running sumexp
            pltpu.VMEM((tile, 1), jnp.float32),  # diagonal
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * cp * d,
            bytes_accessed=(bp + cp) * d * 4 + 2 * bp * 4,
            transcendentals=bp * cp,
        ),
        interpret=_interpret(),
    )(u, it)
    return ce[:b_true, 0], lse[:b_true, 0]


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_du_kernel(u_ref, i_ref, lse_ref, g_ref, du_ref, acc_ref,
                   *, c_true, tile, with_diag):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(bj == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jnp.dot(u_ref[:], i_ref[:].T, preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse_ref[:])  # [TB, TC]
    col_ids = bj * tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.where(col_ids < c_true, p, 0.0)
    gp = (p * g_ref[:]).astype(i_ref.dtype)  # [TB, TC] row-scaled
    acc_ref[:] += jnp.dot(gp, i_ref[:], preferred_element_type=jnp.float32)

    if with_diag:
        @pl.when(bi == bj)
        def _diag():
            acc_ref[:] += -g_ref[:] * i_ref[:].astype(jnp.float32)

    @pl.when(bj == nc - 1)
    def _finish():
        du_ref[:] = acc_ref[:]


def _bwd_di_kernel(u_ref, i_ref, lse_ref, g_ref, di_ref, acc_ref,
                   *, c_true, tile, with_diag):
    bj = pl.program_id(0)  # col tile (parallel) — owns dI rows
    bi = pl.program_id(1)  # row tile (sequential)
    nr = pl.num_programs(1)

    @pl.when(bi == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jnp.dot(u_ref[:], i_ref[:].T, preferred_element_type=jnp.float32)  # [TB, TC]
    p = jnp.exp(s - lse_ref[:])
    col_ids = bj * tile + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.where(col_ids < c_true, p, 0.0)
    gp = (p * g_ref[:]).astype(u_ref.dtype)  # [TB, TC]
    acc_ref[:] += jnp.dot(gp.T, u_ref[:], preferred_element_type=jnp.float32)  # [TC, D]

    if with_diag:
        @pl.when(bi == bj)
        def _diag():
            # subtract g_j * u_j for the rows this col tile owns
            acc_ref[:] += -g_ref[:] * u_ref[:].astype(jnp.float32)

    @pl.when(bi == nr - 1)
    def _finish():
        di_ref[:] = acc_ref[:]


def _bwd_impl(tile, user_emb, item_emb, lse, g_ce, with_diag):
    b_true, d = user_emb.shape
    c_true = item_emb.shape[0]
    tile = _eff_tile(tile, max(b_true, c_true) if with_diag else c_true)
    bp = _round_up(b_true, tile)
    cp = _round_up(c_true, tile)
    u = jnp.pad(user_emb, ((0, bp - b_true), (0, 0)))
    it = jnp.pad(item_emb, ((0, cp - c_true), (0, 0)))
    lse_p = jnp.pad(lse, (0, bp - b_true))[:, None]
    g_p = jnp.pad(g_ce, (0, bp - b_true))[:, None]
    nbr = bp // tile
    nbc = cp // tile

    common = dict(c_true=c_true, tile=tile, with_diag=with_diag)
    du = pl.pallas_call(
        functools.partial(_bwd_du_kernel, **common),
        grid=(nbr, nbc),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=_interpret(),
    )(u, it, lse_p, g_p)

    di = pl.pallas_call(
        functools.partial(_bwd_di_kernel, **common),
        grid=(nbc, nbr),
        in_specs=[
            pl.BlockSpec((tile, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=_interpret(),
    )(u, it, lse_p, g_p)

    return du[:b_true].astype(user_emb.dtype), di[:c_true].astype(item_emb.dtype)


def _bwd(tile, res, grads):
    user_emb, item_emb, lse = res
    g_ce = grads[0].astype(jnp.float32)  # [B]; grads[1] (lse cotangent) unused
    return _bwd_impl(tile, user_emb, item_emb, lse, g_ce, with_diag=True)


# ---------------------------------------------------------------------------
# Public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_in_batch_ce(
    user_emb: jnp.ndarray, item_emb: jnp.ndarray, tile: int = DEFAULT_TILE
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ce [B], lse [B]) with diagonal positives.  Differentiable w.r.t. both
    embeddings; lse is exposed for downstream consumers (e.g. log-probs)."""
    return _fwd(user_emb, item_emb, tile)


def _vjp_fwd(user_emb, item_emb, tile):
    ce, lse = _fwd(user_emb, item_emb, tile)
    return (ce, lse), (user_emb, item_emb, lse)


fused_in_batch_ce.defvjp(_vjp_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_lse(
    user_emb: jnp.ndarray, item_emb: jnp.ndarray, tile: int = DEFAULT_TILE
) -> jnp.ndarray:
    """Row-wise logsumexp of ``user_emb @ item_emb.T`` without materializing
    the [B, C] score matrix — the rectangular core of the in-batch loss for
    cross-chip negative sharing: after an all_gather of item embeddings over
    the data axis, ``ce = fused_lse(u, all_items) - rowwise_dot(u, items)``
    (the positive column is this shard's own diagonal, so the positive term
    needs no gathered data and stays in plain autodiff)."""
    _, lse = _fwd(user_emb, item_emb, tile, with_diag=False)
    return lse


def _lse_vjp_fwd(user_emb, item_emb, tile):
    _, lse = _fwd(user_emb, item_emb, tile, with_diag=False)
    return lse, (user_emb, item_emb, lse)


def _lse_vjp_bwd(tile, res, g):
    user_emb, item_emb, lse = res
    return _bwd_impl(
        tile, user_emb, item_emb, lse, g.astype(jnp.float32), with_diag=False
    )


fused_lse.defvjp(_lse_vjp_fwd, _lse_vjp_bwd)


def in_batch_ce_reference(user_emb: jnp.ndarray, item_emb: jnp.ndarray):
    """Pure-jnp reference (materializes [B, B]) for parity tests."""
    s = jnp.dot(
        user_emb.astype(jnp.float32),
        item_emb.astype(jnp.float32).T,
        preferred_element_type=jnp.float32,
    )
    lse = jax.nn.logsumexp(s, axis=-1)
    return lse - jnp.diagonal(s), lse
