"""Whole-history-encoder Pallas TPU kernel: PE + L attention layers + pool.

The encoder's contract (reference user_history_encoder.py:80-121) consumes
only TWO rows of the attention stack's output: position 0 of the final layer
(most-recent item) and the mean-pool of the *input* embeddings.  Fusing the
entire stack into one kernel exploits that:

  * the batch tile stays VMEM-resident across all L layers — no inter-layer
    HBM round trips (the per-layer kernel pays read+write of [B, H, D] per
    layer) and 1 dispatch instead of L;
  * the LAST layer computes attention only for query row 0 ([TB, 1, ...]
    score/prob/out tensors) — an architectural fact, not an approximation;
  * the mean-pool falls out of the already-loaded input tile for free.

Attention math is the merged-head formulation from ops.pallas.fused_mha
(all heads in one lane-width-NH*H batched matmul pair); bf16 operands / f32
accumulation when the input is bf16.  Two backward strategies (module flag
_RESIDUAL_BWD, selected by measurement): the default forward streams out
each layer's input + attention probabilities and the backward rebuilds the
rest with one qkv and one PV matmul per layer (no score matmul / exp /
denominator — 15% faster at the flagship shape); the alternative recomputes
the full forward per tile.  Both accumulate stacked weight grads across the
sequential grid.  Parity-tested against the dense reference path in
interpret mode (tests/test_pallas_fused_encoder.py, CPU) and on real TPU
via scripts/tpu_kernel_parity.py (fwd + every weight/input/PE gradient).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_tower_models_tpu.ops.pallas.fused_mha import (
    _attend,
    _group_ones,
    _interpret,
    _merge_heads,
    _mm_dtype,
    _pad_bh,
    _pad_lens,
    _round_up,
    _split_heads_sum,
    _sublane,
    _NEG_INF,
)


def _vmem_tile(tile_b, num_layers, hp, d, dtype, rows_const) -> int:
    """VMEM-budgeted batch tile.  ``rows_const`` is the calibrated row count
    at the flagship shape (hp=32, d=64, bf16) for the given kernel family:
    192 for the recompute backward (all layers' residuals live in VMEM:
    f32 L=3 used 19.3 MB at tile 32), 384 for the residual-storing pair
    (one layer live at a time: f32 L=3 overflowed by 0.5 MB at tile 64).
    Scales ~linearly in num_layers, dtype size, and hp*d.  The backward
    always reuses the forward's formula, so its tile divides the forward's
    padded batch."""
    mm_size = 2 if dtype == jnp.bfloat16 else 4
    rows = (rows_const * (32 * 64)) // max(1, num_layers * mm_size * hp * d)
    tile = tile_b
    while tile > 8 and tile > rows:
        tile //= 2
    return max(8, tile)


def _weight_args(w_in, b_in, w_out, b_out, num_layers):
    """Stacked per-layer weights as the f32 operand list every encoder
    pallas_call takes (biases reshaped to [L, 1, .] for in-kernel broadcast)."""
    return (
        w_in.astype(jnp.float32),
        b_in.reshape(num_layers, 1, -1).astype(jnp.float32),
        w_out.astype(jnp.float32),
        b_out.reshape(num_layers, 1, -1).astype(jnp.float32),
    )


def _weight_specs(num_layers, d):
    const3 = lambda i: (0, 0, 0)
    return [
        pl.BlockSpec((num_layers, d, 3 * d), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((num_layers, 1, 3 * d), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((num_layers, d, d), const3, memory_space=pltpu.VMEM),
        pl.BlockSpec((num_layers, 1, d), const3, memory_space=pltpu.VMEM),
    ]


def _weight_grad_shapes(num_layers, d):
    return [
        jax.ShapeDtypeStruct((num_layers, d, 3 * d), jnp.float32),
        jax.ShapeDtypeStruct((num_layers, 1, 3 * d), jnp.float32),
        jax.ShapeDtypeStruct((num_layers, d, d), jnp.float32),
        jax.ShapeDtypeStruct((num_layers, 1, d), jnp.float32),
    ]


def _layer_fwd(x, wi, bi, wo, bo, num_heads, hd, h_true, mm):
    """One full attention layer on a VMEM-resident f32 [TB, H, D] tile.
    Returns (y f32, residuals for backward)."""
    tb, hp, d = x.shape
    x2 = x.reshape(tb * hp, d).astype(mm)
    qkv = jnp.dot(x2, wi.astype(mm), preferred_element_type=jnp.float32) + bi
    q = qkv[:, :d].reshape(tb, hp, d).astype(mm)
    k = qkv[:, d : 2 * d].reshape(tb, hp, d).astype(mm)
    v = qkv[:, 2 * d :].reshape(tb, hp, d).astype(mm)
    out, (p, k_all, v_all) = _attend(q, k, v, num_heads, hd, h_true, mm)
    y = (
        jnp.dot(
            out.reshape(tb * hp, d).astype(mm),
            wo.astype(mm),
            preferred_element_type=jnp.float32,
        )
        + bo
    ).reshape(tb, hp, d)
    return y, (x2, q, p, k_all, v_all, out)


def _thin_fwd(x, wi, bi, wo, bo, num_heads, hd, h_true, mm):
    """Final layer: only query row 0 is consumed downstream, so score/prob/
    out tensors are [TB, 1, ...].  Returns (y0 [TB, D] f32, residuals)."""
    tb, hp, d = x.shape
    nhp = num_heads * hp
    scale = 1.0 / (hd**0.5)
    x2 = x.reshape(tb * hp, d).astype(mm)
    qkv = jnp.dot(x2, wi.astype(mm), preferred_element_type=jnp.float32) + bi
    q0 = qkv[:, :d].reshape(tb, hp, d)[:, :1, :].astype(mm)  # [TB, 1, D]
    k = qkv[:, d : 2 * d].reshape(tb, hp, d).astype(mm)
    v = qkv[:, 2 * d :].reshape(tb, hp, d).astype(mm)
    k_all = _merge_heads(k, num_heads, hd, mm)  # [TB, NH*H, D]
    v_all = _merge_heads(v, num_heads, hd, mm)
    s = (
        jax.lax.dot_general(
            q0, k_all,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [TB, 1, NH*H]
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, 1, nhp), 2)
    s = jnp.where(col % hp < h_true, s, _NEG_INF)
    # per-head stabilizer via static lane slices (see fused_mha._attend —
    # a global row max silently zeroes any head far below the hottest one)
    m = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.max(s[:, :, h * hp : (h + 1) * hp], axis=-1, keepdims=True),
                (tb, 1, hp),
            )
            for h in range(num_heads)
        ],
        axis=-1,
    )
    e = jnp.exp(s - m)
    denom = jax.lax.dot_general(
        e.astype(mm), _group_ones(nhp, hp, mm),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = e / jnp.maximum(denom, 1e-30)  # [TB, 1, NH*H]
    out0 = jax.lax.dot_general(
        p.astype(mm), v_all,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]  # [TB, D]
    y0 = (
        jnp.dot(out0.astype(mm), wo.astype(mm), preferred_element_type=jnp.float32)
        + bo
    )  # [TB, D] (+ [1, D] broadcast)
    return y0, (x2, q0, p, k_all, v_all, out0)


def _enc_fwd_kernel(
    x_ref, pe_ref, wi_ref, bi_ref, wo_ref, bo_ref, y_ref,
    *, num_heads, h_true, num_layers,
):
    tb, hp, d = x_ref.shape
    hd = d // num_heads
    mm = _mm_dtype(x_ref.dtype)
    xin = x_ref[...].astype(jnp.float32)
    mean = jnp.sum(xin, axis=1) / h_true  # padded rows are zero
    x = xin + pe_ref[...]
    for l in range(num_layers - 1):
        x, _ = _layer_fwd(
            x, wi_ref[l], bi_ref[l], wo_ref[l], bo_ref[l], num_heads, hd, h_true, mm
        )
    y0, _ = _thin_fwd(
        x,
        wi_ref[num_layers - 1],
        bi_ref[num_layers - 1],
        wo_ref[num_layers - 1],
        bo_ref[num_layers - 1],
        num_heads, hd, h_true, mm,
    )
    y_ref[...] = jnp.stack([y0, mean], axis=1).astype(y_ref.dtype)  # [TB, 2, D]


def _enc_fwd_res_kernel(
    x_ref, pe_ref, wi_ref, bi_ref, wo_ref, bo_ref, y_ref, xs_ref, p0_ref,
    *maybe_ps_ref, num_heads, h_true, num_layers,
):
    """Forward that additionally streams out each layer's INPUT (xs) and
    attention probabilities so the backward can skip the score/softmax
    recompute.  The thin final layer's probs (query row 0 only) go to their
    OWN [TB, 1, NH*H] output (p0) instead of row 0 of a full [TB, hp, NH*H]
    slab whose other rows would be uninitialized VMEM streamed to HBM
    (advisor finding r1); full layers' probs land in ps ([L-1, ...], absent
    when L == 1)."""
    tb, hp, d = x_ref.shape
    hd = d // num_heads
    mm = _mm_dtype(x_ref.dtype)
    xin = x_ref[...].astype(jnp.float32)
    mean = jnp.sum(xin, axis=1) / h_true
    x = xin + pe_ref[...]
    for l in range(num_layers - 1):
        ps_ref = maybe_ps_ref[0]
        xs_ref[l] = x.astype(xs_ref.dtype)
        x, (_, _, p, _, _, _) = _layer_fwd(
            x, wi_ref[l], bi_ref[l], wo_ref[l], bo_ref[l], num_heads, hd, h_true, mm
        )
        ps_ref[l] = p.astype(ps_ref.dtype)
    lt = num_layers - 1
    xs_ref[lt] = x.astype(xs_ref.dtype)
    y0, (_, _, p0, _, _, _) = _thin_fwd(
        x, wi_ref[lt], bi_ref[lt], wo_ref[lt], bo_ref[lt], num_heads, hd, h_true, mm
    )
    p0_ref[...] = p0.astype(p0_ref.dtype)
    y_ref[...] = jnp.stack([y0, mean], axis=1).astype(y_ref.dtype)


def _resid_from_stored(x, p, wi, bi, num_heads, hd, mm, thin):
    """Rebuild a layer's backward residuals from its stored input and probs:
    one 2D qkv matmul + VPU merges + one batched PV matmul — no score
    matmul, no exp, no denominator."""
    tb, hp, d = x.shape
    x2 = x.reshape(tb * hp, d).astype(mm)
    qkv = jnp.dot(x2, wi.astype(mm), preferred_element_type=jnp.float32) + bi
    q = qkv[:, :d].reshape(tb, hp, d).astype(mm)
    k = qkv[:, d : 2 * d].reshape(tb, hp, d).astype(mm)
    v = qkv[:, 2 * d :].reshape(tb, hp, d).astype(mm)
    k_all = _merge_heads(k, num_heads, hd, mm)
    v_all = _merge_heads(v, num_heads, hd, mm)
    out = jax.lax.dot_general(
        p.astype(mm), v_all,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if thin:
        return (x2, q[:, :1, :], p, k_all, v_all, out[:, 0, :])
    return (x2, q, p, k_all, v_all, out)


def _enc_bwd_res_kernel(
    g_ref, xs_ref, p0_ref, *rest, num_heads, h_true, num_layers,
):
    # rest = (ps_ref?, wi, bi, wo, bo, dx, dwi, dbi, dwo, dbo, dpe);
    # ps_ref is present only for num_layers > 1 (see _enc_fwd_res_kernel).
    if num_layers > 1:
        ps_ref, *rest = rest
    else:
        ps_ref = None
    (wi_ref, bi_ref, wo_ref, bo_ref,
     dx_ref, dwi_ref, dbi_ref, dwo_ref, dbo_ref, dpe_ref) = rest
    _, tb, hp, d = xs_ref.shape
    hd = d // num_heads
    mm = _mm_dtype(xs_ref.dtype)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dpe_ref[...] = jnp.zeros_like(dpe_ref)

    g0 = g_ref[...][:, 0, :].astype(jnp.float32)
    gmean = g_ref[...][:, 1, :].astype(jnp.float32)

    lt = num_layers - 1
    thin_res = _resid_from_stored(
        xs_ref[lt], p0_ref[...].astype(jnp.float32),
        wi_ref[lt], bi_ref[lt], num_heads, hd, mm, thin=True,
    )
    dy, dwi_l, dbi_l, dwo_l, dbo_l = _thin_bwd(
        thin_res, g0, wi_ref[lt], wo_ref[lt], num_heads, hd, h_true, mm
    )
    dwi_ref[lt] += dwi_l
    dbi_ref[lt] += dbi_l
    dwo_ref[lt] += dwo_l
    dbo_ref[lt] += dbo_l

    for l in range(num_layers - 2, -1, -1):
        res = _resid_from_stored(
            xs_ref[l], ps_ref[l][...].astype(jnp.float32),
            wi_ref[l], bi_ref[l], num_heads, hd, mm, thin=False,
        )
        dy, dwi_l, dbi_l, dwo_l, dbo_l = _layer_bwd(
            res, dy, wi_ref[l], wo_ref[l], num_heads, hd, h_true, mm
        )
        dwi_ref[l] += dwi_l
        dbi_ref[l] += dbi_l
        dwo_ref[l] += dwo_l
        dbo_ref[l] += dbo_l

    dpe_ref[...] += jnp.sum(dy, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, hp, d), 1)
    dmean = jnp.where(row < h_true, gmean[:, None, :] / h_true, 0.0)
    dx_ref[...] = (dy + dmean).astype(dx_ref.dtype)


def _layer_bwd(res, dy, wi, wo, num_heads, hd, h_true, mm):
    """Backward of _layer_fwd.  dy: [TB, H, D] f32.  Returns
    (dx [TB, H, D] f32, dwi, dbi, dwo, dbo contributions)."""
    x2, q, p, k_all, v_all, out = res
    tbhp, d = x2.shape
    tb, hp, _ = q.shape
    nhp = num_heads * hp
    scale = 1.0 / (hd**0.5)

    g2 = dy.reshape(tbhp, d).astype(mm)
    ao2 = out.reshape(tbhp, d).astype(mm)
    dwo = jax.lax.dot_general(
        ao2, g2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo = jnp.sum(dy.reshape(tbhp, d), axis=0, keepdims=True)
    do = jnp.dot(g2, wo.T.astype(mm), preferred_element_type=jnp.float32).reshape(
        tb, hp, d
    )
    do_mm = do.astype(mm)
    p_mm = p.astype(mm)
    dp = jax.lax.dot_general(
        do_mm, v_all, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dv_all = jax.lax.dot_general(
        p_mm, do_mm, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dv = _split_heads_sum(dv_all, num_heads, hd, mm)
    pdp_sum = jax.lax.dot_general(
        (dp * p).astype(mm), _group_ones(nhp, hp, mm),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - pdp_sum) * scale).astype(mm)
    dq = jax.lax.dot_general(
        ds, k_all, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk_all = jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = _split_heads_sum(dk_all, num_heads, hd, mm)

    dqkv = jnp.concatenate(
        [dq.reshape(tbhp, d), dk.reshape(tbhp, d), dv.reshape(tbhp, d)], axis=1
    ).astype(mm)
    dx = jnp.dot(dqkv, wi.T.astype(mm), preferred_element_type=jnp.float32).reshape(
        tb, hp, d
    )
    dwi = jax.lax.dot_general(
        x2, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbi = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    return dx, dwi, dbi, dwo, dbo


def _thin_bwd(res, g0, wi, wo, num_heads, hd, h_true, mm):
    """Backward of _thin_fwd.  g0: [TB, D] f32 cotangent of y0."""
    x2, q0, p, k_all, v_all, out0 = res
    tbhp, d = x2.shape
    tb = q0.shape[0]
    hp = tbhp // tb
    nhp = num_heads * hp
    scale = 1.0 / (hd**0.5)

    g0_mm = g0.astype(mm)
    dwo = jax.lax.dot_general(
        out0.astype(mm), g0_mm, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo = jnp.sum(g0, axis=0, keepdims=True)
    do0 = jnp.dot(g0_mm, wo.T.astype(mm), preferred_element_type=jnp.float32)[
        :, None, :
    ]  # [TB, 1, D]
    do_mm = do0.astype(mm)
    p_mm = p.astype(mm)
    dp = jax.lax.dot_general(
        do_mm, v_all, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [TB, 1, NH*H]
    dv_all = jax.lax.dot_general(
        p_mm, do_mm, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [TB, NH*H, D]
    dv = _split_heads_sum(dv_all, num_heads, hd, mm)
    pdp_sum = jax.lax.dot_general(
        (dp * p).astype(mm), _group_ones(nhp, hp, mm),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - pdp_sum) * scale).astype(mm)  # [TB, 1, NH*H]
    dq0 = jax.lax.dot_general(
        ds, k_all, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [TB, 1, D]
    dk_all = jax.lax.dot_general(
        ds, q0, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = _split_heads_sum(dk_all, num_heads, hd, mm)

    # dq is nonzero only at row 0
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, hp, d), 1)
    dq = jnp.where(row == 0, dq0, 0.0)  # broadcast [TB,1,D] across hp
    dqkv = jnp.concatenate(
        [dq.reshape(tbhp, d), dk.reshape(tbhp, d), dv.reshape(tbhp, d)], axis=1
    ).astype(mm)
    dx = jnp.dot(dqkv, wi.T.astype(mm), preferred_element_type=jnp.float32).reshape(
        tb, hp, d
    )
    dwi = jax.lax.dot_general(
        x2, dqkv, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbi = jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    return dx, dwi, dbi, dwo, dbo


def _enc_bwd_kernel(
    x_ref, g_ref, pe_ref, wi_ref, bi_ref, wo_ref, bo_ref,
    dx_ref, dwi_ref, dbi_ref, dwo_ref, dbo_ref, dpe_ref,
    *, num_heads, h_true, num_layers,
):
    tb, hp, d = x_ref.shape
    hd = d // num_heads
    mm = _mm_dtype(x_ref.dtype)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dpe_ref[...] = jnp.zeros_like(dpe_ref)

    # --- recompute forward, keeping every layer's residuals in VMEM ---
    xin = x_ref[...].astype(jnp.float32)
    x = xin + pe_ref[...]
    residuals = []
    for l in range(num_layers - 1):
        x, res = _layer_fwd(
            x, wi_ref[l], bi_ref[l], wo_ref[l], bo_ref[l], num_heads, hd, h_true, mm
        )
        residuals.append(res)
    lt = num_layers - 1
    _, thin_res = _thin_fwd(
        x, wi_ref[lt], bi_ref[lt], wo_ref[lt], bo_ref[lt], num_heads, hd, h_true, mm
    )

    # --- backward ---
    g0 = g_ref[...][:, 0, :].astype(jnp.float32)  # cotangent of y0
    gmean = g_ref[...][:, 1, :].astype(jnp.float32)  # cotangent of mean-pool

    dy, dwi_l, dbi_l, dwo_l, dbo_l = _thin_bwd(
        thin_res, g0, wi_ref[lt], wo_ref[lt], num_heads, hd, h_true, mm
    )
    dwi_ref[lt] += dwi_l
    dbi_ref[lt] += dbi_l
    dwo_ref[lt] += dwo_l
    dbo_ref[lt] += dbo_l

    for l in range(num_layers - 2, -1, -1):
        dy, dwi_l, dbi_l, dwo_l, dbo_l = _layer_bwd(
            residuals[l], dy, wi_ref[l], wo_ref[l], num_heads, hd, h_true, mm
        )
        dwi_ref[l] += dwi_l
        dbi_ref[l] += dbi_l
        dwo_ref[l] += dwo_l
        dbo_ref[l] += dbo_l

    # PE enters at layer 0's input (x = xin + pe): its cotangent is dy summed
    # over the batch tile (the mean-pool path bypasses the PE add).
    dpe_ref[...] += jnp.sum(dy, axis=0)

    # mean-pool path: every valid history row gets gmean / h_true
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, hp, d), 1)
    dmean = jnp.where(row < h_true, gmean[:, None, :] / h_true, 0.0)
    dx_ref[...] = (dy + dmean).astype(dx_ref.dtype)


def _enc_fwd_impl(hist_emb, pe, w_in, b_in, w_out, b_out, num_heads, tile_b):
    b, h_true, d = hist_emb.shape
    num_layers = w_in.shape[0]
    hp = _round_up(h_true, _sublane(hist_emb.dtype))
    xp = _pad_bh(hist_emb, tile_b, hp)
    bp = xp.shape[0]
    pe_p = jnp.pad(pe.astype(jnp.float32), ((0, hp - h_true), (0, 0)))
    const = lambda i: (0, 0)
    y = pl.pallas_call(
        functools.partial(
            _enc_fwd_kernel, num_heads=num_heads, h_true=h_true, num_layers=num_layers
        ),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d), const, memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, 2, d), hist_emb.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(
        xp,
        pe_p,
        *_weight_args(w_in, b_in, w_out, b_out, num_layers),
    )
    return y[:b]


def _enc_fwd_res_impl(hist_emb, pe, w_in, b_in, w_out, b_out, num_heads, tile_b):
    """Forward emitting (y, xs, p0[, ps]) for the recompute-free backward."""
    b, h_true, d = hist_emb.shape
    num_layers = w_in.shape[0]
    hp = _round_up(h_true, _sublane(hist_emb.dtype))
    nhp = num_heads * hp
    tile_b = _vmem_tile(tile_b, num_layers, hp, d, hist_emb.dtype, 384)
    xp = _pad_bh(hist_emb, tile_b, hp)
    bp = xp.shape[0]
    pe_p = jnp.pad(pe.astype(jnp.float32), ((0, hp - h_true), (0, 0)))
    const = lambda i: (0, 0)
    tiled4 = lambda i: (0, i, 0, 0)
    out_specs = [
        pl.BlockSpec((tile_b, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_layers, tile_b, hp, d), tiled4, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, 1, nhp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bp, 2, d), hist_emb.dtype),
        jax.ShapeDtypeStruct((num_layers, bp, hp, d), hist_emb.dtype),
        jax.ShapeDtypeStruct((bp, 1, nhp), hist_emb.dtype),
    ]
    if num_layers > 1:
        out_specs.append(
            pl.BlockSpec(
                (num_layers - 1, tile_b, hp, nhp), tiled4, memory_space=pltpu.VMEM
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((num_layers - 1, bp, hp, nhp), hist_emb.dtype)
        )
    outs = pl.pallas_call(
        functools.partial(
            _enc_fwd_res_kernel,
            num_heads=num_heads, h_true=h_true, num_layers=num_layers,
        ),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d), const, memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(
        xp,
        pe_p,
        *_weight_args(w_in, b_in, w_out, b_out, num_layers),
    )
    y, xs, p0 = outs[:3]
    ps = outs[3] if num_layers > 1 else None
    return y[:b], xs, p0, ps


def _vjp_bwd_res(num_heads, tile_b, res, g):
    hist_emb, pe, w_in, b_in, w_out, b_out, xs, p0, ps = res
    b, h_true, d = hist_emb.shape
    dtype = xs.dtype
    num_layers = w_in.shape[0]
    hp = xs.shape[2]
    nhp = p0.shape[2]
    # Stored residuals stream in per tile; only one layer's working set is
    # live at a time.  Same budget formula as the forward, so the tile
    # divides the forward's padded batch.
    tile_b = _vmem_tile(tile_b, num_layers, hp, d, dtype, 384)
    bp = xs.shape[1]
    if bp % tile_b:
        # xs was padded for the forward tile; repad is unnecessary since the
        # forward used the same tile_b argument.
        raise ValueError("forward/backward tile mismatch")
    gp = jnp.pad(g.astype(dtype), ((0, bp - b), (0, 0), (0, 0)))
    const = lambda i: (0, 0)
    tiled4 = lambda i: (0, i, 0, 0)
    in_specs = [
        pl.BlockSpec((tile_b, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_layers, tile_b, hp, d), tiled4, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_b, 1, nhp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [gp, xs, p0]
    if num_layers > 1:
        in_specs.append(
            pl.BlockSpec(
                (num_layers - 1, tile_b, hp, nhp), tiled4, memory_space=pltpu.VMEM
            )
        )
        operands.append(ps)
    dx, dwi, dbi, dwo, dbo, dpe = pl.pallas_call(
        functools.partial(
            _enc_bwd_res_kernel,
            num_heads=num_heads, h_true=h_true, num_layers=num_layers,
        ),
        grid=(bp // tile_b,),
        in_specs=in_specs + _weight_specs(num_layers, d),
        out_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
            pl.BlockSpec((hp, d), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, hp, d), dtype),
            *_weight_grad_shapes(num_layers, d),
            jax.ShapeDtypeStruct((hp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(
        *operands,
        *_weight_args(w_in, b_in, w_out, b_out, num_layers),
    )
    return (
        dx[:b, :h_true],
        dpe[:h_true].astype(pe.dtype),
        dwi.astype(w_in.dtype),
        dbi.reshape(num_layers, -1).astype(b_in.dtype),
        dwo.astype(w_out.dtype),
        dbo.reshape(num_layers, -1).astype(b_out.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_history_encoder(
    hist_emb: jnp.ndarray,  # [B, H, D]  (newest item at row 0)
    pe: jnp.ndarray,  # [H, D] positional encoding (zeros to disable)
    w_in: jnp.ndarray,  # [L, D, 3D]
    b_in: jnp.ndarray,  # [L, 3D]
    w_out: jnp.ndarray,  # [L, D, D]
    b_out: jnp.ndarray,  # [L, D]
    num_heads: int,
    tile_b: int = 64,
) -> jnp.ndarray:
    """[B, H, D] -> [B, 2, D]: (post-attention row 0, input mean-pool)."""
    return _enc_fwd_impl(hist_emb, pe, w_in, b_in, w_out, b_out, num_heads, tile_b)


# Backward strategy: True = the forward stores each layer's input + probs
# and the backward skips the score/softmax recompute (larger tiles, fewer
# matmuls, ~150 MB extra HBM streaming at the flagship shape); False = pure
# recompute.  Measured on v5e and selected accordingly (BASELINE.md).
_RESIDUAL_BWD = True


def _vjp_fwd(hist_emb, pe, w_in, b_in, w_out, b_out, num_heads, tile_b):
    if _RESIDUAL_BWD:
        y, xs, p0, ps = _enc_fwd_res_impl(
            hist_emb, pe, w_in, b_in, w_out, b_out, num_heads, tile_b
        )
        return y, (hist_emb, pe, w_in, b_in, w_out, b_out, xs, p0, ps)
    y = _enc_fwd_impl(hist_emb, pe, w_in, b_in, w_out, b_out, num_heads, tile_b)
    return y, (hist_emb, pe, w_in, b_in, w_out, b_out)


def _vjp_bwd_dispatch(num_heads, tile_b, res, g):
    if _RESIDUAL_BWD:
        return _vjp_bwd_res(num_heads, tile_b, res, g)
    return _vjp_bwd(num_heads, tile_b, res, g)


def _vjp_bwd(num_heads, tile_b, res, g):
    hist_emb, pe, w_in, b_in, w_out, b_out = res
    b, h_true, d = hist_emb.shape
    num_layers = w_in.shape[0]
    hp = _round_up(h_true, _sublane(hist_emb.dtype))
    tile_b = _vmem_tile(tile_b, num_layers, hp, d, hist_emb.dtype, 192)
    xp = _pad_bh(hist_emb, tile_b, hp)
    gp = jnp.pad(g, ((0, xp.shape[0] - b), (0, 0), (0, 0)))
    bp = xp.shape[0]
    pe_p = jnp.pad(pe.astype(jnp.float32), ((0, hp - h_true), (0, 0)))
    const = lambda i: (0, 0)
    dx, dwi, dbi, dwo, dbo, dpe = pl.pallas_call(
        functools.partial(
            _enc_bwd_kernel, num_heads=num_heads, h_true=h_true, num_layers=num_layers
        ),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 2, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, d), const, memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
            pl.BlockSpec((hp, d), const, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, hp, d), hist_emb.dtype),
            *_weight_grad_shapes(num_layers, d),
            jax.ShapeDtypeStruct((hp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(
        xp,
        gp.astype(hist_emb.dtype),
        pe_p,
        *_weight_args(w_in, b_in, w_out, b_out, num_layers),
    )
    return (
        dx[:b, :h_true],
        dpe[:h_true].astype(pe.dtype),
        dwi.astype(w_in.dtype),
        dbi.reshape(num_layers, -1).astype(b_in.dtype),
        dwo.astype(w_out.dtype),
        dbo.reshape(num_layers, -1).astype(b_out.dtype),
    )


fused_history_encoder.defvjp(_vjp_fwd, _vjp_bwd_dispatch)


# ---------------------------------------------------------------------------
# Variable-length attention stack (per-example history lengths)
# ---------------------------------------------------------------------------
#
# The whole-encoder kernel above bakes PE-add + mean-pool in because they're
# free on the VMEM-resident tile — but both become per-example under
# variable lengths (the PE flip applies at each example's own length, the
# mean divides by it).  The varlen tier therefore computes PE/zeroing/mean
# in XLA (fused into the embedding-gather producer) and runs only the
# attention STACK in the kernel: [B, H, D] -> y0 [B, D] (row 0 of the final
# layer — the only attention output the encoder contract consumes).  The
# per-example length rides in as a [TB, 1] block and replaces the static
# h_true in every mask (masking semantics verified against the truncated
# dense run, tests/test_history_lengths.py).  Backward = recompute.


def _stack_fwd_kernel(
    x_ref, lens_ref, wi_ref, bi_ref, wo_ref, bo_ref, y_ref,
    *, num_heads, num_layers,
):
    tb, hp, d = x_ref.shape
    hd = d // num_heads
    mm = _mm_dtype(x_ref.dtype)
    hl = lens_ref[...].reshape(tb, 1, 1)
    x = x_ref[...].astype(jnp.float32)
    for l in range(num_layers - 1):
        x, _ = _layer_fwd(
            x, wi_ref[l], bi_ref[l], wo_ref[l], bo_ref[l], num_heads, hd, hl, mm
        )
    lt = num_layers - 1
    y0, _ = _thin_fwd(
        x, wi_ref[lt], bi_ref[lt], wo_ref[lt], bo_ref[lt], num_heads, hd, hl, mm
    )
    y_ref[...] = y0.astype(y_ref.dtype)  # [TB, D]


def _stack_bwd_kernel(
    x_ref, lens_ref, g_ref, wi_ref, bi_ref, wo_ref, bo_ref,
    dx_ref, dwi_ref, dbi_ref, dwo_ref, dbo_ref,
    *, num_heads, num_layers,
):
    tb, hp, d = x_ref.shape
    hd = d // num_heads
    mm = _mm_dtype(x_ref.dtype)
    hl = lens_ref[...].reshape(tb, 1, 1)
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        dwi_ref[...] = jnp.zeros_like(dwi_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    x = x_ref[...].astype(jnp.float32)
    residuals = []
    for l in range(num_layers - 1):
        x, res = _layer_fwd(
            x, wi_ref[l], bi_ref[l], wo_ref[l], bo_ref[l], num_heads, hd, hl, mm
        )
        residuals.append(res)
    lt = num_layers - 1
    _, thin_res = _thin_fwd(
        x, wi_ref[lt], bi_ref[lt], wo_ref[lt], bo_ref[lt], num_heads, hd, hl, mm
    )

    g0 = g_ref[...].astype(jnp.float32)  # [TB, D]
    dy, dwi_l, dbi_l, dwo_l, dbo_l = _thin_bwd(
        thin_res, g0, wi_ref[lt], wo_ref[lt], num_heads, hd, hl, mm
    )
    dwi_ref[lt] += dwi_l
    dbi_ref[lt] += dbi_l
    dwo_ref[lt] += dwo_l
    dbo_ref[lt] += dbo_l
    for l in range(num_layers - 2, -1, -1):
        dy, dwi_l, dbi_l, dwo_l, dbo_l = _layer_bwd(
            residuals[l], dy, wi_ref[l], wo_ref[l], num_heads, hd, hl, mm
        )
        dwi_ref[l] += dwi_l
        dbi_ref[l] += dbi_l
        dwo_ref[l] += dwo_l
        dbo_ref[l] += dbo_l
    dx_ref[...] = dy.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_attn_stack(
    x: jnp.ndarray,  # [B, H, D] — PE already added, invalid rows zeroed
    lengths: jnp.ndarray,  # [B] int32 valid-history counts (>= 1)
    w_in: jnp.ndarray,  # [L, D, 3D]
    b_in: jnp.ndarray,  # [L, 3D]
    w_out: jnp.ndarray,  # [L, D, D]
    b_out: jnp.ndarray,  # [L, D]
    num_heads: int,
    tile_b: int = 64,
) -> jnp.ndarray:
    """[B, H, D] -> [B, D]: row 0 of the length-masked attention stack."""
    y, _ = _stack_fwd_impl(x, lengths, w_in, b_in, w_out, b_out, num_heads, tile_b)
    return y


def _stack_fwd_impl(x, lengths, w_in, b_in, w_out, b_out, num_heads, tile_b):
    from two_tower_models_tpu.ops.pallas.fused_mha import _pad_bh

    b, h_true, d = x.shape
    num_layers = w_in.shape[0]
    hp = _round_up(h_true, _sublane(x.dtype))
    tile_b = _vmem_tile(tile_b, num_layers, hp, d, x.dtype, 192)
    xp = _pad_bh(x, tile_b, hp)
    lp = _pad_lens(lengths, tile_b)
    bp = xp.shape[0]
    y = pl.pallas_call(
        functools.partial(
            _stack_fwd_kernel, num_heads=num_heads, num_layers=num_layers
        ),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
        ],
        out_specs=pl.BlockSpec(
            (tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, d), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(
        xp, lp,
        *_weight_args(w_in, b_in, w_out, b_out, num_layers),
    )
    return y[:b], tile_b


def _stack_vjp_fwd(x, lengths, w_in, b_in, w_out, b_out, num_heads, tile_b):
    y, _ = _stack_fwd_impl(x, lengths, w_in, b_in, w_out, b_out, num_heads, tile_b)
    return y, (x, lengths, w_in, b_in, w_out, b_out)


def _stack_vjp_bwd(num_heads, tile_b, res, g):
    from two_tower_models_tpu.ops.pallas.fused_mha import _pad_bh

    x, lengths, w_in, b_in, w_out, b_out = res
    b, h_true, d = x.shape
    num_layers = w_in.shape[0]
    hp = _round_up(h_true, _sublane(x.dtype))
    tile_b = _vmem_tile(tile_b, num_layers, hp, d, x.dtype, 192)
    xp = _pad_bh(x, tile_b, hp)
    lp = _pad_lens(lengths, tile_b)
    bp = xp.shape[0]
    gp = jnp.pad(g.astype(x.dtype), ((0, bp - b), (0, 0)))
    dx, dwi, dbi, dwo, dbo = pl.pallas_call(
        functools.partial(
            _stack_bwd_kernel, num_heads=num_heads, num_layers=num_layers
        ),
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, hp, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *_weight_specs(num_layers, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, hp, d), x.dtype),
            *_weight_grad_shapes(num_layers, d),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(
        xp, lp, gp,
        *_weight_args(w_in, b_in, w_out, b_out, num_layers),
    )
    import numpy as np

    return (
        dx[:b, :h_true],
        np.zeros(lengths.shape, jax.dtypes.float0),
        dwi.astype(w_in.dtype),
        dbi.reshape(num_layers, -1).astype(b_in.dtype),
        dwo.astype(w_out.dtype),
        dbo.reshape(num_layers, -1).astype(b_out.dtype),
    )


fused_attn_stack.defvjp(_stack_vjp_fwd, _stack_vjp_bwd)
