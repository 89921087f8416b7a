"""Pallas kernels for exact tile-max MIPS top-k (retrieval.mips.
mips_topk_exact_tilemax is the algorithm; these replace its two
memory-bound passes).

Why kernels: measured on v5e at C=1M x 64, B=1024, k=100 (BASELINE.md),
  * pass 1 in XLA spills the [B, chunk] score matrix to HBM every chunk
    (~4 GB of f32 traffic for a 128 MB corpus) — 5.2 ms;
  * pass 3 in XLA lowers the candidate-tile gather pathologically
    (37 ms execute, minutes to compile) and the [B,k,TILE,D] rescore
    einsum as per-batch matvecs (~25 ms).

``tile_max_scores``: one fused matmul + per-tile max per (query-block,
corpus-chunk) grid step; scores live only in VMEM.  The kernel computes the
TRANSPOSED [chunk, QB] score block so the tile reduction splits the leading
(sublane) axis — no in-kernel relayout — and the [NT, B] output transposes
once outside (32 MB, one XLA pass).

``gather_rescore``: grid over query groups of 8; each sub-query's k selected
corpus tiles stream in via scalar-prefetched dynamic-offset DMAs (ring of
in-flight copies, double-buffered across sub-queries), then ONE
[P, 128] x [k*TILE/P, 128]^T contraction scores all candidates — no
[B,k,TILE,D] tensor ever exists.  DMA'd rows must be 128-lane aligned
(Mosaic); corpora narrower than a lane row are PACKED P = 128//D rows per
VMEM row (free row-major reshape) instead of zero-padded, so the tile DMAs
stream exactly the corpus bytes (unpacked lane padding cost 2x traffic at
D=64); wider corpora pad to the next 128 multiple as before.

The reference's corresponding surface is the brute-force
``torch.topk(query @ corpus.T)`` (baseline_mips_module.py:57-61).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from two_tower_models_tpu.ops.pallas.fused_softmax import _interpret

_NEG_INF = float("-inf")
_QG = 8  # queries per gather_rescore program (f32 sublane granularity)
# In-flight tile DMAs per sub-query.  r5 ablation on the flat-select
# pipeline (1M x 64, B=1024, k=100): ring8 18.06 ms, ring16 16.76 (-7%),
# ring128/all-up-front 18.97 (queue contention beyond ~32 in flight) —
# 16 is the measured sweet spot; sweepable via exp_exact_pipeline.py.
_RING = 16
# Unroll factor for the gather drain loop: pass 3 is DMA-ISSUE-bound (the r4
# ablation: doubling DMA bytes via nopack cost only ~5%, so the scalar core's
# per-iteration wait/start overhead — not HBM bandwidth — sets the pass time).
# Unrolling amortizes the fori_loop's scalar bookkeeping across several
# wait/start pairs per trip.  1 = the r4 shape (sweepable in
# scripts/exp_exact_pipeline.py).
_GATHER_UNROLL = 1


# ---------------------------------------------------------------------------
# Pass 1: fused scores + per-tile max
# ---------------------------------------------------------------------------


def _tilemax_kernel(valid_ref, q_ref, c_ref, m_ref, *, tile: int, chunk: int):
    ci = pl.program_id(1)
    qb = q_ref.shape[0]
    s_t = jax.lax.dot_general(
        c_ref[...], q_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [CHUNK, QB] — transposed so the tile axis is the leading one

    # The padding mask (rows >= valid_count -> -inf) costs ~3 VPU passes over
    # the full [CHUNK, QB] score block — as much as the tile-max reduce
    # itself — but only chunks overlapping the valid boundary need it.
    # Branching per chunk cuts pass 1's VPU work roughly in half (all-but-one
    # chunk takes the unmasked branch when the corpus fills its padding).
    needs_mask = (ci + 1) * chunk > valid_ref[0, 0]

    @pl.when(needs_mask)
    def _masked():
        row = jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 0) + ci * chunk
        s = jnp.where(row < valid_ref[0, 0], s_t, _NEG_INF)
        m_ref[...] = jnp.max(s.reshape(chunk // tile, tile, qb), axis=1)

    @pl.when(jnp.logical_not(needs_mask))
    def _unmasked():
        m_ref[...] = jnp.max(s_t.reshape(chunk // tile, tile, qb), axis=1)


def tile_max_scores(
    query: jnp.ndarray,  # [B, D] — bf16 recommended
    corpus_p: jnp.ndarray,  # [C_pad, D], C_pad % chunk == 0
    tile: int,
    valid_count,  # int or traced int32 scalar (dynamic inside shard_map)
    chunk: int = 2048,
    query_block: int = 512,
    transposed: bool = False,
) -> jnp.ndarray:
    """m[b, t] = max over the t-th corpus tile of <query_b, corpus_row> with
    rows >= valid_count masked to -inf.  Returns [B, C_pad // tile] f32, or
    the kernel's native [C_pad // tile, B] layout when ``transposed`` (the
    tournament-select pass consumes that directly — no XLA transpose)."""
    b, d = query.shape
    c_pad = corpus_p.shape[0]
    assert c_pad % chunk == 0 and chunk % tile == 0
    qb = min(query_block, b)
    assert b % qb == 0
    n_tiles = c_pad // tile
    valid = jnp.asarray(valid_count, jnp.int32).reshape(1, 1)

    m_t = pl.pallas_call(
        functools.partial(_tilemax_kernel, tile=tile, chunk=chunk),
        grid=(b // qb, c_pad // chunk),
        in_specs=[
            pl.BlockSpec((1, 1), lambda qi, ci: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((qb, d), lambda qi, ci: (qi, 0)),
            pl.BlockSpec((chunk, d), lambda qi, ci: (ci, 0)),
        ],
        out_specs=pl.BlockSpec(
            (chunk // tile, qb), lambda qi, ci: (ci, qi)
        ),
        out_shape=jax.ShapeDtypeStruct((n_tiles, b), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the [CHUNK, QB] f32 score block is the kernel's footprint;
            # sweep configs beyond chunk*qb = 1M elements (pass-1 sweep,
            # scripts/exp_exact_pipeline.py) legitimately exceed the 16 MB
            # default scoped limit (measured r4: 18 MB at c4096/qb1024).
            # 4x the block bounds the mask-branch temporaries; v5e has
            # 128 MB of VMEM.
            vmem_limit_bytes=min(
                100 * 1024 * 1024,
                max(16 * 1024 * 1024, 4 * 4 * chunk * qb),
            ),
        ),
        interpret=_interpret(),
    )(valid, query, corpus_p)
    return m_t if transposed else m_t.T


# ---------------------------------------------------------------------------
# Pass 2: k-selection over the tile maxes (tournament select)
# ---------------------------------------------------------------------------
#
# lax.top_k over the [B, NT] tile maxes was 10.6 ms of the 32.6 ms exact
# pipeline at 1M x 64 (BASELINE.md pass decomposition) — XLA's top-k is
# ~linear in row width with a large constant.  This kernel runs k rounds of
# (vector max -> lowest-index argmax -> mask) over a sublane-transposed
# [NT, QB] block that never leaves VMEM: each round is a handful of
# elementwise/reduce passes, fully vectorized across the 128 query lanes.
#
# Selection runs on a monotone INT32 KEY of the f32 scores (see _f32_keys)
# so the order is lax.top_k's TOTAL order — including -0.0 < +0.0 (a plain
# `x == m` float compare treats them equal and returns the wrong winner on
# zero-score ties; XLA's sort comparator does not) and NaN above +inf — and
# the mask value INT32_MIN sits strictly below every real key (float -inf
# maps above it), so an exhausted column keeps picking distinct ascending
# indices instead of re-picking row 0.  Tie behavior matches lax.top_k
# exactly (lowest index first); selection order IS descending score order.

_INT_MIN = -(1 << 31)


def _f32_keys(x: jnp.ndarray) -> jnp.ndarray:
    """Monotone int32 key of f32: float total order (signed zeros, infs,
    NaN-above-inf) becomes int32 order.  Invertible via _keys_f32."""
    b = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
    return jnp.where(b < 0, (~b) + jnp.int32(_INT_MIN), b)


def _keys_f32(k: jnp.ndarray) -> jnp.ndarray:
    b = jnp.where(k < 0, ~(k + jnp.int32(_INT_MIN)), k)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _select_topk_kernel(x_hbm, idx_ref, val_ref, xs, sem, *, k: int, qb: int):
    # one DMA brings this program's [NT, QB] key block into the scratch;
    # the k extraction rounds then mutate it in place (a blocked input +
    # fori carry held TWO copies plus double-buffering and blew the 16 MB
    # scoped-VMEM limit at NT=7824 on v5e — measured)
    q0 = pl.program_id(0) * qb
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(q0, qb)], xs, sem)
    cp.start()
    cp.wait()
    nt = xs.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (nt, qb), 0)

    def body(j, _):
        x = xs[...]
        m = jnp.max(x, axis=0, keepdims=True)  # [1, QB]
        i = jnp.min(jnp.where(x == m, iota, nt), axis=0, keepdims=True)
        idx_ref[pl.ds(j, 1), :] = i
        val_ref[pl.ds(j, 1), :] = m
        xs[...] = jnp.where(iota == i, jnp.int32(_INT_MIN), x)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


# Above this row count the [NT, 128] f32 scratch won't fit scoped VMEM
# alongside its temporaries; select_topk_t splits taller inputs into
# row chunks and merges (hierarchical select, bit-exact — see below).
_SELECT_MAX_ROWS = 12288

# Below this candidate-pool width, XLA's lax.top_k is cheap enough that the
# kernelized pass-4 selection isn't worth its fixed costs.
_PASS4_MIN_POOL = 4096

# A/B switch for narrow-corpus row packing in gather_rescore
# (scripts/exp_exact_pipeline.py sweeps it; leave True in production).
_PACK = True

# SMEM budget for gather_rescore's scalar-prefetched [B, k] tile-index
# operand (v5e SMEM is 1 MB/core; 512 KB leaves headroom).  Query batches
# whose B*k*4 exceeds it run the pipeline in blocks (see
# mips_topk_exact_pallas).
_GATHER_SMEM_BYTES = 512 * 1024

# Supertile-pruned selection for pipeline passes 2+4: measured a 1.8x
# REGRESSION at the 1M x 64 / B=1024 benchmark (32.4 ms pruned vs 18.1 ms
# flat, r4 harvest in BASELINE.md) — the survivor row gather
# (take_along_axis over [NT, B] keys) costs more than the k*(7/8)*NT
# tournament row passes it saves.  Flat is the default; the pruned kernel
# stays correct (bit-exact, parity-tested) for ablation via
# scripts/exp_exact_pipeline.py --variants pruned_select.
_PRUNED_SELECT = False


def _gather_query_block(b: int, k: int):
    """Largest lane-aligned query block whose [qblk, k] i32 tile-index
    operand fits the gather kernel's SMEM budget.

    Returns ``None`` when even a 128-query block overflows the budget
    (k > _GATHER_SMEM_BYTES / (4*128) = 1024 at the default budget) — the
    caller must fall back to the dense exact scan (ADVICE r4: the old
    floor-at-256 guard re-exceeded the budget for k >= 512 and overflowed
    v5e's 1 MB SMEM outright at k >= 1024).
    """
    max_qblk = (_GATHER_SMEM_BYTES // (4 * max(k, 1))) // 128 * 128
    if max_qblk < 128:
        return None
    if b <= max_qblk:
        return b
    return max_qblk


def _pipeline_select(scores_t: jnp.ndarray, k: int):
    """Pass-2/4 selection entry: flat tournament by default (see
    _PRUNED_SELECT)."""
    sel = select_topk_t_pruned if _PRUNED_SELECT else select_topk_t
    return sel(scores_t, k)


def _select_keys_t(keys_t: jnp.ndarray, k: int, query_block: int = 128):
    """Key-space core of select_topk_t: (key values [k, B], indices [k, B])
    of the per-column top-k over int32 keys, descending, ties by lowest
    index.

    Inputs taller than the kernel's VMEM scratch limit run HIERARCHICALLY:
    per-chunk top-k, then a final select over the k*n_chunks survivors.
    Bit-exactness survives the split: each chunk's survivor list is ordered
    (key desc, global index asc), chunks are concatenated in ascending
    index order, so "lowest position in the concatenated list" — the final
    round's tie rule — coincides with "lowest global index" for equal
    keys.  Pad rows carry INT32_MIN, which sorts strictly below every real
    key (even float -inf), so pads are only ever picked once every real row
    of a column is exhausted."""
    nt, b = keys_t.shape
    if b % 128:
        # Lane-pad the query dim: the kernel DMAs a [:, q0:q0+qb] slice of
        # the HBM operand, and Mosaic requires minor-dim slices be
        # 128-aligned (hardware-only — interpret mode doesn't check tiling;
        # caught by scripts/tpu_kernel_parity.py at B=8).  Padded columns
        # select among INT32_MIN pads only; sliced away below.
        padded = jnp.pad(
            keys_t, ((0, 0), (0, (-b) % 128)), constant_values=_INT_MIN
        )
        v, i = _select_keys_t(padded, k, query_block)
        return v[:, :b], i[:, :b]
    if nt > _SELECT_MAX_ROWS:
        ch = _SELECT_MAX_ROWS
        n_chunks = -(-nt // ch)
        if n_chunks * k >= nt:
            # The survivor list wouldn't shrink (k within a hair of the
            # chunk size) — chunking can't converge; lax.top_k over the
            # keys has identical (value, position) semantics.
            v, i = jax.lax.top_k(keys_t.T, k)
            return v.T, i.T
        vals, idxs = [], []
        for c in range(n_chunks):
            part = keys_t[c * ch : (c + 1) * ch]
            if part.shape[0] % 8:
                part = jnp.pad(
                    part, ((0, (-part.shape[0]) % 8), (0, 0)),
                    constant_values=_INT_MIN,
                )
            kk = min(k, part.shape[0])
            v, i = _select_keys_t(part, kk, query_block)
            if kk < k:  # short tail chunk: pad its survivor list
                v = jnp.pad(v, ((0, k - kk), (0, 0)), constant_values=_INT_MIN)
                i = jnp.pad(i, ((0, k - kk), (0, 0)))
            vals.append(v)
            idxs.append(i + c * ch)
        cat_v = jnp.concatenate(vals)  # [n_chunks*k, B]
        cat_i = jnp.concatenate(idxs)
        if cat_v.shape[0] % 8:
            cat_v = jnp.pad(
                cat_v, ((0, (-cat_v.shape[0]) % 8), (0, 0)),
                constant_values=_INT_MIN,
            )
            cat_i = jnp.pad(cat_i, ((0, cat_v.shape[0] - cat_i.shape[0]), (0, 0)))
        fv, fp = _select_keys_t(cat_v, k, query_block)  # positions into cat
        fi = jnp.take_along_axis(cat_i, fp, axis=0)
        return fv, fi
    qb = b if b <= query_block else query_block
    assert b % qb == 0 and nt % 8 == 0, (nt, b)
    assert k <= nt
    idx, val = pl.pallas_call(
        functools.partial(_select_topk_kernel, k=k, qb=qb),
        grid=(b // qb,),
        # Pin the operand to HBM: under ANY, Mosaic promotes a fitting
        # operand (<16 MB) into scoped VMEM, and operand + the [NT, QB]
        # scratch together blew the 16 MB limit at NT=12288, B=256 on v5e
        # (measured r4) — the kernel DMAs its own slice, HBM is the design.
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((k, qb), lambda q: (0, q)),
            pl.BlockSpec((k, qb), lambda q: (0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, b), jnp.int32),
            jax.ShapeDtypeStruct((k, b), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nt, qb), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # At NT=12288 the compiler's scoped-VMEM accounting charges ~3x
            # the [NT, QB] chunk (scratch + the staged HBM slice copy), which
            # overflows the 16 MB default at the top of the hierarchy's
            # range (measured r4: 18 MB at NT=12288 for ANY B).  v5e has
            # 128 MB of VMEM; 32 MB bounds the worst case with headroom.
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(keys_t)
    return val, idx


def select_topk_t(
    scores_t: jnp.ndarray,  # [NT, B] f32 — TRANSPOSED scores (column/query)
    k: int,
    query_block: int = 128,
):
    """(values [k, B], indices [k, B]) of the per-column top-k, descending,
    in lax.top_k's TOTAL order (ties by lowest index; -0.0 after +0.0; NaN
    above +inf) — bit-identical to lax.top_k on scores_t.T.  Rows beyond a
    multiple of 8 are padded with -inf by the caller.  Selection runs on a
    monotone int32 key (one elementwise pass); see _select_keys_t for the
    tall-input hierarchy.

    One departure from the raw key map: keys are clamped to INT32_MIN + 1 so
    the kernel's mask sentinel stays strictly below every input.  The only
    f32 value that maps to INT32_MIN is the full-payload negative NaN
    0xFFFFFFFF — unclamped, masking a picked element would not change it and
    the same index would be re-picked k times.  The clamp merges that NaN
    with its payload-neighbor (still returned as a negative NaN); scores
    from real dot products are never NaN, so the pipeline is unaffected."""
    keys = jnp.maximum(_f32_keys(scores_t), jnp.int32(_INT_MIN + 1))
    val_k, idx = _select_keys_t(keys, k, query_block)
    return _keys_f32(val_k), idx


def select_topk_t_pruned(
    scores_t: jnp.ndarray,  # [NT, B] f32 — transposed scores
    k: int,
    sup: int = 8,
    query_block: int = 128,
):
    """select_topk_t with supertile-max pruning — same contract, bit-exact.

    The flat tournament costs k full passes over [NT, B].  This applies the
    tile-max theorem one level up: group rows into supertiles of ``sup``,
    take the per-supertile max (one pass), select the top-k SUPERTILES (k
    passes over NT/sup rows), then select within the gathered k*sup
    surviving rows.  At most k supertiles can have max >= the k-th row
    value (each must contain a strictly-higher row, of which there are
    < k), and supertiles tied at the threshold are taken in ascending index
    order — the order containing the lowest-index tied rows — so the
    survivor set always contains the exact top-k.  Survivor rows are
    gathered in ascending row order, so the final positional tie-break
    equals the flat kernel's lowest-index rule.  Row-pass cost drops from
    k*NT to NT + k*(NT/sup + k*sup).
    """
    nt, b = scores_t.shape
    # clamp: keep the mask sentinel strictly below every input key (the
    # full-payload negative NaN maps to INT32_MIN — see select_topk_t)
    keys = jnp.maximum(_f32_keys(scores_t), jnp.int32(_INT_MIN + 1))
    if k * sup >= nt or nt < 4 * sup:
        val_k, idx = _select_keys_t(keys, k, query_block)
        return _keys_f32(val_k), idx
    ntp = nt + ((-nt) % sup)
    kp = keys
    if ntp != nt:
        kp = jnp.pad(kp, ((0, ntp - nt), (0, 0)), constant_values=_INT_MIN)
    sm = jnp.max(kp.reshape(ntp // sup, sup, b), axis=1)  # [NS, B]
    # Note on degenerate columns: an all--inf supertile's key max is
    # key(-inf), which sits strictly ABOVE the kernel's INT32_MIN mask, so
    # once a column's finite supers are exhausted the remaining picks walk
    # empty supers in ascending index order — never re-picking one (the
    # -inf/-inf mask collision of the float-domain kernel duplicated
    # winners here).
    if sm.shape[0] % 8:
        sm = jnp.pad(
            sm, ((0, (-sm.shape[0]) % 8), (0, 0)), constant_values=_INT_MIN
        )
    _, sidx = _select_keys_t(sm, k, query_block)  # [k, B] supertile ids
    sidx = jnp.sort(sidx, axis=0)
    rows = (
        sidx[:, None, :] * sup + jnp.arange(sup)[None, :, None]
    ).reshape(k * sup, b)  # ascending row ids per column
    g_t = jnp.take_along_axis(kp, rows, axis=0)  # [k*sup, B]
    if g_t.shape[0] % 8:
        g_t = jnp.pad(
            g_t, ((0, (-g_t.shape[0]) % 8), (0, 0)), constant_values=_INT_MIN
        )
        rows = jnp.pad(rows, ((0, g_t.shape[0] - rows.shape[0]), (0, 0)))
    vals_k, pos = _select_keys_t(g_t, k, query_block)
    return _keys_f32(vals_k), jnp.take_along_axis(rows, pos, axis=0)


# ---------------------------------------------------------------------------
# Pass 3: gather selected tiles + rescore
# ---------------------------------------------------------------------------


def _gather_rescore_kernel(
    tidx_ref,  # SMEM [B, k] int32 (scalar prefetch): selected tile per query
    corpus_ref,  # HBM [C_pad/P, DP] — P-packed lane-aligned corpus rows
    q_ref,  # VMEM [QG, P, DP] — parity-masked queries (see gather_rescore)
    out_ref,  # VMEM [QG, P, k*ROWS] f32 — candidate scores, parity-major
    cand_ref,  # VMEM [2, k*ROWS, DP] scratch — gathered tiles (dbl-buffered)
    sems,  # DMA semaphores [2, RING]
    *,
    k: int,
    rows: int,  # packed rows per tile = tile // P
):
    g = pl.program_id(0)

    def dma(i, j):
        return pltpu.make_async_copy(
            corpus_ref.at[pl.ds(tidx_ref[g * _QG + i, j] * rows, rows), :],
            cand_ref.at[i % 2, pl.ds(j * rows, rows), :],
            sems.at[i % 2, j % _RING],
        )

    def warm(i):
        def w(j, _):
            dma(i, j).start()
            return 0

        jax.lax.fori_loop(0, min(_RING, k), w, 0)

    # Static unroll over sub-queries, software-pipelined one ahead: sub-query
    # i+1's ring fills (into the other cand buffer / sem bank) BEFORE i's
    # drain, so the HBM pipe holds 2*_RING tile DMAs and never empties at
    # sub-query boundaries.  Safe: the i-1 user of buffer (i+1) % 2 finished
    # all its waits and its matmul read before warm(i+1) issues.
    warm(0)
    u = max(1, min(_GATHER_UNROLL, k))
    for i in range(_QG):
        if i + 1 < _QG:
            warm(i + 1)

        def pair(i, j):
            # j may be traced (loop body) or static (tail); same semantics
            dma(i, j).wait()
            if isinstance(j, int):  # static tail: resolve the guard in Python
                if j + _RING < k:
                    dma(i, j + _RING).start()
            else:

                @pl.when(j + _RING < k)
                def _():
                    dma(i, j + _RING).start()

        if u == 1:

            def steady(j, _):
                pair(i, j)
                return 0

            jax.lax.fori_loop(0, k, steady, 0)
        else:
            # unrolled drain: u wait/start pairs per scalar-loop trip, then a
            # statically-unrolled tail for k % u
            def steady_u(jj, _):
                for t in range(u):
                    pair(i, jj * u + t)
                return 0

            jax.lax.fori_loop(0, k // u, steady_u, 0)
            for j in range((k // u) * u, k):
                pair(i, j)

        out_ref[i] = jax.lax.dot_general(
            q_ref[i], cand_ref[i % 2],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, k*ROWS] — parity p scores the corpus rows packed at lane
        # offset p*D (q_ref[i, p] is zero outside those lanes)


def gather_rescore(
    query: jnp.ndarray,  # [B, D] — B % 8 == 0 (D arbitrary; padded here)
    corpus_p: jnp.ndarray,  # [C_pad, D] — C_pad % tile == 0
    tile_idx: jnp.ndarray,  # [B, k] int32
    tile: int,
) -> jnp.ndarray:
    """cand_scores[b, j*TILE + c] = <query_b, corpus[tile_idx[b,j]*TILE + c]>.

    Returns [B, k*TILE] f32.  Out-of-range (padded-corpus) candidates are the
    caller's job to mask — they carry real dot products of zero pad rows.

    Narrow corpora are PACKED P = 128//D rows per 128-lane VMEM row (a free
    row-major reshape), cutting the tile-DMA traffic by P (at D=64 the
    unpacked kernel streamed 2x the corpus bytes through lane padding).  Each
    sub-query then scores all parities in one [P, 128] x [128, k*TILE/P]
    contraction against parity-masked query copies, and the [B, P, k*TILE/P]
    output de-interleaves back to ascending candidate order outside."""
    b, d = query.shape
    assert b % _QG == 0, b
    # the DMA scratch is allocated in query.dtype and streams corpus rows
    assert corpus_p.dtype == query.dtype, (corpus_p.dtype, query.dtype)
    k = tile_idx.shape[1]

    pack = 128 // d if _PACK and 128 % d == 0 and tile % (128 // d) == 0 else 1
    if pack > 1:
        assert corpus_p.shape[0] % pack == 0
        dp = 128
        corpus_k = corpus_p.reshape(corpus_p.shape[0] // pack, dp)
        # q_masked[b, p, p*D:(p+1)*D] = query[b]; zero elsewhere
        q_masked = (
            jnp.eye(pack, dtype=query.dtype)[None, :, :, None]
            * query[:, None, None, :]
        ).reshape(b, pack, dp)
    else:
        dp = d + ((-d) % 128)
        corpus_k = (
            jnp.pad(corpus_p, ((0, 0), (0, dp - d))) if dp != d else corpus_p
        )
        q_pad = jnp.pad(query, ((0, 0), (0, dp - d))) if dp != d else query
        q_masked = q_pad[:, None, :]
    rows = tile // pack

    out = pl.pallas_call(
        functools.partial(_gather_rescore_kernel, k=k, rows=rows),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // _QG,),
            in_specs=[
                # pinned (not ANY): small corpora fit Mosaic's VMEM-promotion
                # heuristic and would double-count against scoped VMEM next
                # to the candidate scratch — the ring DMA wants HBM anyway
                pl.BlockSpec(memory_space=pltpu.HBM),  # corpus
                pl.BlockSpec((_QG, pack, dp), lambda g, tidx: (g, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (_QG, pack, k * rows), lambda g, tidx: (g, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, k * rows, dp), query.dtype),
                pltpu.SemaphoreType.DMA((2, _RING)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, pack, k * rows), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(tile_idx.astype(jnp.int32), corpus_k, q_masked)
    if pack == 1:
        return out.reshape(b, k * tile)
    # out[b, p, j*ROWS + r] scores corpus row tile*tidx + (r*P + p):
    # transposing parities under the row axis restores ascending candidate
    # order (required by the caller's positional tie-break)
    return jnp.transpose(out, (0, 2, 1)).reshape(b, k * tile)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


def mips_topk_exact_pallas(
    corpus: jnp.ndarray,  # [C, D]
    query: jnp.ndarray,  # [B, D]
    k: int,
    tile: int = 128,
    chunk: int = 2048,
    valid_count=None,  # int or traced scalar: rows >= this are padding
):
    """Exact MIPS top-k: Pallas passes 1+3 around XLA's narrow selections.

    Same contract and exactness argument as
    ``retrieval.mips.mips_topk_exact_tilemax`` (see its docstring); returns
    (indices [B,k], scores [B,k], embeddings [B,k,D]).  ``valid_count`` may
    be a traced scalar (per-shard valid row counts inside ``shard_map``);
    the small-corpus fallback decision stays static (based on C).
    """
    from two_tower_models_tpu.retrieval.mips import mips_topk

    c, d = corpus.shape
    b = query.shape[0]
    k = min(k, c)
    n_tiles = -(-c // tile)
    # Bound the gather kernel's scalar-prefetch operand: the [B, k] i32
    # tile-index array lives in SMEM (1 MB/core on v5e), so B·k·4 bytes
    # above ~1 MB fails Mosaic compilation (hit at B=4096, k=100 — the
    # mns_scale eval).  Large query batches run the pipeline in
    # lane-aligned blocks under a scan; 512 KB leaves headroom for other
    # SMEM users.  The bench shape (B=1024, k=100 = 400 KB) stays one
    # dispatch.  qblk is None when no block size fits (k > 1024): the
    # pipeline cannot run and the dense scan below is the exact fallback.
    qblk = _gather_query_block(b, k)
    if k * tile >= c or n_tiles < k or qblk is None:
        # corpus too small for tile pruning, or k too large for the gather
        # kernel's SMEM budget — one dense scan (no SMEM constraint)
        if valid_count is None:
            return mips_topk(corpus, query, k)
        # dense fallback with padded rows: mask them before selecting
        full = jnp.dot(query, corpus.T, preferred_element_type=jnp.float32)
        fcol = jax.lax.broadcasted_iota(jnp.int32, full.shape, 1)
        full = jnp.where(fcol < jnp.asarray(valid_count), full, _NEG_INF)
        scores, idx = jax.lax.top_k(full, k)
        return idx, scores, jnp.take(corpus, idx, axis=0)

    if b > qblk:
        nq = -(-b // qblk)
        qpad = nq * qblk - b
        q_all = jnp.pad(query, ((0, qpad), (0, 0))) if qpad else query
        _, outs = jax.lax.scan(
            lambda _, qq: (
                None,
                mips_topk_exact_pallas(corpus, qq, k, tile, chunk, valid_count),
            ),
            None,
            q_all.reshape(nq, qblk, d),
        )
        idx, scores, emb = (x.reshape(-1, *x.shape[2:])[:b] for x in outs)
        return idx, scores, emb

    valid = c if valid_count is None else valid_count

    # Mixed-dtype callers (f32 queries over a bf16 corpus): score in the
    # promoted dtype, matching what XLA's dense `q @ corpus.T` would compute,
    # so the bit-exactness claim vs lax.top_k holds (ADVICE r2).
    ct = jnp.promote_types(query.dtype, corpus.dtype)
    query = query.astype(ct)
    corpus_k = corpus.astype(ct)

    pad = -(-c // chunk) * chunk - c
    corpus_pc = jnp.pad(corpus_k, ((0, pad), (0, 0))) if pad else corpus_k
    # Pad the query batch so (a) gather_rescore's _QG grouping divides it and
    # (b) tile_max_scores' query block divides it (ADVICE r2 high: B=520 used
    # to trip the qb assert).  Small batches become a single full-width block
    # (Mosaic allows a block dim equal to the array dim); large ones round up
    # to the block size, which is already a multiple of _QG.
    query_block = 512
    if b <= query_block:
        qb = b + ((-b) % _QG)
    else:
        qb = query_block
        assert qb % _QG == 0
    qpad = (-b) % qb
    query_p = jnp.pad(query, ((0, qpad), (0, 0))) if qpad else query
    bp = query_p.shape[0]

    m_t = tile_max_scores(
        query_p, corpus_pc, tile, valid, chunk=chunk, query_block=qb,
        transposed=True,
    )  # [NT, BP] — kernel-native layout, fed straight to the select
    # tournament select wants lanes in 128-groups (or a single full
    # block) and a sublane-aligned row count; taller-than-VMEM tile-max
    # matrices split hierarchically inside select_topk_t
    spad = 0 if bp <= 128 else (-bp) % 128
    ntpad = (-m_t.shape[0]) % 8
    if spad or ntpad:
        m_t = jnp.pad(
            m_t, ((0, ntpad), (0, spad)), constant_values=_NEG_INF
        )
    _, idx_t = _pipeline_select(m_t, k)  # [k, BP(+pad)]
    tile_idx = idx_t[:, :bp].T  # [BP, k]
    # Sort the selected tiles ascending so the candidate pool is in global
    # index order: pass 4's lax.top_k breaks float ties by POSITION, and only
    # with an index-ordered pool does that coincide with dense lax.top_k's
    # lowest-global-index rule.  Rank-ordered pools returned the wrong
    # element when equal scores spanned tiles at the k-th boundary.
    tile_idx = jnp.sort(tile_idx, axis=1)

    # lane alignment / narrow-corpus packing happens inside gather_rescore
    cand_scores = gather_rescore(query_p, corpus_pc, tile_idx, tile)
    cand_gidx = (
        tile_idx[:, :, None] * tile + jnp.arange(tile)[None, None, :]
    ).reshape(bp, k * tile)
    cand_scores = jnp.where(cand_gidx < jnp.asarray(valid), cand_scores, _NEG_INF)

    pool = cand_scores.shape[1]
    if pool >= _PASS4_MIN_POOL:
        # pass 4 through the tournament select: lax.top_k over the
        # [B, k*TILE] candidates was ~3.2 ms of the pipeline at 1M x 64
        # (BASELINE.md).  Tie rule is preserved: the pool is in ascending
        # global-index order (tiles sorted above).
        cs_t = cand_scores.T  # [pool, BP]
        cpad = 0 if bp <= 128 else (-bp) % 128
        if cpad or pool % 8:
            cs_t = jnp.pad(
                cs_t, ((0, (-pool) % 8), (0, cpad)), constant_values=_NEG_INF
            )
        vals_t, pos_t = _pipeline_select(cs_t, k)
        top_scores = vals_t[:, :bp].T
        sel = pos_t[:, :bp].T
    else:
        top_scores, sel = jax.lax.top_k(cand_scores, k)
    top_idx = jnp.take_along_axis(cand_gidx, sel, axis=1)
    if qpad:
        top_scores, top_idx = top_scores[:b], top_idx[:b]
    top_emb = jnp.take(corpus, top_idx, axis=0)
    return top_idx, top_scores, top_emb
