"""Kernel parity on the LIVE backend (real TPU when available).

The pytest suite forces a CPU backend (tests/conftest.py), which exercises
the Pallas kernels in interpret mode only — Mosaic compilation bugs and
TPU-numerics drift are invisible to it.  This script runs every kernel's
forward + VJP against its dense reference on whatever backend JAX selects,
with tolerances appropriate to the backend (TPU f32 matmuls accumulate
differently than CPU; observed fwd drift up to ~2e-3 at B=4096).

Run on the TPU container:  python scripts/tpu_kernel_parity.py
Exit code 0 = all parities hold.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))


def check(name, got, want, tol):
    r = _rel(got, want)
    status = "ok" if r <= tol else "FAIL"
    print(f"{status:4s} {name}: rel err {r:.3e} (tol {tol:g})")
    return r <= tol


def main():
    on_tpu = jax.default_backend() == "tpu"
    # TPU f32 scores at B=4k accumulate through bf16-ish passes in places;
    # measured drift up to ~2e-3 on the encoder forward.
    tol_f32 = 5e-3 if on_tpu else 5e-4
    tol_bf16 = 3e-2
    ok = True
    print(f"backend: {jax.default_backend()}")

    # ---- fused MHA layer -------------------------------------------------
    from two_tower_models_tpu.ops.pallas.fused_mha import (
        fused_mha_layer,
        mha_layer_reference,
    )

    B, H, D, NH = 1024, 32, 64, 4
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (B, H, D), jnp.float32)
    wi = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.05
    bi = jax.random.normal(ks[2], (3 * D,), jnp.float32) * 0.01
    wo = jax.random.normal(ks[3], (D, D), jnp.float32) * 0.05
    bo = jax.random.normal(ks[4], (D,), jnp.float32) * 0.01

    ref = mha_layer_reference(x, wi, bi, wo, bo, NH)
    ok &= check("mha fwd f32", fused_mha_layer(x, wi, bi, wo, bo, NH), ref, tol_f32)
    ok &= check(
        "mha fwd bf16",
        fused_mha_layer(x.astype(jnp.bfloat16), wi, bi, wo, bo, NH), ref, tol_bf16,
    )
    g_ref = jax.grad(lambda *a: jnp.sum(mha_layer_reference(*a, NH) ** 2), (0, 1, 3))(
        x, wi, bi, wo, bo
    )
    g_f = jax.grad(lambda *a: jnp.sum(fused_mha_layer(*a, NH) ** 2), (0, 1, 3))(
        x, wi, bi, wo, bo
    )
    for n, a, b in zip(("dx", "dwi", "dwo"), g_f, g_ref):
        ok &= check(f"mha vjp {n} f32", a, b, tol_f32)

    # ---- whole-encoder kernel -------------------------------------------
    import dataclasses

    from two_tower_models_tpu.config import HistoryEncoderConfig
    from two_tower_models_tpu.models.history_encoder import (
        history_encoder_apply,
        history_encoder_init,
    )

    # shape sweep: Mosaic bugs are often shape-dependent
    for b2, h2, d2, nh2, nl2 in [(192, 24, 128, 8, 2), (64, 64, 64, 2, 1)]:
        c2 = HistoryEncoderConfig(num_heads=nh2, num_layers=nl2)
        p2 = history_encoder_init(jax.random.key(11), d2, c2)
        x2 = jax.random.normal(jax.random.key(12), (b2, h2, d2), jnp.float32)
        ok &= check(
            f"encoder fwd f32 B{b2} H{h2} D{d2} nh{nh2} L{nl2}",
            history_encoder_apply(p2, x2, dataclasses.replace(c2, fused_encoder=True)),
            history_encoder_apply(p2, x2, c2),
            tol_f32,
        )

    cfg = HistoryEncoderConfig(num_heads=4, num_layers=3)
    fcfg = dataclasses.replace(cfg, fused_encoder=True)
    params = history_encoder_init(jax.random.key(1), D, cfg)
    he = jax.random.normal(jax.random.key(2), (B, H, D), jnp.float32)

    dense = history_encoder_apply(params, he, cfg)
    ok &= check("encoder fwd f32", history_encoder_apply(params, he, fcfg), dense, tol_f32)
    ok &= check(
        "encoder fwd bf16",
        history_encoder_apply(params, he, fcfg, compute_dtype=jnp.bfloat16),
        dense, tol_bf16,
    )

    def loss(c):
        def f(p, xx):
            out = history_encoder_apply(p, xx, c)
            w = jnp.asarray([1.0, 0.25])[None, :, None]
            return jnp.sum((out * w) ** 2)

        return jax.grad(f, argnums=(0, 1))(params, he)

    gd = loss(cfg)
    gf = loss(fcfg)  # f32 backward: exercises the VMEM-budgeted tile on TPU
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(gd), jax.tree_util.tree_leaves(gf)
    ):
        ok &= check(f"encoder vjp {jax.tree_util.keystr(path)}", b, a, tol_f32)

    # ---- fused softmax-CE -------------------------------------------------
    from two_tower_models_tpu.ops.pallas.fused_softmax import (
        fused_in_batch_ce,
        in_batch_ce_reference,
    )

    u = jax.random.normal(jax.random.key(3), (4096, 64), jnp.float32)
    it = jax.random.normal(jax.random.key(4), (4096, 64), jnp.float32)
    ce_ref, _ = in_batch_ce_reference(u, it)
    ok &= check("ce fwd f32", fused_in_batch_ce(u, it)[0], ce_ref, tol_f32)
    gu_r, gi_r = jax.grad(
        lambda u, i: jnp.sum(in_batch_ce_reference(u, i)[0]), (0, 1)
    )(u, it)
    gu_f, gi_f = jax.grad(lambda u, i: jnp.sum(fused_in_batch_ce(u, i)[0]), (0, 1))(
        u, it
    )
    ok &= check("ce vjp du f32", gu_f, gu_r, tol_f32)
    ok &= check("ce vjp di f32", gi_f, gi_r, tol_f32)

    # ---- rectangular fused_lse (cross-chip negatives core) -----------------
    from two_tower_models_tpu.ops.pallas.fused_softmax import fused_lse

    ul = jax.random.normal(jax.random.key(5), (512, 64), jnp.float32)
    il = jax.random.normal(jax.random.key(6), (4096, 64), jnp.float32)

    def lse_ref(u, i):
        return jax.nn.logsumexp(
            jnp.dot(u, i.T, preferred_element_type=jnp.float32), axis=-1
        )

    ok &= check("fused_lse fwd f32", fused_lse(ul, il), lse_ref(ul, il), tol_f32)
    g_f = jax.grad(lambda u, i: jnp.sum(fused_lse(u, i)), (0, 1))(ul, il)
    g_r = jax.grad(lambda u, i: jnp.sum(lse_ref(u, i)), (0, 1))(ul, il)
    ok &= check("fused_lse vjp du f32", g_f[0], g_r[0], tol_f32)
    ok &= check("fused_lse vjp di f32", g_f[1], g_r[1], tol_f32)

    # ---- scatter-add kernel -------------------------------------------------
    from two_tower_models_tpu.ops.pallas.scatter_add import (
        rows_scatter_add,
        rows_scatter_add_reference,
    )

    sv, sn = 1048576, 131072
    s_ids = jax.random.randint(jax.random.key(7), (sn,), 0, sv)
    s_rows = jax.random.normal(jax.random.key(8), (sn, 64), jnp.float32)
    ok &= check(
        "scatter 1M f32",
        rows_scatter_add(s_ids, s_rows, sv, tile_v=8192),
        rows_scatter_add_reference(s_ids, s_rows, sv),
        1e-5,
    )

    # ---- embedding-lookup VJP threshold wiring -----------------------------
    from two_tower_models_tpu.nn.layers import (
        _SCATTER_KERNEL_MIN_ROWS,
        embedding_lookup,
    )

    vv = _SCATTER_KERNEL_MIN_ROWS  # first vocab size that takes the kernel
    table = jax.random.normal(jax.random.key(9), (vv, 64))
    l_ids = jax.random.randint(jax.random.key(10), (4096,), 0, vv)

    def lk_loss(t):
        return jnp.sum(embedding_lookup(t, l_ids) ** 2)

    def plain_loss(t):
        return jnp.sum(jnp.take(t, l_ids, axis=0) ** 2)

    ok &= check(
        "lookup VJP (kernel path) vs autodiff",
        jax.jit(jax.grad(lk_loss))(table),
        jax.jit(jax.grad(plain_loss))(table),
        1e-5,
    )

    # ---- packed-table lookup VJP (kernel path at big vocab) ---------------
    from two_tower_models_tpu.nn.packed_table import (
        pack_table,
        packed_embedding_lookup,
        unpack_table,
    )

    pvv = max(vv, 1 << 18)
    ptable = jax.random.normal(jax.random.key(14), (pvv, 64))
    p_ids = jax.random.randint(jax.random.key(15), (4096,), 0, pvv)

    def pk_loss(tp):
        return jnp.sum(packed_embedding_lookup(tp, p_ids, 64) ** 2)

    def pk_plain(t):
        return jnp.sum(jnp.take(t, p_ids, axis=0) ** 2)

    g_packed = jax.jit(jax.grad(pk_loss))(pack_table(ptable))
    ok &= check(
        "packed lookup VJP (kernel path) vs autodiff",
        unpack_table(g_packed, pvv, 64),
        jax.jit(jax.grad(pk_plain))(ptable),
        1e-5,
    )

    # ---- in-place row writer (lazy-Adam write-back) -----------------------
    from two_tower_models_tpu.ops.pallas.rows_write import (
        merge_lane_blocks,
        rows_write,
        rows_write_reference,
    )

    rw_v, rw_n = 1 << 19, 65536  # physical rows (128-wide), update count
    rw_dst = jax.random.normal(jax.random.key(16), (rw_v, 128), jnp.float32)
    rw_lids = jnp.sort(
        jax.random.randint(jax.random.key(17), (rw_n,), 0, rw_v * 2)
    )  # logical ids at P=2
    rw_dup = jnp.concatenate(
        [jnp.zeros((1,), bool), rw_lids[1:] == rw_lids[:-1]]
    )
    rw_rows = jax.random.normal(jax.random.key(18), (rw_n, 64), jnp.float32)
    rw_pids, rw_bits, rw_vals = merge_lane_blocks(rw_lids, rw_dup, rw_rows, 2)
    ok &= check(
        "rows_write 512k f32",
        jax.jit(lambda d, i, b, v: rows_write(d, i, b, v, block_dim=64))(
            rw_dst, rw_pids, rw_bits, rw_vals
        ),
        rows_write_reference(rw_dst, rw_pids, rw_bits, rw_vals, 64),
        1e-6,
    )

    # ---- blockwise attention: flash backward -----------------------------
    from two_tower_models_tpu.ops.pallas.history_attention import (
        attention_reference,
        blockwise_self_attention,
    )

    ks = jax.random.split(jax.random.key(13), 3)
    bq = jax.random.normal(ks[0], (4, 512, 16))
    bk = jax.random.normal(ks[1], (4, 512, 16))
    bv = jax.random.normal(ks[2], (4, 512, 16))

    def loss_blk(q, k, v):
        return jnp.sum(blockwise_self_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_blk = jax.jit(jax.grad(loss_blk, argnums=(0, 1, 2)))(bq, bk, bv)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(bq, bk, bv)
    for name, a, b in zip(("dq", "dk", "dv"), g_blk, g_ref):
        ok &= check(f"blockwise flash bwd {name}", a, b, tol_f32)

    if on_tpu:
        # O(H) memory claim: at H=4096 the dense backward holds [N, H, H]
        # probability tensors; the flash backward's temps stay O(H).
        hq = jax.random.normal(ks[0], (4, 4096, 16))
        mem_blk = (
            jax.jit(jax.grad(loss_blk, argnums=(0, 1, 2)))
            .lower(hq, hq, hq).compile().memory_analysis()
        )
        mem_ref = (
            jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))
            .lower(hq, hq, hq).compile().memory_analysis()
        )
        t_blk, t_ref = mem_blk.temp_size_in_bytes, mem_ref.temp_size_in_bytes
        status = "ok" if t_blk < t_ref / 4 else "FAIL"
        print(
            f"{status:4s} blockwise bwd O(H) memory: temp {t_blk/2**20:.1f} MiB"
            f" vs dense {t_ref/2**20:.1f} MiB at H=4096"
        )
        ok &= t_blk < t_ref / 4

    # ---- exact MIPS top-k (tile-max Pallas pipeline) ---------------------
    from two_tower_models_tpu.ops.pallas.mips_topk import mips_topk_exact_pallas
    from two_tower_models_tpu.retrieval.mips import mips_topk

    mc = 200_000 if on_tpu else 30_000
    m_corpus = jax.random.normal(jax.random.key(11), (mc, 64), jnp.bfloat16)
    m_query = jax.random.normal(jax.random.key(12), (128, 64), jnp.bfloat16)
    ti, ts, _ = jax.jit(lambda c, q: mips_topk_exact_pallas(c, q, 100))(
        m_corpus, m_query
    )
    ri, rs, _ = jax.jit(lambda c, q: mips_topk(c, q, 100))(m_corpus, m_query)
    match = float(np.mean(np.asarray(ti) == np.asarray(ri)))
    status = "ok" if match == 1.0 else "FAIL"
    print(f"{status:4s} mips topk exact indices: match {match:.6f} (want 1.0)")
    ok &= match == 1.0
    ok &= check("mips topk exact scores", ts, rs, 1e-6)

    # ---- tournament select (exact top-k pass 2) ---------------------------
    from two_tower_models_tpu.ops.pallas.mips_topk import select_topk_t

    st_x = jax.random.normal(jax.random.key(19), (512, 1024))
    st_x = jnp.round(st_x * 8) / 8  # force ties
    st_v, st_i = jax.jit(lambda x: select_topk_t(x, 64))(st_x.T)
    st_rv, st_ri = jax.lax.top_k(st_x, 64)
    st_match = float(np.mean(np.asarray(st_i.T) == np.asarray(st_ri)))
    status = "ok" if st_match == 1.0 else "FAIL"
    print(f"{status:4s} tournament select indices: match {st_match:.6f} (want 1.0)")
    ok &= st_match == 1.0
    ok &= check("tournament select values", st_v.T, st_rv, 1e-7)

    # hierarchical (chunked) select: NT above the VMEM scratch limit splits
    # into per-chunk kernels + a survivor merge — must stay bit-exact on
    # hardware including cross-chunk ties (corpora beyond ~1.5M rows)
    hc_x = jax.random.normal(jax.random.key(21), (256, 16384))
    hc_x = jnp.round(hc_x * 8) / 8
    hc_v, hc_i = jax.jit(lambda x: select_topk_t(x, 100))(hc_x.T)
    hc_rv, hc_ri = jax.lax.top_k(hc_x, 100)
    hc_match = float(np.mean(np.asarray(hc_i.T) == np.asarray(hc_ri)))
    status = "ok" if hc_match == 1.0 else "FAIL"
    print(f"{status:4s} chunked select indices (NT=16384): match {hc_match:.6f} (want 1.0)")
    ok &= hc_match == 1.0
    ok &= check("chunked select values", hc_v.T, hc_rv, 1e-7)

    # ---- r3 exact-path additions -----------------------------------------
    # supertile-pruned select: ties + fewer finite supertiles than k
    from two_tower_models_tpu.ops.pallas.mips_topk import select_topk_t_pruned

    pr_x = jax.random.normal(jax.random.key(23), (256, 2048))
    pr_x = jnp.round(pr_x * 4) / 4
    pr_x = pr_x.at[:, 100:].set(float("-inf"))  # 100 finite rows, 13 supers
    pr_v, pr_i = jax.jit(lambda x: select_topk_t_pruned(x, 64))(pr_x.T)
    pr_rv, pr_ri = jax.lax.top_k(pr_x, 64)
    pr_match = float(np.mean(np.asarray(pr_i.T) == np.asarray(pr_ri)))
    status = "ok" if pr_match == 1.0 else "FAIL"
    print(f"{status:4s} pruned select indices (ties, sparse supers): match {pr_match:.6f}")
    ok &= pr_match == 1.0
    ok &= check("pruned select values", pr_v.T, pr_rv, 1e-7)

    # packed gather_rescore vs dense oracle at several widths
    from two_tower_models_tpu.ops.pallas.mips_topk import gather_rescore

    for gd, gt in [(64, 128), (32, 128), (100, 128)]:
        gc = 64 * gt
        g_corpus = jax.random.normal(jax.random.key(24), (gc, gd), jnp.bfloat16)
        g_query = jax.random.normal(jax.random.key(25), (64, gd), jnp.bfloat16)
        g_tidx = jax.random.randint(jax.random.key(26), (64, 9), 0, gc // gt)
        got = jax.jit(lambda q, c, t: gather_rescore(q, c, t, gt))(
            g_query, g_corpus, g_tidx
        )
        dense = jnp.einsum(
            "bd,cd->bc", g_query, g_corpus, preferred_element_type=jnp.float32
        )
        gidx = (g_tidx[:, :, None] * gt + jnp.arange(gt)[None, None, :]).reshape(64, -1)
        want = jnp.take_along_axis(dense, gidx, axis=1)
        ok &= check(f"gather_rescore d={gd} (pack={max(1, 128 // gd if 128 % gd == 0 else 1)})", got, want, 1e-5)

    # engineered cross-tile boundary tie: the k-th slot tie must resolve to
    # the LOWEST global index even when the tied candidate sits in a
    # higher-ranked tile (the r3 tie-order fix, on hardware)
    bt_c = np.asarray(
        jax.random.normal(jax.random.key(27), (2048, 128), jnp.float32)
    ).copy()
    bt_q = np.asarray(jax.random.normal(jax.random.key(28), (8, 128), jnp.float32))
    u = bt_q[0] / np.linalg.norm(bt_q[0])
    bt_c[1850] = u * 25
    bt_c[1900] = u * 10
    bt_c[300] = u * 10
    bt_c[50] = u * 22
    bt_c[600] = u * 21
    bt_cj, bt_qj = jnp.asarray(bt_c), jnp.asarray(bt_q)
    bt_i, _, _ = jax.jit(lambda c, q: mips_topk_exact_pallas(c, q, 4))(bt_cj, bt_qj)
    bt_ri, _, _ = jax.jit(lambda c, q: mips_topk(c, q, 4))(bt_cj, bt_qj)
    bt_match = bool((np.asarray(bt_i) == np.asarray(bt_ri)).all())
    has_300 = 300 in np.asarray(bt_ri[0])
    status = "ok" if bt_match and has_300 else "FAIL"
    print(f"{status:4s} cross-tile boundary tie: lowest-index winner on hardware")
    ok &= bt_match and has_300

    # zero-score band at the k-th boundary through the FULL pipeline: 8 tied
    # zero rows across distinct tiles, boundary inside the band — positional
    # tie-breaks must walk ascending global indices.  (A dot's +0.0
    # accumulator absorbs -0.0 products, so pipeline scores can't go
    # signed-zero; the -0.0 total-order case is covered on the select kernel
    # directly above.)
    z_q = np.asarray(jax.random.normal(jax.random.key(29), (8, 128), jnp.float32))
    z_c = np.tile(-(z_q[0] / np.linalg.norm(z_q[0])) * 30, (2048, 1)).astype(np.float32)
    for i, r in enumerate((10, 700, 1400)):
        z_c[r] = z_q[0] / np.linalg.norm(z_q[0]) * (3 - i)
    for r in (100, 200, 300, 400, 500, 600, 900, 1200):  # zero scores, 8 tiles
        z_c[r] = 0.0
    z_cj, z_qj = jnp.asarray(z_c), jnp.asarray(z_q)
    z_i, z_s, _ = jax.jit(lambda c, q: mips_topk_exact_pallas(c, q, 8))(z_cj, z_qj)
    z_ri, z_rs, _ = jax.jit(lambda c, q: mips_topk(c, q, 8))(z_cj, z_qj)
    z_match = bool((np.asarray(z_i) == np.asarray(z_ri)).all())
    z_order = list(np.asarray(z_ri[0])) == [10, 700, 1400, 100, 200, 300, 400, 500]
    status = "ok" if z_match and z_order else "FAIL"
    print(f"{status:4s} zero-score boundary band: ascending-index ties on hardware")
    ok &= z_match and z_order
    ok &= check("zero-band scores", z_s, z_rs, 1e-6)

    # ---- fused adam -------------------------------------------------------
    import optax

    from two_tower_models_tpu.ops.pallas.fused_adam import fused_adam_step

    p = {"t": jax.random.normal(jax.random.key(5), (1024, 128))}
    g = {"t": jax.random.normal(jax.random.key(6), (1024, 128))}
    tx = optax.adam(1e-3)
    s = tx.init(p)
    upd, s2 = tx.update(g, s, p)
    p_ref = optax.apply_updates(p, upd)
    p_f, _ = fused_adam_step(p, g, s, learning_rate=1e-3)
    ok &= check("adam f32", p_f["t"], p_ref["t"], 1e-6)

    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
