"""Ring-pass in-batch softmax LSE: global negatives at O(B_local) memory.

The default cross-chip negative sharing (parallel.train_step.sharded_loss_fn)
all-gathers the item embeddings over ``data`` — [B_global, DI] on every chip
— then reduces the [B_local, B_global] logits (fused via
ops.pallas.fused_softmax.fused_lse so the logit matrix never reaches HBM).
At very large global batches the GATHERED POOL itself becomes the ceiling:
B_global = 1M x DI=64 is a 256 MB f32 buffer per chip in forward and its
reduce-scattered twin in backward.

This module computes the same logsumexp with a flash-style ONLINE reduction
over a ``ppermute`` ring instead (the ring-attention recurrence applied to
the two-tower in-batch loss):

  forward   carry (block [B_l, DI], m [B_l], s [B_l]); each of n steps
            scores the local users against the visiting block, folds the
            partial max/sumexp into (m, s), and rotates the block one hop.
            lse = m + log s.  Peak extra memory: ONE visiting block.
  backward  d_user and d_item are both sums over visiting blocks of
            p-weighted matmuls (p = exp(scores - lse) * d_lse).  d_user
            accumulates locally; d_item accumulates into a gradient buffer
            that TRAVELS WITH the block — after n hops each chip's buffer
            arrives home carrying every chip's contribution.  Residuals are
            (user_emb, item_emb, lse): O(B_l), nothing global.

Wire cost per chip: n hops x block bytes forward, n x (block + f32 grad
block) backward — the same order as all_gather + reduce_scatter (which send
(n-1)/n of the global pool), but issued as n small ppermutes that XLA
overlaps with the per-hop matmuls, and with NO [B_global, .] buffer at
either end.  Accounted in parallel.comms (``ring_negatives``) and validated
against the virtual-mesh HLO in tests/test_comms.py.

Semantics match the all-gather path exactly up to f32 summation order
(online vs tree logsumexp); gradient parity is tested per-preset in
tests/test_ring_loss.py.  Reference surface: the in-batch denominator of
compute_training_loss (two_tower_base_retrieval.py:258-268) — this is its
at-scale decomposition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ring_perm(axis_name: str):
    n = jax.lax.axis_size(axis_name)
    return n, [(i, (i + 1) % n) for i in range(n)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ring_lse(user_emb: jnp.ndarray, item_emb: jnp.ndarray, axis_name: str):
    """logsumexp_j <user_b, item_j> with j spanning the GLOBAL batch —
    computed without ever materializing the gathered pool.  Must run inside
    ``shard_map``; returns [B_local] f32."""
    lse, _ = _ring_lse_fwd(user_emb, item_emb, axis_name)
    return lse


def _ring_lse_fwd(user_emb, item_emb, axis_name):
    n, perm = _ring_perm(axis_name)
    b_l = user_emb.shape[0]

    def step(carry, _):
        block, m, s = carry
        scores = jax.lax.dot_general(
            user_emb, block, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B_l, B_l]
        bm = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m, bm)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(scores - m_new[:, None]), axis=-1
        )
        block = jax.lax.ppermute(block, axis_name, perm)
        return (block, m_new, s), None

    init = (
        item_emb,
        jnp.full((b_l,), -jnp.inf, jnp.float32),
        jnp.zeros((b_l,), jnp.float32),
    )
    (block, m, s), _ = jax.lax.scan(step, init, None, length=n)
    lse = m + jnp.log(s)
    # after n hops the block is home again; keeping it as a residual (instead
    # of item_emb) lets XLA elide the copy
    return lse, (user_emb, block, lse)


def _ring_lse_bwd(axis_name, residuals, d_lse):
    user_emb, item_emb, lse = residuals
    n, perm = _ring_perm(axis_name)
    coeff = d_lse.astype(jnp.float32)

    def step(carry, _):
        block, gblock, d_user = carry
        scores = jax.lax.dot_general(
            user_emb, block, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp(scores - lse[:, None]) * coeff[:, None]  # [B_l, B_l] f32
        pc = p.astype(block.dtype)
        d_user = d_user + jax.lax.dot_general(
            pc, block, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gblock = gblock + jax.lax.dot_general(
            pc, user_emb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B_l, DI]: contributions to the VISITING block's items
        block = jax.lax.ppermute(block, axis_name, perm)
        gblock = jax.lax.ppermute(gblock, axis_name, perm)
        return (block, gblock, d_user), None

    init = (
        item_emb,
        jnp.zeros(item_emb.shape, jnp.float32),
        jnp.zeros(user_emb.shape, jnp.float32),
    )
    (_, gblock, d_user), _ = jax.lax.scan(step, init, None, length=n)
    return d_user.astype(user_emb.dtype), gblock.astype(item_emb.dtype)


ring_lse.defvjp(_ring_lse_fwd, _ring_lse_bwd)


# --- logQ-corrected ring (VERDICT r3 #4) -----------------------------------
#
# The sampled-softmax logQ correction subtracts each candidate's log proposal
# probability from its logit (models.two_tower._extended_ce).  Over the ring
# the per-chip [B_l] correction vector simply TRAVELS WITH its item block —
# one extra [B_l] f32 ppermute per hop — and each hop scores
# u·blockᵀ − corr_block.  Corrections are data (no gradient), so the
# backward recomputes the corrected probabilities from the travelling pair
# and is otherwise identical to the uncorrected ring.  Mixed-negative EXTRAS
# don't enter the ring at all: they are replicated, so their corrected lse
# is a local [B_l, B'] computation folded in with one logaddexp
# (parallel.train_step.sharded_loss_fn).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def ring_lse_corr(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    corr: jnp.ndarray,  # [B_local] f32 — this chip's items' −log Q*, travels with the block
    axis_name: str,
):
    """logsumexp_j (<user_b, item_j> − corr_j) with j spanning the GLOBAL
    batch, at O(B_local) memory.  Must run inside shard_map; returns
    [B_local] f32."""
    lse, _ = _ring_corr_fwd(user_emb, item_emb, corr, axis_name)
    return lse


def _ring_corr_fwd(user_emb, item_emb, corr, axis_name):
    n, perm = _ring_perm(axis_name)
    b_l = user_emb.shape[0]
    corr = corr.astype(jnp.float32)

    def step(carry, _):
        block, cblock, m, s = carry
        scores = (
            jax.lax.dot_general(
                user_emb, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - cblock[None, :]
        )  # [B_l, B_l]
        bm = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m, bm)
        s = s * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(scores - m_new[:, None]), axis=-1
        )
        block = jax.lax.ppermute(block, axis_name, perm)
        cblock = jax.lax.ppermute(cblock, axis_name, perm)
        return (block, cblock, m_new, s), None

    init = (
        item_emb,
        corr,
        jnp.full((b_l,), -jnp.inf, jnp.float32),
        jnp.zeros((b_l,), jnp.float32),
    )
    (block, cblock, m, s), _ = jax.lax.scan(step, init, None, length=n)
    lse = m + jnp.log(s)
    # after n hops block AND cblock are home again (copy-elision residuals)
    return lse, (user_emb, block, cblock, lse)


def _ring_corr_bwd(axis_name, residuals, d_lse):
    user_emb, item_emb, corr, lse = residuals
    n, perm = _ring_perm(axis_name)
    coeff = d_lse.astype(jnp.float32)

    def step(carry, _):
        block, cblock, gblock, d_user = carry
        scores = (
            jax.lax.dot_general(
                user_emb, block, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            - cblock[None, :]
        )
        p = jnp.exp(scores - lse[:, None]) * coeff[:, None]
        pc = p.astype(block.dtype)
        d_user = d_user + jax.lax.dot_general(
            pc, block, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        gblock = gblock + jax.lax.dot_general(
            pc, user_emb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        block = jax.lax.ppermute(block, axis_name, perm)
        cblock = jax.lax.ppermute(cblock, axis_name, perm)
        gblock = jax.lax.ppermute(gblock, axis_name, perm)
        return (block, cblock, gblock, d_user), None

    init = (
        item_emb,
        corr,
        jnp.zeros(item_emb.shape, jnp.float32),
        jnp.zeros(user_emb.shape, jnp.float32),
    )
    (_, _, gblock, d_user), _ = jax.lax.scan(step, init, None, length=n)
    return (
        d_user.astype(user_emb.dtype),
        gblock.astype(item_emb.dtype),
        jnp.zeros_like(corr),  # corrections are data, not params
    )


ring_lse_corr.defvjp(_ring_corr_fwd, _ring_corr_bwd)
