"""Functional multi-head self-attention.

Capability-parity with the reference's use of ``nn.MultiheadAttention``
(user_history_encoder.py:60-67, 103-108): full (unmasked) self-attention with
fused QKV projection and an output projection, bias on both.  Written batch-
major ([B, H, D]) — no seq-first permutes; XLA fuses the projections into MXU
matmuls and the softmax into the surrounding elementwise work.

For long histories the blockwise Pallas kernel in
``two_tower_models_tpu.ops.pallas.history_attention`` computes the same
function without materializing the [H, H] score matrix in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from two_tower_models_tpu.nn.layers import linear_apply


def mha_init(key, dim: int, num_heads: int, dtype=jnp.float32) -> dict:
    if dim % num_heads != 0:
        raise ValueError(f"dim {dim} not divisible by num_heads {num_heads}")
    k_in, k_out = jax.random.split(key)
    # Xavier-uniform for the fused QKV projection, zeros bias (torch's
    # MultiheadAttention init choice); out-proj likewise.
    limit_in = jnp.sqrt(6.0 / (dim + 3 * dim))
    w_in = jax.random.uniform(k_in, (dim, 3 * dim), dtype, -limit_in, limit_in)
    limit_out = jnp.sqrt(6.0 / (dim + dim))
    w_out = jax.random.uniform(k_out, (dim, dim), dtype, -limit_out, limit_out)
    return {
        "in_proj": {"w": w_in, "b": jnp.zeros((3 * dim,), dtype)},
        "out_proj": {"w": w_out, "b": jnp.zeros((dim,), dtype)},
    }


def mha_apply(
    params: dict,
    x: jnp.ndarray,
    num_heads: int,
    compute_dtype=None,
    blockwise: bool = False,
    fused: bool = False,
    lengths: jnp.ndarray = None,
) -> jnp.ndarray:
    """Self-attention (q = k = v = x).

    x: [B, H, D] -> [B, H, D]

    ``num_heads`` is static config, not a param leaf — the params dict holds
    only arrays so optimizers and checkpointers can map over it blindly.
    ``blockwise=True`` routes through the O(H)-memory Pallas kernel
    (ops.pallas.history_attention) for long histories.  ``lengths`` ([B]
    int32) masks keys at positions >= the example's length on every path;
    query rows past the length produce unmasked-garbage outputs the encoder
    contract never consumes.
    """
    B, H, D = x.shape
    head_dim = D // num_heads

    if fused:
        # Whole layer in one Pallas kernel (ops.pallas.fused_mha) — no
        # hd-minor layouts ever leave VMEM.  Cast to the compute dtype first:
        # bf16 inputs run the kernel's MXU ops at full rate.
        from two_tower_models_tpu.ops.pallas.fused_mha import fused_mha_layer

        return fused_mha_layer(
            x if compute_dtype is None else x.astype(compute_dtype),
            params["in_proj"]["w"],
            params["in_proj"]["b"],
            params["out_proj"]["w"],
            params["out_proj"]["b"],
            num_heads,
            lengths=lengths,
        ).astype(x.dtype)

    qkv = linear_apply(params["in_proj"], x, compute_dtype)  # [B, H, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # [B, H, D] -> [B, nh, H, hd]
        return t.reshape(B, H, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if blockwise:
        from two_tower_models_tpu.ops.pallas.history_attention import (
            blockwise_self_attention,
        )

        fold = lambda t: t.reshape(B * num_heads, H, head_dim)
        lens_folded = (
            None
            if lengths is None
            else jnp.repeat(lengths.astype(jnp.int32), num_heads)
        )
        out = blockwise_self_attention(
            fold(q), fold(k), fold(v), lengths=lens_folded
        )
        out = out.reshape(B, num_heads, H, head_dim)
    else:
        scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
        scores = (
            jnp.einsum("bnqd,bnkd->bnqk", q, k, preferred_element_type=jnp.float32)
            * scale
        )  # [B, nh, H, H]
        if lengths is not None:
            key_valid = jnp.arange(H)[None, :] < lengths[:, None]  # [B, H]
            scores = jnp.where(
                key_valid[:, None, None, :], scores, jnp.float32(-jnp.inf)
            )
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "bnqk,bnkd->bnqd", probs, v, preferred_element_type=jnp.float32
        )  # [B, nh, H, hd]
    out = out.transpose(0, 2, 1, 3).reshape(B, H, D).astype(x.dtype)
    return linear_apply(params["out_proj"], out, compute_dtype)
