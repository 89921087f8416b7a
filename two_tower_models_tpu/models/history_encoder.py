"""User-history encoder: mean-pool + stacked self-attention summary.

Capability parity with the reference ``UserHistoryEncoder``
(user_history_encoder.py:11-124): given an embedded history [B, H, DI] with
the *newest* item at position 0, produce a [B, 2, DI] summary of
(most-recent-item-after-attention, mean-pool).

Differences from the reference, deliberate:
  * The sinusoidal positional encoding is computed vectorized (the reference
    uses a Python double loop, user_history_encoder.py:69-78) and is a pure
    function of static shapes — it folds into the jit-compiled constant pool
    rather than living as non-persistent module state (a verified defect in
    the reference: the PE tensor is absent from state_dict and breaks
    ``.to(device)``, SURVEY §2.4).
  * Attention is batch-major; no [H, B, DI] permutes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from two_tower_models_tpu.config import HistoryEncoderConfig
from two_tower_models_tpu.nn.attention import mha_init, mha_apply


@functools.lru_cache(maxsize=32)
def _cached_pe(seq_len: int, d_model: int):
    import numpy as np

    pos = np.arange(seq_len, dtype=np.float64)[:, None]  # [H, 1]
    col = np.arange(d_model, dtype=np.float64)[None, :]  # [1, D]
    # Reference formula (user_history_encoder.py:71-77): for column j the
    # angular frequency exponent is 2j/d; even columns take sin, odd take cos.
    ang = pos / np.power(10000.0, 2.0 * col / d_model)
    pe = np.where(col % 2 == 0, np.sin(ang), np.cos(ang))
    # Flip along positions: newest item sits at index 0
    # (user_history_encoder.py:38-54).
    return np.ascontiguousarray(pe[::-1]).astype(np.float32)


def sinusoidal_positional_encoding(seq_len: int, d_model: int) -> jnp.ndarray:
    """Flipped sinusoidal PE, [H, D]."""
    return jnp.asarray(_cached_pe(seq_len, d_model))


def history_encoder_init(key, dim: int, cfg: HistoryEncoderConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers)
    return {
        "attn_layers": [mha_init(k, dim, cfg.num_heads, dtype) for k in keys]
    }


def history_encoder_apply(
    params,
    history_emb: jnp.ndarray,  # [B, H, DI], newest first
    cfg: HistoryEncoderConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """Returns [B, 2, DI]: (post-attention newest item, mean-pool)."""
    B, H, D = history_emb.shape

    if cfg.fused_encoder or cfg.fused_kernel or cfg.blockwise_kernel:
        from two_tower_models_tpu.parallel.islands import island_mesh, no_islands

        mesh = island_mesh()
        if mesh is not None:
            # GSPMD path: the encoder kernels are purely batch-parallel, so
            # the whole apply runs in a shard_map island (params replicated,
            # batch over `data`); no_islands stops the recursive re-wrap.
            from jax.sharding import PartitionSpec as P

            from two_tower_models_tpu.parallel.mesh import DATA_AXIS

            pspecs = jax.tree_util.tree_map(lambda _: P(), params)

            def body(p, x):
                with no_islands():
                    return history_encoder_apply(p, x, cfg, compute_dtype)

            return jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(pspecs, P(DATA_AXIS, None, None)),
                out_specs=P(DATA_AXIS, None, None),
                check_vma=False,
            )(params, history_emb)

    if cfg.fused_encoder:
        # Whole stack (PE + layers + pool) in one Pallas kernel; bf16
        # operands / f32 accumulation when compute_dtype is bf16.
        from two_tower_models_tpu.ops.pallas.fused_encoder import (
            fused_history_encoder,
        )

        pe = (
            sinusoidal_positional_encoding(H, D)
            if cfg.use_positional_encoding
            else jnp.zeros((H, D), jnp.float32)
        )
        layers = params["attn_layers"]
        he = history_emb if compute_dtype is None else history_emb.astype(compute_dtype)
        out = fused_history_encoder(
            he,
            pe,
            jnp.stack([l["in_proj"]["w"] for l in layers]),
            jnp.stack([l["in_proj"]["b"] for l in layers]),
            jnp.stack([l["out_proj"]["w"] for l in layers]),
            jnp.stack([l["out_proj"]["b"] for l in layers]),
            cfg.num_heads,
        )
        return out.astype(history_emb.dtype)

    mean_pooled = jnp.mean(history_emb, axis=1)  # [B, DI]

    x = history_emb
    if cfg.use_positional_encoding:
        x = x + sinusoidal_positional_encoding(H, D).astype(x.dtype)[None]

    for layer in params["attn_layers"]:
        x = mha_apply(
            layer,
            x,
            cfg.num_heads,
            compute_dtype,
            blockwise=cfg.blockwise_kernel,
            fused=cfg.fused_kernel,
        )

    most_recent = x[:, 0, :]  # [B, DI]
    return jnp.stack([most_recent, mean_pooled], axis=1)  # [B, 2, DI]


def history_encoder_output_dim(dim: int) -> int:
    return 2 * dim
