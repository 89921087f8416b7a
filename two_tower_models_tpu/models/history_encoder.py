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
def _cached_pe_raw(seq_len: int, d_model: int):
    import numpy as np

    pos = np.arange(seq_len, dtype=np.float64)[:, None]  # [H, 1]
    col = np.arange(d_model, dtype=np.float64)[None, :]  # [1, D]
    # Reference formula (user_history_encoder.py:71-77): for column j the
    # angular frequency exponent is 2j/d; even columns take sin, odd take cos.
    ang = pos / np.power(10000.0, 2.0 * col / d_model)
    pe = np.where(col % 2 == 0, np.sin(ang), np.cos(ang))
    return np.ascontiguousarray(pe).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _cached_pe(seq_len: int, d_model: int):
    import numpy as np

    # Flip along positions: newest item sits at index 0
    # (user_history_encoder.py:38-54).
    return np.ascontiguousarray(_cached_pe_raw(seq_len, d_model)[::-1])


def sinusoidal_positional_encoding(seq_len: int, d_model: int) -> jnp.ndarray:
    """Flipped sinusoidal PE, [H, D]."""
    return jnp.asarray(_cached_pe(seq_len, d_model))


def per_example_positional_encoding(
    lengths: jnp.ndarray, seq_len: int, d_model: int
) -> jnp.ndarray:
    """[B] lengths -> [B, H, D] PE equal to what a per-example TRUNCATED run
    would use: position p of an example with length L gets the raw
    (unflipped) PE at L-1-p — the reference's flip applied at that example's
    own length (invalid positions get zeros).  The raw PE value at a position
    is independent of the sequence length, so one [H, D] table serves all."""
    raw = jnp.asarray(_cached_pe_raw(seq_len, d_model))
    pos = jnp.arange(seq_len)
    idx = jnp.clip(lengths[:, None] - 1 - pos[None, :], 0, seq_len - 1)
    pe = jnp.take(raw, idx, axis=0)  # [B, H, D]
    return jnp.where((pos[None, :] < lengths[:, None])[..., None], pe, 0.0)


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
    lengths: jnp.ndarray = None,  # optional [B] int32 valid-history lengths
) -> jnp.ndarray:
    """Returns [B, 2, DI]: (post-attention newest item, mean-pool).

    With ``lengths`` (per-example valid-history counts, VERDICT r2 #8), the
    output equals running the encoder on each example's TRUNCATED history
    (property-tested): positions >= L_b are excluded from the mean, masked
    out of every attention's keys, and the PE flip applies at L_b.  All
    three kernel tiers honor it (blockwise / fused layer / whole-encoder).
    """
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
            lens_spec = None if lengths is None else P(DATA_AXIS)

            def body(p, x, lens):
                with no_islands():
                    return history_encoder_apply(p, x, cfg, compute_dtype, lens)

            return jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(pspecs, P(DATA_AXIS, None, None), lens_spec),
                out_specs=P(DATA_AXIS, None, None),
                check_vma=False,
            )(params, history_emb, lengths)

    layers = params["attn_layers"]

    if lengths is not None:
        lengths = jnp.clip(lengths.astype(jnp.int32), 1, H)
        pos = jnp.arange(H)
        valid = pos[None, :] < lengths[:, None]  # [B, H]
        x0 = jnp.where(valid[..., None], history_emb, 0)
        mean_pooled = (
            jnp.sum(x0.astype(jnp.float32), axis=1)
            / lengths[:, None].astype(jnp.float32)
        ).astype(history_emb.dtype)
        x = x0
        if cfg.use_positional_encoding:
            x = x0 + per_example_positional_encoding(lengths, H, D).astype(x0.dtype)

        if cfg.fused_encoder:
            from two_tower_models_tpu.ops.pallas.fused_encoder import (
                fused_attn_stack,
            )

            y0 = fused_attn_stack(
                x if compute_dtype is None else x.astype(compute_dtype),
                lengths,
                jnp.stack([l["in_proj"]["w"] for l in layers]),
                jnp.stack([l["in_proj"]["b"] for l in layers]),
                jnp.stack([l["out_proj"]["w"] for l in layers]),
                jnp.stack([l["out_proj"]["b"] for l in layers]),
                cfg.num_heads,
            ).astype(history_emb.dtype)
            return jnp.stack([y0, mean_pooled], axis=1)

        for layer in layers:
            x = mha_apply(
                layer,
                x,
                cfg.num_heads,
                compute_dtype,
                blockwise=cfg.blockwise_kernel,
                fused=cfg.fused_kernel,
                lengths=lengths,
            )
        return jnp.stack([x[:, 0, :], mean_pooled], axis=1)

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
