"""Fused Adam update — Pallas TPU kernel.

optax's adam chain materializes intermediate pytrees (updated moments, bias-
corrected moments, scaled updates) before ``apply_updates`` touches the
params — several extra HBM round trips over the two big embedding tables
(8.4M of the flagship's 8.5M params).  This kernel performs the whole
update for one tensor in a single read-modify-write pass:

    m <- b1*m + (1-b1)*g
    v <- b2*v + (1-b2)*g^2
    p <- p - lr * (m / (1 - b1^t)) / (sqrt(v / (1 - b2^t)) + eps)

Bit-for-bit the same math as ``optax.adam`` with default ``eps_root=0``
(parity-tested against it in tests/test_fused_adam.py).  The step-dependent
bias corrections arrive as (1, 1) scalars so the kernel is trace-once.

Exposed as ``fused_adam_step``: a drop-in replacement for the
``tx.update + optax.apply_updates`` pair that keeps the exact
``optax.adam`` opt-state structure (ScaleByAdamState, EmptyState) so
checkpoints are interchangeable with the optax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Leaves smaller than this stay on the plain-jnp path (kernel dispatch would
# cost more than the update; XLA fuses small elementwise chains fine).
_MIN_KERNEL_ELEMS = 1 << 16


def _adam_kernel(p_ref, m_ref, v_ref, g_ref, c_ref, po_ref, mo_ref, vo_ref,
                 *, lr, b1, b2, eps):
    g = g_ref[...].astype(jnp.float32)
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * g * g
    mo_ref[...] = m
    vo_ref[...] = v
    mhat = m * c_ref[0, 0]  # 1 / (1 - b1^t)
    vhat = v * c_ref[0, 1]  # 1 / (1 - b2^t)
    po_ref[...] = (
        p_ref[...].astype(jnp.float32) - lr * mhat / (jnp.sqrt(vhat) + eps)
    ).astype(po_ref.dtype)


def _adam_leaf_kernel(p, m, v, g, c, lr, b1, b2, eps, row_tile=512):
    """One-pass Adam on a single tensor (any shape; viewed as 2D rows)."""
    shape, dtype = p.shape, p.dtype
    n = p.size
    # 2-D tensors keep their own column width (Mosaic lane-pads narrow
    # minors internally; forcing 128 would reshape-copy every operand —
    # measured +12ms/step at 1M-row tables).  1-D tensors view as [*, 128].
    cols = shape[-1] if p.ndim >= 2 else 128
    rows = -(-n // cols)
    pad = rows * cols - n

    def to2d(x):
        x = x.reshape(-1)
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(rows, cols)

    rt = min(row_tile, rows)
    grid_rows = -(-rows // rt)
    if rows % rt:
        extra = grid_rows * rt - rows
        pad2 = lambda x: jnp.pad(to2d(x), ((0, extra), (0, 0)))
    else:
        pad2 = to2d
    p2, m2, v2, g2 = pad2(p), pad2(m), pad2(v), pad2(g.astype(jnp.float32))

    spec = pl.BlockSpec((rt, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    po, mo, vo = pl.pallas_call(
        functools.partial(_adam_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        grid=(grid_rows,),
        in_specs=[
            spec, spec, spec, spec,
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct(p2.shape, dtype),
            jax.ShapeDtypeStruct(p2.shape, jnp.float32),
            jax.ShapeDtypeStruct(p2.shape, jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(p2, m2, v2, g2, c)

    def back(x, dt):
        return x.reshape(-1)[:n].reshape(shape).astype(dt)

    return back(po, dtype), back(mo, m.dtype), back(vo, v.dtype)


def fused_adam_step(params, grads, opt_state, *, learning_rate: float,
                    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """(params, opt_state) -> updated, replacing tx.update + apply_updates.

    opt_state must be ``optax.adam(...)``'s state: (ScaleByAdamState,
    EmptyState) — the same pytree comes back, so checkpoints and the optax
    path stay interchangeable.
    """
    adam_state: optax.ScaleByAdamState = opt_state[0]
    count = optax.safe_increment(adam_state.count)
    cf = count.astype(jnp.float32)
    c = jnp.stack(
        [1.0 / (1.0 - b1**cf), 1.0 / (1.0 - b2**cf)]
    ).reshape(1, 2)

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(adam_state.mu)
    flat_v = treedef.flatten_up_to(adam_state.nu)

    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        if p.size >= _MIN_KERNEL_ELEMS:
            po, mo, vo = _adam_leaf_kernel(
                p, m, v, g, c, learning_rate, b1, b2, eps
            )
        else:  # small leaf: plain jnp (XLA fuses this chain fine)
            g32 = g.astype(jnp.float32)
            mo = (b1 * m + (1.0 - b1) * g32).astype(m.dtype)
            vo = (b2 * v + (1.0 - b2) * g32 * g32).astype(v.dtype)
            po = (
                p.astype(jnp.float32)
                - learning_rate * (mo * c[0, 0]) / (jnp.sqrt(vo * c[0, 1]) + eps)
            ).astype(p.dtype)
        new_p.append(po)
        new_m.append(mo)
        new_v.append(vo)

    unflat = jax.tree_util.tree_unflatten
    new_state = (
        optax.ScaleByAdamState(
            count=count, mu=unflat(treedef, new_m), nu=unflat(treedef, new_v)
        ),
        opt_state[1],
    )
    return unflat(treedef, new_p), new_state
