"""Kernel islands: Pallas kernels inside a GSPMD-partitioned program.

XLA's SPMD partitioner cannot split a ``pallas_call`` (it sees an opaque
custom call), so round 1 forced the GSPMD train step onto the pure-jnp ops.
The resolution is a MANUAL island: the kernel call sites wrap themselves in
``jax.shard_map`` over the active mesh — data-parallel in, data-parallel
out — and the partitioner stitches the island into the surrounding
automatically-sharded program (resharding at the boundary as needed).  The
kernels' custom VJPs differentiate per-shard inside the island, so the
backward kernels ride along for free.

The active mesh travels by context (set around trace time by
``make_gspmd_train_step``), keeping the model code free of mesh plumbing:
``island_mesh()`` returns None on the single-chip and explicit-collectives
paths, where call sites use the kernels directly.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

from jax.sharding import Mesh

_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "kernel_island_mesh", default=None
)


@contextlib.contextmanager
def kernel_islands(mesh: Mesh):
    """While active, kernel call sites wrap themselves in shard_map islands
    over ``mesh``.  Enter around every call of a GSPMD-jitted step (cheap;
    retraces can happen on any call)."""
    token = _MESH.set(mesh)
    try:
        yield
    finally:
        _MESH.reset(token)


@contextlib.contextmanager
def no_islands():
    """Suppress island wrapping (used inside an island's own body so the
    wrapped function does not re-wrap recursively)."""
    token = _MESH.set(None)
    try:
        yield
    finally:
        _MESH.reset(token)


def island_mesh() -> Optional[Mesh]:
    return _MESH.get()
