"""Multi-host data feeding: per-host batch shards -> global sharded arrays.

The reference is single-process/single-device (train/train.py:139; SURVEY
§2.5).  On a TPU pod each JAX process sees only its local chips, and a
global array is assembled from per-process shards.  This module is that
assembly layer:

  * the batch SCHEDULE is a pure function of (seed, epoch) shared by all
    hosts (same `epoch_batches` stream everywhere — no coordination);
  * each host materializes only ITS rows of every global batch
    (``host_batch_slice``), keeping host memory and host->device transfer
    at 1/n_hosts;
  * ``global_batch_from_host_local`` lifts the host-local rows into global
    ``jax.Array``s sharded ``P('data')`` over the mesh via
    ``jax.make_array_from_process_local_data`` — the sharded/GSPMD train
    steps consume them unchanged.

Smoke-tested with a real 2-process ``jax.distributed`` CPU launch
(scripts/multihost_smoke.py; tests/test_multihost.py runs it when the
sandbox allows subprocess + localhost sockets).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from two_tower_models_tpu.models.two_tower import Batch, REPLICATED_BATCH_FIELDS
from two_tower_models_tpu.parallel.mesh import DATA_AXIS


def host_batch_slice(
    global_idx: np.ndarray,  # [B] global batch indices (same on every host)
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This host's contiguous row block of the global batch.

    The data mesh axis is laid out process-major (jax device order), so host
    p owns rows [p*B/n, (p+1)*B/n) of every ``P('data')``-sharded array.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    b = global_idx.shape[-1]
    if b % n:
        raise ValueError(f"global batch {b} must divide process count {n}")
    per = b // n
    return global_idx[..., p * per : (p + 1) * per]


def global_batch_from_host_local(
    local_batch: Batch, mesh: Mesh, stack_dims: int = 0
) -> Batch:
    """Lift host-local batch rows into global arrays sharded over ``data``.

    Every process passes its OWN rows (1/n_hosts of the global batch); the
    returned Batch holds global ``jax.Array``s addressable per-shard only —
    exactly what shard_map / GSPMD steps expect.  ``stack_dims`` leading
    axes (the [K, ...] of a steps_per_dispatch stack) replicate; the batch
    axis right after them shards over ``data``.
    """
    lead = (None,) * stack_dims

    def lift(x, spec):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    # Mixed-negative fields are [B'] candidates shared by the whole global
    # batch: every host passes the SAME full array (extend_batch_for_idx keys
    # off the shared schedule) and it lifts replicated, not row-sharded.
    _repl = REPLICATED_BATCH_FIELDS
    row_spec = P(*lead, DATA_AXIS)
    return Batch(
        **{
            name: lift(x, P() if name in _repl else row_spec)
            for name, x in local_batch._asdict().items()
        }
    )
