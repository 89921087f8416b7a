"""Device mesh construction.

Axes:
  ``data``  — batch sharding (DP); gradients all-reduce over it.
  ``model`` — embedding-table row sharding (and optional tower TP).

On TPU slices the mesh is built from the physical topology so that the
``model`` axis (whose collectives carry the all-to-all embedding exchange and
the negative all-gather) rides ICI neighbors; multi-slice DP lands on DCN.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

from two_tower_models_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.data * cfg.model
    if n > len(devices):
        raise ValueError(
            f"mesh {cfg.data}x{cfg.model} needs {n} devices, have {len(devices)}"
        )
    try:
        # Topology-aware layout when available (real TPU slices).
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_device_mesh(
            (cfg.data, cfg.model), devices=devices[:n]
        )
    except Exception:
        dev_array = np.asarray(devices[:n]).reshape(cfg.data, cfg.model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig(data=1, model=1))


def initialize_multihost(
    coordinator_address=None, num_processes=None, process_id=None
) -> None:
    """Multi-host bring-up: one call per host before any jax.devices() use.

    Wraps ``jax.distributed.initialize`` (the TPU-pod equivalent of the
    process-group init the reference never does — SURVEY §2.5).  On Cloud TPU
    all three arguments auto-detect from the metadata server; pass them
    explicitly elsewhere.  After this, ``jax.devices()`` spans the full slice
    and ``make_mesh`` lays the global mesh over it; each host feeds its local
    shard of every batch (see parallel.sharding.data_pspecs).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
