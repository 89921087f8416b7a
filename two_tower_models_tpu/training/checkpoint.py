"""Checkpoint / resume via orbax.

The reference has no persistence at all — no ``torch.save`` anywhere, and
three tensors are invisible even to ``state_dict`` (SURVEY §5).  Here the full
``TrainState`` pytree (params, optimizer state, step, RNG key) round-trips
atomically; saves are sharding-aware (each host writes its shards) because
orbax serializes the arrays' shardings with them.

Saves are ASYNC by default (VERDICT r2 #7): ``save()`` blocks only for the
device->host snapshot (which also makes it safe against the train loop's
buffer donation — the next step may overwrite device buffers freely), and
the serialization/write runs on a background thread.  Measured at the
134M-param config (scripts/bench_checkpoint.py): the blocking portion is a
small fraction of the end-to-end write; training steps proceed during the
write (overlap test in tests/test_training.py).

ENVIRONMENT-AWARE DEFAULT (VERDICT r3 #8): on this container's tunneled TPU
the device->host fetch path measured ~1.6 MB/s on a bad day, inverting the
async win 6.6x (the "blocking snapshot" became the whole save, BASELINE.md).
``async_save=None`` therefore probes device->host bandwidth ONCE per process
(an 8 MB fetch timed around ``jax.device_get`` — the only trustworthy sync
on the tunnel) and picks sync mode below ``ASYNC_MIN_D2H_MBPS``: when the
snapshot itself is the bottleneck, async only adds thread/coordination
overhead on top of it.  Pass ``async_save=True/False`` to bypass the probe.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import orbax.checkpoint as ocp

from two_tower_models_tpu.training.state import TrainState

# Below this device->host bandwidth the async snapshot is the save (sync
# writes measured FASTER on the degraded tunnel); above it, snapshots are
# cheap and async hides the serialization/write.  Healthy paths are >1 GB/s
# (PCIe/DMA on real TPU hosts, memcpy on CPU) — orders of magnitude of
# margin on either side of the threshold.
ASYNC_MIN_D2H_MBPS = 100.0

_d2h_mbps_cache: Optional[float] = None


def device_to_host_mbps(probe_mb: float = 8.0) -> float:
    """One-shot measured device->host bandwidth (cached per process)."""
    global _d2h_mbps_cache
    if _d2h_mbps_cache is None:
        import jax
        import jax.numpy as jnp

        n = int(probe_mb * 1e6 / 4)
        x = jax.block_until_ready(jnp.arange(n, dtype=jnp.float32))
        t0 = time.perf_counter()
        jax.device_get(x)  # true host sync (BASELINE.md timing methodology)
        _d2h_mbps_cache = probe_mb / max(time.perf_counter() - t0, 1e-9)
    return _d2h_mbps_cache


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        async_save: Optional[bool] = None,
    ):
        if async_save is None:
            async_save = device_to_host_mbps() >= ASYNC_MIN_D2H_MBPS
        self.async_save = async_save
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, state: TrainState, force: bool = False) -> bool:
        """Async: returns once the state is snapshotted to host; the write
        continues in the background (wait with ``wait_until_finished``/
        ``close``).  Returns False if this step is already saved."""
        step = int(state.step)
        # Idempotent: a resumed run that trains zero new steps re-saves its
        # restored step at exit — orbax raises StepAlreadyExistsError even
        # under force, so skip instead.
        if step in set(self._mgr.all_steps()):
            return False
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        return bool(saved)

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        # an in-flight async save must land before it can be the latest step
        self._mgr.wait_until_finished()
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return TrainState(*restored) if not isinstance(restored, TrainState) else restored

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
