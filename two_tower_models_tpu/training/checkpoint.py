"""Checkpoint / resume via orbax.

The reference has no persistence at all — no ``torch.save`` anywhere, and
three tensors are invisible even to ``state_dict`` (SURVEY §5).  Here the full
``TrainState`` pytree (params, optimizer state, step, RNG key) round-trips
atomically; saves are sharding-aware (each host writes its shards) because
orbax serializes the arrays' shardings with them.

Saves are ASYNC (VERDICT r2 #7): ``save()`` blocks only for the
device->host snapshot (which also makes it safe against the train loop's
buffer donation — the next step may overwrite device buffers freely), and
the serialization/write runs on a background thread.  Measured at the
134M-param config (scripts/bench_checkpoint.py): the blocking portion is a
small fraction of the end-to-end write; training steps proceed during the
write (overlap test in tests/test_training.py)."""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from two_tower_models_tpu.training.state import TrainState


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        async_save: bool = True,
    ):
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
