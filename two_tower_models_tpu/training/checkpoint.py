"""Checkpoint / resume via orbax.

The reference has no persistence at all — no ``torch.save`` anywhere, and
three tensors are invisible even to ``state_dict`` (SURVEY §5).  Here the full
``TrainState`` pytree (params, optimizer state, step, RNG key) round-trips
atomically; saves are sharding-aware (each host writes its shards) because
orbax serializes the arrays' shardings with them.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from two_tower_models_tpu.training.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, force: bool = False) -> bool:
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

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
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
