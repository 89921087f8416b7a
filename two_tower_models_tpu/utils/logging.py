"""Structured host-side logging (the reference logs with bare ``print``,
train/train.py:183).  Metrics arrive as on-device arrays; conversion to host
floats happens only here, at log boundaries — never per step."""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Mapping, Optional

import jax


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


class JsonlLogger:
    """One JSON object per line to a file and/or stderr summary; optional
    TensorBoard event mirroring (``tensorboard_dir``) for scalar fields —
    steps come from a ``step`` field when present, else a running counter."""

    def __init__(
        self,
        path: Optional[str] = None,
        echo: bool = True,
        tensorboard_dir: Optional[str] = None,
    ):
        self._fh: Optional[IO[str]] = open(path, "a") if path else None
        self._echo = echo
        self._t0 = time.monotonic()
        self._tb = None
        self._tb_step = 0
        if tensorboard_dir:
            from tensorboardX import SummaryWriter  # baked into the image

            self._tb = SummaryWriter(tensorboard_dir)

    def log(self, event: str, **fields):
        record = {"event": event, "t": round(time.monotonic() - self._t0, 3)}
        record.update({k: _to_float(v) for k, v in fields.items()})
        line = json.dumps(record)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=sys.stderr)
        if self._tb is not None:
            # Step-less events reuse the last explicit step (they describe
            # the state as of that step) rather than advancing a counter past
            # it; bools are excluded — isinstance(True, int) holds, but a
            # flag is not a scalar curve.
            if "step" in record:
                self._tb_step = int(record["step"])
            step = self._tb_step
            for k, v in record.items():
                if (
                    k not in ("event", "t", "step")
                    and isinstance(v, (int, float))
                    and not isinstance(v, bool)
                ):
                    self._tb.add_scalar(f"{event}/{k}", v, step)

    def log_metrics(self, event: str, metrics: Mapping, **fields):
        # Pull all device metrics in one transfer.
        host = jax.device_get(dict(metrics))
        self.log(event, **{k: _to_float(v) for k, v in host.items()}, **fields)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
