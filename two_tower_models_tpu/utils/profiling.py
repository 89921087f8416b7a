"""Profiling / tracing hooks (the reference has none — SURVEY §5).

``trace(dir)`` wraps a region in a jax.profiler trace viewable in
XProf/TensorBoard; ``annotate(name)`` adds named-scope annotations that show
up on the TPU timeline.  Zero overhead when disabled (no-op context managers).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """Capture an xprof trace of the enclosed region when a dir is given."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope for the device timeline (use around tower/loss regions)."""
    return jax.named_scope(name)
