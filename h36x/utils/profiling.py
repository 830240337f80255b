"""Profiling hooks: jax profiler traces + annotated step regions.

The reference's observability is wall-clock phase timers and a backgrounded
nvidia-smi (SURVEY.md §5). Here the same phase timers exist
(:class:`h36x.utils.timers.PhaseTimers`) plus real device traces: pass
--profile-dir to the train CLI and the run's FIRST epoch (first resumed
epoch on --resume) is captured as a TensorBoard-loadable trace — one epoch
bounds the trace size; every epoch executes the same compiled step.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context when profile_dir is set, no-op otherwise."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_annotation(name: str) -> Iterator[None]:
    """Named region that shows up in profiler traces (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
