"""Profiling / tracing hooks.

The reference has only coarse timers (SURVEY.md §5: AverageMeters, no torch
profiler). TPU-native equivalent: the JAX profiler with Perfetto/XProf traces,
plus a trace-annotation context and step markers usable inside training loops.
"""
from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax

from .logging import get_logger

logger = get_logger(__name__)


def start_profiler_server(port: int = 9999) -> None:
    """Expose the live profiler endpoint (connect xprof / tensorboard-profile)."""
    jax.profiler.start_server(port)
    logger.info(f"jax profiler server on :{port}")


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a trace for the enclosed block: profiling.trace('/tmp/tb') around
    a few train steps, then inspect in Perfetto/XProf."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"trace written to {log_dir}")


def annotate(name: str):
    """Named region inside a trace (shows up as a span)."""
    return jax.profiler.TraceAnnotation(name)


def step_marker(step: int):
    """Mark a train step boundary for the profiler timeline."""
    return jax.profiler.StepTraceAnnotation("train", step_num=step)
