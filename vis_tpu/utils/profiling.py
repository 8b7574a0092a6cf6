"""Device profiling: JAX profiler traces per pipeline phase.

The TPU replacement for the reference's LangSmith tracing (SURVEY.md §5.1;
reference utils/config.py:321-326 enabled LangChain auto-instrumentation).
Here, setting PROFILE_DIR makes every `device_trace("phase")` block emit an
xplane trace viewable in TensorBoard / xprof, correlated with the
request-ID-tagged structured logs from vis_tpu.utils.logger.
"""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path
from typing import Iterator, Optional

from vis_tpu.utils.config import config
from vis_tpu.utils.logger import get_request_id, setup_logger, span

logger = setup_logger(__name__, level="INFO", component="PROFILER")


def profiling_enabled() -> bool:
    return bool(config.profile_dir)


@contextmanager
def device_trace(phase: str) -> Iterator[None]:
    """JAX profiler trace when PROFILE_DIR is set; no-op otherwise.

    The disabled path is a pure pass-through (no extra span): the pipeline
    runner wraps every node in this, and phantom spans would pollute the
    bench's span-tree attribution.  The profiling span is namespaced
    "profile.<phase>" for the same reason."""
    if not profiling_enabled():
        yield
        return

    import jax

    trace_dir = Path(config.profile_dir) / (get_request_id() or "session")
    trace_dir.mkdir(parents=True, exist_ok=True)
    with span(f"profile.{phase}", logger):
        with jax.profiler.trace(str(trace_dir)):
            with jax.profiler.TraceAnnotation(phase):
                yield
    logger.info(f"Profiler trace for '{phase}' written under {trace_dir}")


@contextmanager
def annotate(name: str) -> Iterator[None]:
    """Lightweight trace annotation (shows up inside an active trace)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


__all__ = ["device_trace", "annotate", "profiling_enabled"]
