"""jax.profiler hooks (SURVEY.md §5.1 — absent from the reference)."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str] = None, name: str = "avtex") -> Iterator[None]:
    """Capture a device trace around a block when ``logdir`` is given.

    ``with trace('./profiles'): run_hot_stage()`` — view in TensorBoard or
    Perfetto. No-op when logdir is None, so call sites can leave it wired in.
    """
    if logdir is None:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        with jax.profiler.TraceAnnotation(name):
            yield
