"""Tracing / profiling utilities.

The reference has no tracing at all (SURVEY.md §5 — a tqdm bar and one
wall-clock print). Here:

  * :class:`StageTimer` — structured per-stage wall-clock accounting for
    the pipeline (text encode / denoise / vae decode / io), queryable
    and printable.
  * :func:`profiled` — context manager around ``jax.profiler`` producing
    a TensorBoard-compatible device trace when KANDINSKY5_TPU_TRACE_DIR
    (or the argument) is set.

Note on this backend: through the tunneled axon runtime,
``block_until_ready`` does not synchronize; timers therefore measure
dispatch+fetch boundaries — callers that need exact device timing fetch
a scalar (see bench.py).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import OrderedDict
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        self.stages: "OrderedDict[str, float]" = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> Dict[str, float]:
        return dict(self.stages)

    def __str__(self) -> str:
        total = sum(self.stages.values())
        parts = [f"{k}: {v:.2f}s" for k, v in self.stages.items()]
        return f"[{' | '.join(parts)} | total: {total:.2f}s]"


@contextlib.contextmanager
def profiled(trace_dir: Optional[str] = None):
    """Capture a device profile when a trace dir is configured."""
    import jax

    trace_dir = trace_dir or os.environ.get("KANDINSKY5_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
