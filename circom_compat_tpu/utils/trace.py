"""Per-stage timing and device profiling for the proving pipeline.

The reference has no in-library observability (SURVEY §5: criterion
harnesses only, reference: benches/groth16.rs); a production prover needs
to answer "where did this proof's wall-clock go" (parse / witness / key
staging / device compute / assemble / verify) without hand-inserted
timers. This module provides:

  - ``stage(name)``: a context manager that records the wall-clock of a
    pipeline stage into the active collector(s). Library code wraps its
    stages unconditionally — with no active collector the overhead is one
    thread-local read (~100 ns), so the instrumentation is always-on.
  - ``collect()``: a context manager yielding a :class:`Trace` that
    captures every stage entered on this thread while it is active.
    Nested stages are recorded with ``outer/inner`` paths.
  - ``CIRCOM_TPU_TIMINGS=1``: environment knob that logs every stage to
    the ``circom_compat_tpu.trace`` logger as it completes (library-silent
    by default, matching the reference's near-zero logging posture).
  - ``device_profile(logdir)``: wraps ``jax.profiler.trace`` so a proof
    can be captured for TensorBoard/XProf without importing jax at the
    call site.

Timings use ``time.perf_counter``. Device work is asynchronous under jax:
a stage that only *dispatches* device work appears near-free, and the
wall-clock lands in the stage that forces materialization (the window-sum
readback in assemble). Stages that want to bound device work explicitly
should force their outputs (the prove paths do — np.asarray on the
window sums).
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Iterator, List, Tuple

logger = logging.getLogger("circom_compat_tpu.trace")

_tls = threading.local()


def _state():
    if not hasattr(_tls, "collectors"):
        _tls.collectors = []  # active Trace objects (innermost last)
        _tls.stack = []  # active stage-name path
    return _tls


@dataclass(eq=False)  # identity semantics: collectors list uses remove()
class Trace:
    """Stages recorded while a ``collect()`` block was active."""

    stages: List[Tuple[str, float]] = field(default_factory=list)

    def add(self, path: str, seconds: float) -> None:
        self.stages.append((path, seconds))

    def total(self, prefix: str = "") -> float:
        """Sum of TOP-LEVEL stage times under ``prefix`` (nested stages are
        already contained in their parents)."""
        return sum(
            t
            for name, t in self.stages
            if name.startswith(prefix) and "/" not in name[len(prefix):].lstrip("/")
        )

    def as_dict(self) -> dict:
        out: dict = {}
        for name, t in self.stages:
            out[name] = out.get(name, 0.0) + t
        return out

    def table(self) -> str:
        """Human-readable stage table (indented by nesting depth)."""
        if not self.stages:
            return "(no stages recorded)"
        width = max(len(n) for n, _ in self.stages)
        lines = []
        for name, t in self.stages:
            depth = name.count("/")
            label = "  " * depth + name.rsplit("/", 1)[-1]
            pad = " " * (width + 2 - len("  " * depth) - len(label.rstrip()))
            lines.append(f"{label}{pad}{t * 1e3:10.1f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def collect() -> Iterator[Trace]:
    """Capture every ``stage`` entered on this thread into a Trace."""
    st = _state()
    tr = Trace()
    st.collectors.append(tr)
    try:
        yield tr
    finally:
        st.collectors.remove(tr)


_LOG_ENV = "CIRCOM_TPU_TIMINGS"


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Record one pipeline stage. Nesting produces ``outer/inner`` paths.

    Free when nothing collects and ``CIRCOM_TPU_TIMINGS`` is unset."""
    st = _state()
    log = os.environ.get(_LOG_ENV, "") not in ("", "0")
    if not st.collectors and not log:
        yield
        return
    st.stack.append(name)
    path = "/".join(st.stack)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        st.stack.pop()
        for tr in st.collectors:
            tr.add(path, dt)
        if log:
            logger.info("%s: %.1f ms", path, dt * 1e3)


@contextlib.contextmanager
def device_profile(logdir: str, enabled: bool = True) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/XProf format) around a
    block — per-op device timings for kernel work (SURVEY §5 tracing).
    ``enabled=False`` collapses to a no-op so call sites can gate on a
    flag without reindenting."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield
