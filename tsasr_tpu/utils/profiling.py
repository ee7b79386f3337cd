"""Profiling: JAX trace capture around Brain loops.

TPU-native equivalent of the reference's torch.profiler decorator suite
(``vendor/speechbrain/speechbrain/utils/profiling.py``, SURVEY.md §5.1):
warmup-aware scheduled capture around ``fit_batch`` / ``evaluate_batch``,
TensorBoard-compatible traces (xplane, viewable in TB's profile plugin or
Perfetto), step markers, and simple time/memory reports.

Usage::

    profiler = Profiler(logdir, schedule=schedule(wait=5, active=3))
    brain = profile(brain, profiler)     # hooks fit_batch/evaluate_batch
    ... brain.fit(...)
    report_time(profiler)
"""

import functools
import logging
import os
import time
from dataclasses import dataclass

logger = logging.getLogger(__name__)


def schedule(wait=2, warmup=2, active=2, repeat=1):
    """Step -> action mapping, mirroring torch.profiler.schedule
    semantics: skip `wait`, warm up `warmup`, record `active`, repeat."""
    cycle = wait + warmup + active

    def fn(step):
        if repeat and step >= cycle * repeat:
            return "none"
        pos = step % cycle
        if pos < wait:
            return "none"
        if pos < wait + warmup:
            return "warmup"
        return "active"

    return fn


@dataclass
class _StepTime:
    name: str
    seconds: float


class Profiler:
    """Scheduled jax.profiler trace capture + wall-clock accounting."""

    def __init__(self, logdir="profiler_logs", schedule_fn=None,
                 with_memory=True):
        self.logdir = logdir
        self.schedule_fn = schedule_fn or schedule()
        self.with_memory = with_memory
        self.step_num = 0
        self._tracing = False
        self.step_times = []

    def step(self):
        """Advance one step; starts/stops the trace per the schedule."""
        import jax
        self.step_num += 1
        action = self.schedule_fn(self.step_num)
        if action == "active" and not self._tracing:
            os.makedirs(self.logdir, exist_ok=True)
            jax.profiler.start_trace(self.logdir)
            self._tracing = True
            logger.info("profiler: trace started at step %d -> %s",
                        self.step_num, self.logdir)
        elif action != "active" and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            logger.info("profiler: trace stopped at step %d",
                        self.step_num)

    def stop(self):
        import jax
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False

    def record(self, name, seconds):
        self.step_times.append(_StepTime(name, seconds))

    def annotate(self, name):
        """Context manager adding a named region to the trace."""
        import jax
        return jax.profiler.TraceAnnotation(name)


def profile(brain, profiler=None, logdir="profiler_logs"):
    """Hook a Brain's hot methods with timing + scheduled tracing
    (the reference's ``hook_brain_methods``/``prepare_profiler_for_brain``,
    ``utils/profiling.py:178-298``)."""
    if profiler is None:
        profiler = Profiler(logdir)
    brain.profiler = profiler
    for method in ("fit_batch", "evaluate_batch"):
        if not hasattr(brain, method):
            continue
        original = getattr(brain, method)

        @functools.wraps(original)
        def wrapped(*args, __orig=original, __name=method, **kwargs):
            start = time.perf_counter()
            with profiler.annotate(__name):
                out = __orig(*args, **kwargs)
            profiler.record(__name, time.perf_counter() - start)
            profiler.step()
            return out

        setattr(brain, method, wrapped)
    return brain


def report_time(profiler, file=None):
    """Aggregate per-method wall-clock (reference ``report_time``)."""
    from collections import defaultdict
    totals = defaultdict(float)
    counts = defaultdict(int)
    for st in profiler.step_times:
        totals[st.name] += st.seconds
        counts[st.name] += 1
    lines = []
    for name in sorted(totals):
        mean_ms = 1000 * totals[name] / counts[name]
        lines.append(f"{name}: {counts[name]} calls, total "
                     f"{totals[name]:.2f}s, mean {mean_ms:.1f}ms")
    text = "\n".join(lines)
    if file is not None:
        print(text, file=file)
    return text


def report_memory(file=None):
    """Device memory snapshot (reference ``report_memory``)."""
    import jax
    lines = []
    for device in jax.devices():
        try:
            stats = device.memory_stats()
        except Exception:  # noqa: BLE001 — not all backends report
            continue
        if stats:
            used = stats.get("bytes_in_use", 0) / 2**20
            peak = stats.get("peak_bytes_in_use", 0) / 2**20
            lines.append(f"{device}: {used:.1f} MiB in use, "
                         f"peak {peak:.1f} MiB")
    text = "\n".join(lines) or "no device memory stats available"
    if file is not None:
        print(text, file=file)
    return text


def export_trace_instructions(logdir):
    """How to view: TensorBoard profile plugin reads the xplane files."""
    return (f"View with: tensorboard --logdir {logdir} "
            f"(Profile tab), or load the .trace.json.gz in Perfetto")
