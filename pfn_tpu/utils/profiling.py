"""Tracing, timing, and debug instrumentation.

Parity: the reference's observability is hand-rolled wall-clock timing of
three channels per batch — data-generation time, forward time, optimizer-step
time — printed per epoch (reference train.py:63-108,125-132). Those channels
stay first-class here (the north-star metric is prior-batches/sec) plus the
TPU-native upgrades: ``jax.profiler`` trace capture for XLA-level analysis
and a ``debug_nans`` toggle as the analog of the reference's inline assert
culture (SURVEY.md §5 "race detection / sanitizers").

Note the fused train step makes the reference's data/forward split
unmeasurable from the host (prior sampling and the model run inside ONE
XLA program — that fusion is the point); :class:`StepTimers` therefore
reports the fused step time plus any host-side channels callers add, and
:func:`trace` captures a profiler trace where the on-device breakdown is
visible per-op.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict

import jax


@dataclasses.dataclass
class ChannelStats:
    total: float = 0.0
    count: int = 0

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


class StepTimers:
    """Named wall-clock channels (reference train.py:63-108 keeps
    time_to_get_batch / forward_time / step_time; channels here are open)."""

    def __init__(self):
        self._stats: dict[str, ChannelStats] = defaultdict(ChannelStats)

    @contextlib.contextmanager
    def channel(self, name: str, block_on=None):
        """Time a block; pass ``block_on`` (an array/pytree) to include device
        completion via block_until_ready — otherwise async dispatch makes
        host timing meaningless."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            s = self._stats[name]
            s.total += time.perf_counter() - t0
            s.count += 1

    def record(self, name: str, seconds: float):
        s = self._stats[name]
        s.total += seconds
        s.count += 1

    def means(self) -> dict[str, float]:
        return {k: v.mean for k, v in self._stats.items()}

    def summary(self) -> str:
        """One-line epoch banner like the reference's (train.py:125-132)."""
        return " | ".join(
            f"{k} {v.mean * 1000:.1f}ms/it" for k, v in sorted(self._stats.items())
        )

    def reset(self):
        self._stats.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pfn_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof). The
    TPU-native replacement for the reference's print-based timing."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax.debug_nans — the analog of the reference's runtime assert
    culture (SURVEY.md §4 item 5): fail loudly at the op that produced a NaN
    instead of training on garbage."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


# Module-level flag read at TRACE time by debug-checkable ops (currently
# BarDistribution.nll's target-support check). pfn_debug_checks() clears the
# jit caches on enter/exit so already-compiled steps are retraced with the
# flag's value baked in.
_DEBUG_CHECKS = False


def debug_checks_enabled() -> bool:
    return _DEBUG_CHECKS


@contextlib.contextmanager
def pfn_debug_checks(enable: bool = True):
    """Scoped strict-checks mode — the analog of the reference's inline
    asserts that the fast path intentionally elides.

    Effects while active:
      * ``BarDistribution.nll`` poisons out-of-support targets with NaN
        instead of silently clamping them to the end buckets (the reference
        asserts at bar_distribution.py:27-28) — so a mis-scaled prior (e.g.
        a custom module prior emitting y beyond the borders) fails loudly
        instead of training on end-bucket NLLs.
      * ``jax_debug_nans`` is enabled, so that NaN (or any other) raises
        FloatingPointError at the offending op.

    jit caches are cleared on enter AND exit: the flag is consulted when a
    function is traced, so cached executables from outside the scope must
    not leak in (or out).
    """
    global _DEBUG_CHECKS
    prev = _DEBUG_CHECKS
    _DEBUG_CHECKS = enable
    jax.clear_caches()
    with debug_nans(enable):
        try:
            yield
        finally:
            _DEBUG_CHECKS = prev
            jax.clear_caches()


def annotate(name: str):
    """Decorator: name a function's ops in profiler traces."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            with jax.named_scope(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco
