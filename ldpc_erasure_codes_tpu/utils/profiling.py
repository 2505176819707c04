"""Timing and throughput helpers.

The reference instruments with MATLAB tic/toc accumulators
(LDPCErasureCodes_MessagePassingAlgSim.m:210-219) and OpenCL event profiling
with the throughput formula S·frames·k/T
(OpenCL/host/src/main.cpp:515,652-658). Equivalents here: wall-clock timing
of jitted callables with compile excluded, the same information-bit
throughput formula, and a thin wrapper over ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any, Callable

import jax


@dataclasses.dataclass
class Timing:
    """One measured kernel: wall seconds over ``reps`` calls (compile
    excluded via a warmup call), plus derived rates."""

    name: str
    reps: int
    seconds: float
    items: int = 0  # e.g. frames processed across all reps

    @property
    def per_call(self) -> float:
        return self.seconds / max(self.reps, 1)

    @property
    def items_per_sec(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0

    def info_gbps(self, k: int, symbol_bits: int) -> float:
        """S·frames·k/T (main.cpp:652-658)."""
        return self.items_per_sec * k * symbol_bits / 1e9


def time_fn(
    fn: Callable[..., Any],
    *args,
    reps: int = 10,
    warmup: int = 1,
    name: str | None = None,
    items_per_call: int = 0,
) -> Timing:
    """Time a device callable: warmup (compile) first, then ``reps`` calls
    timed as one span with a single final block (throughput convention —
    calls pipeline on device like the reference's streamed frames).

    Caveat (measured): make ``fn`` *consume* its computation (e.g. return a
    reduction) — repeated identical calls whose big outputs go unused were
    observed to report physically impossible rates (the runtime elides
    work), e.g. a phantom 343 Tbps for an encoder whose honest, consumed
    measurement is 190 Gbps."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return Timing(
        name=name or getattr(fn, "__name__", "fn"),
        reps=reps,
        seconds=dt,
        items=items_per_call * reps,
    )


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace context — view with TensorBoard/XProf.

    Usage::

        with profiling.trace("/tmp/jax-trace"):
            jax.block_until_ready(step(key, cw))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
