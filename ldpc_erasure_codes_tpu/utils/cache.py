"""Persistent XLA/Mosaic compilation cache.

The unrolled constant-topology Pallas program (ops/pallas_peel.py,
``schedule="unrolled"``) pays a ~70 s Mosaic compile per (code, shape).
JAX's in-process jit cache does not survive the process, so every fresh
``python bench.py`` repaid it — which is exactly how the round-3 driver
bench timed out with no output (VERDICT r3 missing #1). This module turns
on JAX's *persistent* compilation cache, pointed at a repo-local directory,
so the compile is paid once per machine: a probe on the axon TPU backend
measured 2.5 s -> 0.018 s across processes for a small jit, and the big
Mosaic executables serialize the same way.

``warm_marker``/``mark_warm`` record which (shape, schedule) keys have
completed a successful compile through this cache, letting bench.py decide
*before* tracing whether the expensive schedule will hit the cache or blow
a wall-clock budget (the cache itself offers no cheap existence probe for
a not-yet-traced executable).

Reference analog: the FPGA flow's .aocx is compiled offline once and loaded
by the host at run time (/root/reference/OpenCL/host/src/main.cpp:236-247);
this is the JIT-world equivalent.
"""

from __future__ import annotations

import hashlib
import os

import jax

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def _host_tag() -> str:
    """Short digest of the HOST CPU identity (model + feature flags).

    XLA:CPU AOT executables are compiled for the build machine's exact
    feature set, and JAX's persistent-cache key does NOT include it:
    loading a cache entry produced on a machine with different CPU flags
    first warns ("Compile machine features ... vs host machine features
    ... could lead to execution errors such as SIGILL") and then, round 5
    measured, SEGFAULTS inside compilation_cache.get_executable_and_time
    mid-test-suite (the repo-local cache travels between round machines
    with the checkout). Scoping the cache directory per host identity
    makes stale-machine entries invisible instead of fatal; TPU entries
    recompile once per new machine, which the bench's budget fallback
    already handles.
    """
    ident = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    ident += line
                    if "flags" in line:
                        break
    except OSError:  # pragma: no cover - non-Linux
        import platform

        ident = platform.processor() + platform.machine()
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Default: ``<repo>/.jax_cache/<host-cpu-tag>`` (override with env
    ``LDPC_JAX_CACHE_DIR``; set it to the empty string to disable).
    Returns the active directory, or None when disabled/unavailable.
    Safe to call more than once.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("LDPC_JAX_CACHE_DIR", "")
        if not cache_dir and "LDPC_JAX_CACHE_DIR" in os.environ:
            return None
        if not cache_dir:
            # Default-dir path only: skip entirely on the CPU backend.
            # XLA:CPU executable (de)serialization segfaulted twice in
            # round 5 — reading foreign-machine entries AND writing this
            # machine's own large interpret-mode executables
            # (put_executable_and_time) — and the CPU backend has no
            # remote-compile latency to amortize anyway. The probe uses
            # the config VALUE (never initializes a backend, so callers
            # may still switch platforms afterwards). Explicit
            # LDPC_JAX_CACHE_DIR / cache_dir arguments are honored
            # regardless; LDPC_JAX_CACHE_CPU=1 force-enables.
            try:
                plat = str(jax.config.values.get("jax_platforms") or "")
            except Exception:  # pragma: no cover - config shape change
                plat = ""
            if (
                plat.startswith("cpu")
                and os.environ.get("LDPC_JAX_CACHE_CPU") != "1"
            ):
                return None
            cache_dir = os.path.join(_DEFAULT_DIR, _host_tag())
    if not cache_dir:
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: the win is cross-process reuse, and even small
        # executables cost a remote-tunnel round trip to recompile.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as exc:  # pragma: no cover - config unavailable
        import sys

        print(
            f"note: persistent compilation cache disabled ({exc})",
            file=sys.stderr,
        )
        return None
    return cache_dir


def warm_marker(cache_dir: str, key: str) -> str:
    """Path of the marker recording a completed compile for ``key``."""
    safe = "".join(c if (c.isalnum() or c in "._-") else "_" for c in key)
    return os.path.join(cache_dir, f"warm-{safe}")


def is_warm(cache_dir: str | None, key: str) -> bool:
    """True when a prior process completed the compile for ``key`` through
    this cache directory (so a fresh process will hit the persistent cache)."""
    return cache_dir is not None and os.path.exists(warm_marker(cache_dir, key))


def mark_warm(cache_dir: str | None, key: str) -> None:
    """Record that the compile for ``key`` completed and is now cached."""
    if cache_dir is None:
        return
    try:
        with open(warm_marker(cache_dir, key), "w") as f:
            f.write(jax.__version__ + "\n")
    except OSError:  # pragma: no cover - read-only checkout
        pass
