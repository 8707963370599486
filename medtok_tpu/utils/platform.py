"""Platform selection helper.

This machine's sitecustomize registers the axon TPU backend and bakes
JAX_PLATFORMS into jax's config at interpreter startup — env changes after
that are ignored. CLIs call ``apply_platform_env()`` first thing so a
user-provided JAX_PLATFORMS (e.g. 'cpu' for tests) wins, as long as no
backend has been initialized yet.
"""

from __future__ import annotations

import os


def tune_malloc() -> bool:
    """Keep freed large allocations on the glibc heap instead of returning
    them to the OS (mallopt M_MMAP_THRESHOLD / M_TRIM_THRESHOLD).

    This VM class faults fresh pages at single-digit MB/s (measured 6-54
    MB/s first-touch — ~0.1-0.5 ms per 4 KiB page), so every large numpy
    temp that glibc serves via mmap/munmap pays that price again on the
    next step. Raising both thresholds makes freed buffers stay warm on the
    heap: a 32 MB alloc+touch cycle drops from 5-54 ms to ~0 ms. Called by
    the perf-sensitive entry points (bench, CLIs); safe no-op off glibc."""
    import ctypes

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        mallopt = libc.mallopt
    except (OSError, AttributeError):
        return False
    mallopt.argtypes = [ctypes.c_int, ctypes.c_int]
    mallopt.restype = ctypes.c_int
    M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
    ok = mallopt(M_MMAP_THRESHOLD, 1 << 30)
    ok &= mallopt(M_TRIM_THRESHOLD, 1 << 30)
    return bool(ok)


def apply_platform_env() -> None:
    tune_malloc()
    want = os.environ.get("JAX_PLATFORMS")
    ndev = os.environ.get("JAX_NUM_CPU_DEVICES")
    cache = os.environ.get("MEDTOK_COMPILE_CACHE")
    if not want and not ndev and not cache:
        return
    import jax

    try:
        if want and jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
        if ndev:  # per-process CPU device count (multi-host CPU test pods)
            jax.config.update("jax_num_cpu_devices", int(ndev))
        if cache:
            # persistent XLA compilation cache shared across CLI
            # subprocesses — the test suite's train/export/ehr/qa CLIs
            # recompile identical tiny programs otherwise (test_cli wall
            # time was compile-dominated)
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except RuntimeError:
        pass  # backends already initialized; too late to switch
