"""Platform selection helper.

This machine's sitecustomize registers the axon TPU backend and bakes
JAX_PLATFORMS into jax's config at interpreter startup — env changes after
that are ignored. CLIs call ``apply_platform_env()`` first thing so a
user-provided JAX_PLATFORMS (e.g. 'cpu' for tests) wins, as long as no
backend has been initialized yet.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
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
