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
    if not want and not ndev:
        return
    import jax

    try:
        if want and jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
        if ndev:  # per-process CPU device count (multi-host CPU test pods)
            jax.config.update("jax_num_cpu_devices", int(ndev))
    except RuntimeError:
        pass  # backends already initialized; too late to switch
