"""Persistent XLA compilation cache.

First compiles through this environment's remote-compile tunnel take
30-250 s; the persistent cache cuts warm starts to milliseconds. Called by
every CLI entry point (train/evaluate/bench) before the first jit.
"""

from __future__ import annotations

import os


def enable_compilation_cache(
    directory: str = os.path.expanduser("~/.cache/lpdnet_tpu_xla"),
) -> None:
    """CLI bootstrap: honor JAX_PLATFORMS, then enable the persistent
    cache. Every entry point calls this before its first jit."""
    import jax

    honor_env_platforms()
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def honor_env_platforms() -> None:
    """Re-apply ``JAX_PLATFORMS`` from the environment to the jax config.

    This image's sitecustomize registers the TPU plugin and pins
    ``jax_platforms`` at interpreter start, so the env var a user (or a
    subprocess test) sets is otherwise silently ignored. Called by the CLI
    entry points before any backend initialization; a no-op when the env
    var is unset or the backend is already live.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialized; too late to switch
