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
    import jax

    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
