"""Persistent XLA compilation cache setup.

TPU compiles in this environment go through a remote-compile tunnel, so even
small programs cost seconds and reference-scale train steps cost minutes. The
persistent cache makes every repeat run (same program shapes) skip compilation
entirely. Called by the CLI entry points and bench before any tracing.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "FLOWMAP_COMPILE_CACHE",
        os.path.expanduser("~/.cache/flowmap_tpu/xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
