"""Persistent XLA compilation cache (new capability over the reference).

First-time jit compiles on a tunneled TPU backend take tens of seconds to
minutes for the full train step; the persistent cache makes every later
process start (resume, eval-after-train, bench rerun) hit disk instead of
the compiler. Enabled by all entry points; override the location with
COPENERF_COMPILE_CACHE (empty string disables).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/copenerf_tpu/jax")
_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotent; safe to call before or after other jax configuration."""
    global _enabled
    if _enabled:
        return
    if cache_dir is None:
        cache_dir = os.environ.get("COPENERF_COMPILE_CACHE", _DEFAULT_DIR)
    if not cache_dir:
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, including fast-to-compile programs: on a
        # tunneled backend even "fast" compiles cost a round trip.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled = True
    except Exception:
        pass  # cache is an optimization, never a hard dependency
