"""Persistent XLA compilation cache.

First compiles of the large index programs are expensive (especially through
remote-compile TPU tunnels); the persistent cache makes them one-time per
machine. Safe to call multiple times.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.environ.get("RADIANT_JAX_CACHE_DIR", os.path.expanduser("~/.cache/radiant_tpu_jax"))


def enable_compilation_cache(cache_dir: str = "") -> None:
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir or DEFAULT_CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as exc:  # pragma: no cover
        logger.info("compilation cache unavailable: %s", exc)
