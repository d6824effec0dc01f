"""Persistent XLA compilation cache wiring.

The serving engine compiles one step per (model, batch bucket, canvas
bucket) and one fused decode step per (sampling mode, luma bucket) — a
dozen-plus graphs whose cold compiles cost minutes each over a
remote-compile tunnel (docs/benchmarks.md). ``bench.py`` always enabled
the on-disk cache; production boots paid the full cost on every restart.
This module gives the app, the train CLI and the background job manager
the same cache, keyed by ``TPU_COMPILATION_CACHE_DIR``.

No reference counterpart (the reference performs no compilation); this is
operational hygiene for the net-new TPU tier.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_enabled_dir: Optional[str] = None


def enable_persistent_cache(cache_dir: Optional[str] = None) -> bool:
    """Point JAX's compilation cache at ``cache_dir`` (default: the
    ``TPU_COMPILATION_CACHE_DIR`` setting). Returns True when the cache is
    active. Idempotent; empty dir disables (no-op)."""
    global _enabled_dir
    if cache_dir is None:
        from ics_tpu.core.config import settings

        cache_dir = settings.TPU_COMPILATION_CACHE_DIR
    if not cache_dir:
        return False
    if _enabled_dir == cache_dir:
        return True
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        _enabled_dir = cache_dir
    except Exception:
        logger.exception("persistent compilation cache unavailable")
        return False
    try:
        # persist even fast compiles: a step that compiles in <1 s on this
        # host can still be minutes cold over the tunnel on the next boot
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # knob name varies across jax versions; cache still on
        logger.debug("jax_persistent_cache_min_compile_time_secs unavailable")
    logger.info("XLA compilation cache: %s", cache_dir)
    return True
