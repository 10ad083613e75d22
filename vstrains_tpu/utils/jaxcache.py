"""Persistent XLA compilation-cache activation.

Accelerator kernel compiles cost tens of seconds per shape — minutes
over a remote-compile relay — and amortize across processes only
through jax's persistent compilation cache. Activation has one trap:
in environments whose sitecustomize imports jax at interpreter start,
the JAX_COMPILATION_CACHE_DIR environment variable is read BEFORE any
user code runs, so setting it in a script does nothing. The only
reliable activation is jax.config.update after import — which is what
this module does, honoring an explicitly-set env var's VALUE while
never trusting that the env var took effect. Called from package
import (vstrains_tpu/__init__.py), pipeline.run, and prewarm, all
idempotently.
"""

from __future__ import annotations

import logging
import os

_LOG = logging.getLogger("vstrains_tpu.jaxcache")


def enable_persistent_cache(logger: logging.Logger = None) -> str:
    """Point jax's persistent compilation cache at
    JAX_COMPILATION_CACHE_DIR (or ~/.cache/vstrains_tpu_jax), creating
    the directory. Safe to call any number of times; returns the cache
    dir, or "" when jax is unavailable or the update fails."""
    logger = logger or _LOG
    try:
        import jax
        cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or os.path.join(os.path.expanduser("~"), ".cache",
                                     "vstrains_tpu_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        if jax.config.jax_compilation_cache_dir != cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception as e:  # non-fatal: slower, never wrong
        logger.debug("persistent compilation cache unavailable: %s", e)
        return ""
