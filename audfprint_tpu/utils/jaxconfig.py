"""Process-wide JAX configuration for the framework.

Call `setup()` once (CLI entry, bench, or library users who want it) to:
  * enable the persistent compilation cache (first compile of each
    (shape, config) pair is slow on TPU; later runs hit the cache on disk),
  * leave platform selection alone (the ambient JAX_PLATFORMS, e.g. the
    `axon` TPU tunnel, wins).

NOTE (environment gotcha): the axon TPU plugin is loaded from
PYTHONPATH=/root/.axon_site — never *replace* PYTHONPATH, only append.
"""

from __future__ import annotations

import os

_DONE = False


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "AUDFPRINT_JAX_CACHE", os.path.expanduser("~/.cache/audfprint_tpu_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
    _DONE = True
