"""Process-wide JAX configuration for the framework.

Call `setup()` once (CLI entry, bench, or library users who want it) to:
  * enable the persistent compilation cache (first compile of each
    (shape, config) pair is slow on TPU; later runs hit the cache on disk),
  * leave platform selection alone (the ambient JAX_PLATFORMS, e.g. the
    `axon` TPU tunnel, wins).

The default cache directory is suffixed with a fingerprint of this host's
CPU feature flags.  XLA:CPU serializes AOT-compiled executables keyed only
by (HLO, compile options) — an entry written on a host with, say, AVX-512
scatter preferences loads on a different host with a loud
"Machine type used for XLA:CPU compilation doesn't match" warning and can
SIGILL/segfault (observed: a cache dir carried across machines in /tmp
crashed the test suite mid-`put_executable_and_time`).  Fingerprinting the
directory means a new host simply starts cold instead of loading foreign
machine code.  An explicit `cache_dir` argument or AUDFPRINT_JAX_CACHE is
used verbatim (caller owns portability).

NOTE (environment gotcha): the axon TPU plugin is loaded from
PYTHONPATH=/root/.axon_site — never *replace* PYTHONPATH, only append.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DONE = False


def machine_tag() -> str:
    """8-hex-char fingerprint of the host CPU's ISA feature set.

    Reads the first `flags`/`Features` line of /proc/cpuinfo (order is
    stable for a given kernel+CPU); falls back to the uarch name where
    /proc is unavailable (macOS, containers without procfs).
    """
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not feats:
        feats = platform.machine() + " " + platform.processor()
    return hashlib.md5(feats.encode()).hexdigest()[:8]


def default_cache_dir(base: str = "~/.cache/audfprint_tpu_jax") -> str:
    return os.path.expanduser(base) + "-" + machine_tag()


def setup(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "AUDFPRINT_JAX_CACHE", default_cache_dir())
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
    _DONE = True
