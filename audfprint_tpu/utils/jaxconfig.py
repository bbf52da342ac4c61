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


def patch_atomic_cache_writes() -> bool:
    """Make JAX's persistent-cache writes ATOMIC (temp file + os.replace).

    jax._src.lru_cache.LRUCache.put writes entries with
    `cache_path.write_bytes(val)` straight to the final path, and takes
    its inter-process lock only when eviction is enabled (it is not by
    default).  Two framework processes sharing one cache dir — a serving
    `match --listen` next to a batch ingest, or a test run next to a
    benchmark — can therefore race: the reader deserializes a
    HALF-WRITTEN executable and segfaults (observed:
    `get_executable_and_time` SIGSEGV mid-suite while a concurrent
    process compiled the same shapes), and a writer killed mid-write
    leaves a permanently poisoned entry.  Writing to a pid-suffixed temp
    file in the same directory and os.replace-ing it in is atomic on
    POSIX: readers only ever see absent or complete entries.

    Returns True when the patch is active (idempotent); False when the
    internal module moved (future jax) — then concurrent processes
    should use distinct AUDFPRINT_JAX_CACHE dirs instead."""
    try:
        from jax._src import lru_cache as _lru

        if getattr(_lru.LRUCache.put, "_audfp_atomic", False):
            return True
        suffix = _lru._CACHE_SUFFIX
        atime_suffix = _lru._ATIME_SUFFIX

        def put(self, key: str, val: bytes) -> None:
            if not key:
                raise ValueError("key cannot be empty")
            if self.eviction_enabled and len(val) > self.max_size:
                return  # upstream warns; an oversized entry is just skipped
            cache_path = self.path / f"{key}{suffix}"
            if self.eviction_enabled:
                self.lock.acquire(timeout=self.lock_timeout_secs)
            try:
                if cache_path.exists():
                    return
                self._evict_if_needed(additional_size=len(val))
                try:
                    # os.replace requires a local POSIX path; a non-local
                    # epath cache dir (gs://...) falls back to upstream's
                    # direct write rather than raising at cache-write time
                    # (ADVICE r4)
                    tmp = self.path / f"{key}.{os.getpid()}.tmp"
                    tmp.write_bytes(val)
                    os.replace(tmp, cache_path)
                except (OSError, ValueError):
                    cache_path.write_bytes(val)
                if self.eviction_enabled:
                    import time
                    ts = time.time_ns().to_bytes(8, "little")
                    (self.path / f"{key}{atime_suffix}").write_bytes(ts)
            finally:
                if self.eviction_enabled:
                    self.lock.release()

        put._audfp_atomic = True
        _lru.LRUCache.put = put
        return True
    except Exception:
        return False


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
    patch_atomic_cache_writes()
    _DONE = True
