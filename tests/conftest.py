"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY §4)."""

import os

# Must be set before jax is imported anywhere in the test process.
# (The ambient environment pins JAX_PLATFORMS=axon — the real TPU — so this
# must be a hard override, not setdefault.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compile cache makes re-runs fast (first run pays the compiles)
import jax  # noqa: E402

# The axon sitecustomize pins jax_platforms="axon,cpu" via jax.config at
# interpreter start (beats the env var) — override it back to CPU here,
# before any backend initializes.
from audfprint_tpu.utils.jaxconfig import machine_tag  # noqa: E402
from audfprint_tpu.utils.jaxconfig import patch_atomic_cache_writes  # noqa: E402

# atomic temp+rename cache writes: a concurrent process sharing the cache
# dir (a benchmark, a second suite) must never expose a half-written
# executable to this process's reads (observed SIGSEGV in
# get_executable_and_time; see utils/jaxconfig.py)
patch_atomic_cache_writes()

jax.config.update("jax_platforms", "cpu")
# Machine-fingerprinted dir: /tmp persists across sessions here but the
# underlying host can change, and XLA:CPU AOT cache entries are machine
# code — loading another host's entries warns of SIGILL and has crashed
# the suite mid-cache-write (see utils/jaxconfig.py docstring).
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jax_cache_audfprint_tests-" + machine_tag())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same stream regardless of which
    # other tests ran (session scope made outcomes order-dependent)
    return np.random.default_rng(20260816)


def synth_audio(rng, dur_sec=5.0, sr=11025, n_tones=24, noise=0.01):
    """Deterministic music-like test signal: random tone bursts + noise."""
    n = int(dur_sec * sr)
    t = np.arange(n) / sr
    x = noise * rng.standard_normal(n)
    for _ in range(n_tones):
        f = rng.uniform(80, 4000)
        start = rng.uniform(0, max(dur_sec - 0.3, 0.05))
        length = rng.uniform(0.1, 0.8)
        seg = (t >= start) & (t < start + length)
        env = np.hanning(int(seg.sum())) if seg.sum() > 1 else 1.0
        x[seg] += rng.uniform(0.1, 0.5) * env * np.sin(
            2 * np.pi * f * t[seg] + rng.uniform(0, 2 * np.pi))
    return (x / max(1e-9, np.max(np.abs(x))) * 0.7).astype(np.float32)


@pytest.fixture(scope="session")
def audio_5s():
    return synth_audio(np.random.default_rng(20260816), dur_sec=5.0)
