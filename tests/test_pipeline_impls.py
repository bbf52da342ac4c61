"""Pipeline implementation selection + long-file path."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audfprint_tpu.ops import pipeline as pipe  # noqa: E402
from audfprint_tpu.ops.config import PipelineConfig  # noqa: E402
from tests.conftest import synth_audio  # noqa: E402

CFG = PipelineConfig()
SR = 11025


def test_pallas_impl_equals_xla_through_pipeline():
    rng = np.random.default_rng(11)
    """fingerprint_batch(impl='pallas') (interpret on CPU) == impl='xla'."""
    x = synth_audio(rng, dur_sec=2.0)
    n = 1 << 15
    batch = np.zeros((2, n), np.float32)
    batch[0, : len(x)] = x[:n]
    batch[1, : n // 2] = x[: n // 2]
    lengths = jnp.asarray(np.array([min(len(x), n), n // 2], np.int32))
    a = pipe.fingerprint_batch(jnp.asarray(batch), lengths, CFG, impl="xla")
    b = pipe.fingerprint_batch(jnp.asarray(batch), lengths, CFG,
                               impl="pallas")
    for x1, x2 in zip(a, b):
        assert np.array_equal(np.asarray(x1), np.asarray(x2))


def test_long_file_matches_oracle_decision():
    rng = np.random.default_rng(77)
    """A 40 s file (T > 1024 frames) ingests and self-matches."""
    from audfprint_tpu.index.hash_table import HashTable
    from audfprint_tpu.match.matcher import Matcher
    from audfprint_tpu.models.analyzer import Analyzer

    x = synth_audio(rng, dur_sec=40.0, n_tones=200)
    an = Analyzer()
    h = an.samples2hashes(x)
    assert h[:, 0].max() > 1024  # really exercises long-T
    ht = HashTable()
    ht.store_vectorized("long", h)
    # hop-aligned clean clip: this 200-tone synthetic is maximally
    # peak-crowded (near-tie local maxima cascade under any perturbation),
    # so robustness is covered by test_accuracy on saner signals — this
    # test targets the long-T (>1024 frame) mechanics
    start = 256 * 1292
    clip = x[start: start + 5 * SR].copy()
    qh = an.samples2hashes(clip)
    rows = Matcher().match_hashes(ht, qh)
    assert len(rows) == 1 and rows[0][0] == 0
    assert abs(rows[0][2] - 1292) <= 2
