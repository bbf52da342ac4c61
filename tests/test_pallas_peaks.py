"""Fused Pallas peak kernel (interpret mode) vs the XLA scan path: exact."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audfprint_tpu.ops import pallas_peaks as PP  # noqa: E402
from audfprint_tpu.ops import peaks as PK  # noqa: E402
from audfprint_tpu.ops import spectro as SP  # noqa: E402
from audfprint_tpu.ops.config import PipelineConfig  # noqa: E402

CFG = PipelineConfig()


def _rand_sgram(rng, B=2, T=48, F=256, scale=3.0):
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    for b in range(B):
        for _ in range(6):
            f0 = rng.integers(5, F - 5)
            t0, t1 = sorted(rng.integers(0, T, 2).tolist())
            x[b, t0:t1 + 1, f0] += scale
    return x


def test_fused_kernel_matches_xla(rng):
    white = _rand_sgram(rng)
    B, T, F = white.shape
    nf = jnp.asarray(np.array([T, T - 9], np.int32))
    want = PK.find_peaks_mask(SP.hpf(jnp.asarray(white), CFG), nf, CFG)
    got = PP.find_peaks_mask_fused(jnp.asarray(white), nf, CFG,
                                   interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_fused_kernel_odd_batch(rng):
    """Batch not a multiple of 8 exercises the padding path."""
    white = _rand_sgram(rng, B=3, T=32)
    nf = jnp.asarray(np.array([32, 20, 5], np.int32))
    want = PK.find_peaks_mask(SP.hpf(jnp.asarray(white), CFG), nf, CFG)
    got = PP.find_peaks_mask_fused(jnp.asarray(white), nf, CFG,
                                   interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_slots_match_mask_path(seed):
    """find_peaks_slots_fused (the product path: compact kept lists ->
    delete-next -> ascending slots, round 3b) must equal
    mask_to_slots(find_peaks_mask(...)) exactly, including on tie-heavy
    quantized inputs where the delete-next rule fires repeatedly."""
    rng = np.random.default_rng(seed)
    white = _rand_sgram(rng, B=3, T=40)
    if seed == 2:  # quantized: plateaus + consecutive-frame repeats
        white = np.round(white).astype(np.float32)
    nf = jnp.asarray(np.array([40, 25, 8], np.int32))
    mask = PK.find_peaks_mask(SP.hpf(jnp.asarray(white), CFG), nf, CFG)
    wbins, wvalid = PK.mask_to_slots(mask, CFG)
    gbins, gvalid = PP.find_peaks_slots_fused(jnp.asarray(white), nf, CFG,
                                              interpret=True)
    assert np.array_equal(np.asarray(gvalid), np.asarray(wvalid))
    assert np.array_equal(np.asarray(gbins), np.asarray(wbins))
