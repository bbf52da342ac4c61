"""Bit-compat of device ops against the NumPy oracle (SURVEY §4: the oracle
is the gold standard; integer outputs must match exactly given the same
float32 spectrogram; float front end matches to dtype tolerance)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audfprint_tpu import params as P  # noqa: E402
from audfprint_tpu.ops import landmarks as JL  # noqa: E402
from audfprint_tpu.ops import peaks as JP  # noqa: E402
from audfprint_tpu.ops import pipeline as JPipe  # noqa: E402
from audfprint_tpu.ops import spectro as JS  # noqa: E402
from audfprint_tpu.ops.config import PipelineConfig  # noqa: E402
from audfprint_tpu.oracle import analyze as oa  # noqa: E402

CFG = PipelineConfig()
AP = P.AnalyzerParams()


def _rand_sgram(rng, B=2, T=60, F=256, scale=3.0):
    """Spectrogram-like random field with tonal ridges (float32)."""
    x = rng.standard_normal((B, T, F)).astype(np.float32)
    for b in range(B):
        for _ in range(8):
            f0 = rng.integers(5, F - 5)
            t0, t1 = sorted(rng.integers(0, T, 2).tolist())
            x[b, t0:t1 + 1, f0] += scale
    return x


def test_locmax2_matches_oracle(rng):
    v = rng.standard_normal((8, 256)).astype(np.float32)
    v[2, 10:20] = 1.0  # plateaus exercise tie rules
    got = np.asarray(JP.locmax2(jnp.asarray(v)))
    want = np.stack([oa.locmax(row) for row in v])
    assert np.array_equal(got, want)


def test_fwd_prune_bitexact(rng):
    sg = _rand_sgram(rng)
    B, T, F = sg.shape
    nf = np.array([T, T - 7], dtype=np.int32)
    got = np.asarray(JP.fwd_prune(jnp.asarray(sg), jnp.asarray(nf), CFG))
    for b in range(B):
        want = oa.fwd_prune(sg[b, : nf[b]], AP)
        assert np.array_equal(got[b, : nf[b]], want), f"row {b}"
        assert not got[b, nf[b]:].any()


def test_bwd_prune_bitexact(rng):
    sg = _rand_sgram(rng)
    B, T, F = sg.shape
    nf = np.array([T, T - 5], dtype=np.int32)
    fwd = JP.fwd_prune(jnp.asarray(sg), jnp.asarray(nf), CFG)
    got = np.asarray(JP.bwd_prune(jnp.asarray(sg), fwd, jnp.asarray(nf), CFG))
    fwd_np = np.asarray(fwd)
    for b in range(B):
        want = oa.bwd_prune(sg[b, : nf[b]], fwd_np[b, : nf[b]].copy(), AP)
        assert np.array_equal(got[b, : nf[b]], want), f"row {b}"
        assert not got[b, nf[b]:].any()


def test_pairing_bitexact(rng):
    # random sparse peak mask, <=5 per frame
    B, T, F = 2, 80, 256
    mask = np.zeros((B, T, F), bool)
    for b in range(B):
        for t in range(T):
            k = rng.integers(0, 6)
            mask[b, t, rng.choice(F, size=k, replace=False)] = True
    bins, valid = JP.mask_to_slots(jnp.asarray(mask), CFG)
    times, hashes, lvalid = JL.slots_to_hashes(bins, valid, CFG)
    times, hashes, lvalid = map(np.asarray, (times, hashes, lvalid))
    for b in range(B):
        pklist = [(int(t), int(f)) for t, f in zip(*np.nonzero(mask[b]))]
        want = oa.landmarks2hashes(oa.peaks2landmarks(pklist, AP))
        got = np.stack([times[b][lvalid[b]], hashes[b][lvalid[b]]], axis=1)
        # compare as sorted multisets of (t, hash) rows
        want_s = want[np.lexsort((want[:, 1], want[:, 0]))] if len(want) else want
        got_s = got[np.lexsort((got[:, 1], got[:, 0]))] if len(got) else got
        assert np.array_equal(got_s, want_s), f"row {b}"


def test_spectrogram_close(audio_5s):
    want = oa.spectrogram(audio_5s, AP)
    n = np.array([len(audio_5s)], np.int32)
    pad = np.zeros(1000, np.float32)
    got = np.asarray(JS.whitened_spectrogram(
        jnp.asarray(np.concatenate([audio_5s, pad]))[None],
        jnp.asarray(JPipe.frame_count_device(jnp.asarray(n), CFG)), CFG))[0]
    T = want.shape[0]
    assert got.shape[1:] == (256,)
    # np.fft vs XLA fft differ in ulps; the log + HPF amplify slightly
    np.testing.assert_allclose(got[:T], want, atol=5e-3, rtol=1e-3)


def test_end_to_end_hashes_near_oracle(audio_5s):
    want = oa.samples_to_hashes(audio_5s, AP)
    got = JPipe.fingerprint_numpy(audio_5s[None], [len(audio_5s)], CFG)[0]
    # float front ends differ in ulps (np.fft vs XLA fft) -> near-tie peak
    # flips are possible; demand high agreement, not equality
    sw = {tuple(r) for r in want.tolist()}
    sg = {tuple(r) for r in got.tolist()}
    jaccard = len(sw & sg) / max(1, len(sw | sg))
    assert jaccard > 0.9, (len(sw), len(sg), jaccard)
    # sorted + unique
    packed = got[:, 0].astype(np.int64) * (1 << 20) + got[:, 1]
    assert np.all(np.diff(packed) > 0)


def test_peaks_from_same_sgram_bitexact(audio_5s):
    """Isolate the integer path: same f32 sgram -> identical hashes."""
    sg = oa.spectrogram(audio_5s, AP)
    T = sg.shape[0]
    nf = np.array([T], np.int32)
    mask = np.asarray(JP.find_peaks_mask(
        jnp.asarray(sg)[None], jnp.asarray(nf), CFG))[0]
    want_mask = oa.find_peaks_mask(sg, AP)
    assert np.array_equal(mask, want_mask)


def test_shifts_expand(audio_5s):
    cfg2 = CFG._replace(shifts=4)
    got = JPipe.fingerprint_numpy(audio_5s[None], [len(audio_5s)], cfg2)[0]
    ap2 = P.AnalyzerParams(shifts=4)
    want = oa.samples_to_hashes(audio_5s, ap2)
    sw = {tuple(r) for r in want.tolist()}
    sg = {tuple(r) for r in got.tolist()}
    assert len(sw & sg) / max(1, len(sw | sg)) > 0.9
    # more shifts -> at least as many unique hashes as single shift
    got1 = JPipe.fingerprint_numpy(audio_5s[None], [len(audio_5s)], CFG)[0]
    assert len(got) >= len(got1)


def test_slots_to_hashes_scan_equals_dense(rng):
    """The scan-over-dt pairing must be bit-identical to the dense
    formulation (and hence the oracle) on random slot patterns."""
    import jax.numpy as jnp
    from audfprint_tpu.ops import landmarks as L
    from audfprint_tpu.ops.config import PipelineConfig
    cfg = PipelineConfig()
    B, T, K = 3, 200, cfg.maxpksperframe
    # random ascending-bin slots with random validity
    bins = np.sort(rng.integers(0, 256, (B, T, K)), axis=-1).astype(np.int32)
    valid = rng.random((B, T, K)) < 0.4
    # enforce "valid slots first" like mask_to_slots produces
    order = np.argsort(~valid, axis=-1, kind="stable")
    bins = np.take_along_axis(bins, order, axis=-1)
    valid = np.take_along_axis(valid, order, axis=-1)
    a = L.slots_to_hashes(jnp.asarray(bins), jnp.asarray(valid), cfg)
    b = L.slots_to_hashes_dense(jnp.asarray(bins), jnp.asarray(valid), cfg)
    for x, y, name in zip(a, b, ("times", "hashes", "lvalid")):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), name)


def test_sort_dedup_packed_equals_twokey(audio_5s):
    """The packed single-key sort (T <= 2047) and the two-key sort must
    produce identical rows.  The branch is chosen by the STATIC padded
    frame count, so the same 5 s of audio in a 2^20-sample buffer
    (T = 4095 -> two-key) must reproduce the small-buffer (packed) rows."""
    small = JPipe.fingerprint_numpy(
        audio_5s[None], [len(audio_5s)], CFG)[0]
    big = np.zeros((1, 1 << 20), np.float32)
    big[0, : len(audio_5s)] = audio_5s
    padded = JPipe.fingerprint_numpy(big, [len(audio_5s)], CFG)[0]
    np.testing.assert_array_equal(small, padded)
