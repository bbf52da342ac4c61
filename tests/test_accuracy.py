"""Retrieval-quality harness: P/R on a small DB of synthetic tracks with
clean, noisy, and shifted queries (BASELINE configs 2-3 at CI scale)."""

import numpy as np
import pytest

from audfprint_tpu import params as P
from audfprint_tpu.index.hash_table import HashTable
from audfprint_tpu.match.matcher import Matcher
from audfprint_tpu.models.analyzer import Analyzer
from tests.conftest import synth_audio

SR = 11025
N_TRACKS = 16
DUR = 8.0


@pytest.fixture(scope="module")
def db():
    rng = np.random.default_rng(2026)
    analyzer = Analyzer()
    ht = HashTable(hashbits=18, depth=50, maxtime=8192)
    tracks = []
    for i in range(N_TRACKS):
        x = synth_audio(rng, dur_sec=DUR, n_tones=60)
        tracks.append(x)
    hashes = analyzer.samples_batch2hashes(tracks)
    for i, h in enumerate(hashes):
        ht.store_vectorized(f"track{i}", h)
    return analyzer, ht, tracks, rng


def _top1_acc(analyzer, ht, queries, truths, matcher=None):
    matcher = matcher or Matcher()
    hash_lists = analyzer.samples_batch2hashes(queries)
    results = matcher.match_hashes_batch(ht, hash_lists)
    correct = sum(1 for rows, truth in zip(results, truths)
                  if len(rows) and rows[0][0] == truth)
    return correct / len(truths)


def test_clean_exact_segment_queries(db):
    analyzer, ht, tracks, rng = db
    queries, truths = [], []
    for i in range(N_TRACKS):
        start = rng.integers(0, int((DUR - 4) * SR))
        queries.append(tracks[i][start: start + 4 * SR].copy())
        truths.append(i)
    assert _top1_acc(analyzer, ht, queries, truths) >= 0.95


def test_noisy_queries(db):
    analyzer, ht, tracks, rng = db
    queries, truths = [], []
    for i in range(N_TRACKS):
        start = rng.integers(0, int((DUR - 4) * SR))
        clip = tracks[i][start: start + 4 * SR].copy()
        clip = clip + 0.05 * rng.standard_normal(len(clip)).astype(np.float32)
        queries.append(clip)
        truths.append(i)
    acc = _top1_acc(analyzer, ht, queries, truths)
    assert acc >= 0.8, acc


def test_no_false_positives_on_noise(db):
    analyzer, ht, _tracks, rng = db
    noise = [(0.1 * rng.standard_normal(4 * SR)).astype(np.float32)
             for _ in range(8)]
    hash_lists = analyzer.samples_batch2hashes(noise)
    results = Matcher().match_hashes_batch(ht, hash_lists)
    fp = sum(1 for rows in results if len(rows))
    assert fp == 0


def test_shifts_improve_aligned_counts(db):
    """--shifts raises aligned counts for misaligned queries (SURVEY §2.2)."""
    analyzer, ht, tracks, rng = db
    a4 = Analyzer(shifts=4)
    # offset by half a hop so frames misalign maximally
    start = 128
    clip = tracks[3][start: start + 4 * SR].copy()
    h1 = analyzer.samples_batch2hashes([clip])[0]
    h4 = a4.samples_batch2hashes([clip])[0]
    m = Matcher()
    r1 = m.match_hashes(ht, h1)
    r4 = m.match_hashes(ht, h4)
    assert len(r4) and r4[0][0] == 3
    if len(r1):
        assert r4[0][1] >= r1[0][1]


def test_snr_sweep_recall_curve(db):
    """Robustness as a CURVE, not a point (VERDICT r1 #8): top-1 recall
    over decreasing SNR must be high at clean-ish SNRs and monotonically
    non-increasing within tolerance as noise grows."""
    analyzer, ht, tracks, rng = db
    snrs_db = [30, 20, 10, 5, 0]
    recalls = []
    queries0, truths = [], []
    for i in range(N_TRACKS):
        start = rng.integers(0, int((DUR - 4) * SR))
        queries0.append(tracks[i][start: start + 4 * SR].copy())
        truths.append(i)
    for snr_db in snrs_db:
        queries = []
        for clip in queries0:
            sig_pow = float(np.mean(clip ** 2))
            noise_pow = sig_pow / (10 ** (snr_db / 10))
            noise = np.sqrt(noise_pow) * rng.standard_normal(len(clip))
            queries.append((clip + noise).astype(np.float32))
        recalls.append(_top1_acc(analyzer, ht, queries, truths))
    # high recall while noise is mild
    assert recalls[0] >= 0.9, (snrs_db, recalls)
    assert recalls[1] >= 0.8, (snrs_db, recalls)
    # roughly monotone: no step up by more than one query as SNR drops
    for a, b in zip(recalls, recalls[1:]):
        assert b <= a + 1.0 / N_TRACKS + 1e-9, (snrs_db, recalls)


def test_speed_shift_discriminates(db):
    """±4% speed change must DEGRADE matching sharply — landmark dt/df
    quantization is not speed-robust (SURVEY §0), and a harness where
    every condition scores 1.0 proves nothing (VERDICT r2 #5).  This pins
    that the curve actually bends."""
    from scipy.signal import resample_poly
    analyzer, ht, tracks, rng = db
    clean, shifted, truths = [], [], []
    for i in range(N_TRACKS):
        start = rng.integers(0, int((DUR - 4) * SR))
        clip = tracks[i][start: start + 4 * SR].copy()
        clean.append(clip)
        shifted.append(resample_poly(
            clip.astype(np.float64), 962, 1000).astype(np.float32))
        truths.append(i)
    r_clean = _top1_acc(analyzer, ht, clean, truths)
    r_shift = _top1_acc(analyzer, ht, shifted, truths)
    assert r_clean >= 0.9, r_clean
    assert r_shift <= r_clean - 0.3, (r_clean, r_shift)


def test_out_of_db_music_fp_rate(db):
    """Out-of-DB MUSIC-LIKE queries (structured signal, not just noise —
    the harder false-positive case) report nothing at the default
    threshold."""
    analyzer, ht, _tracks, _rng = db
    oodb = [synth_audio(np.random.default_rng(777000 + i), dur_sec=4.0,
                        n_tones=60) for i in range(8)]
    results = Matcher().match_hashes_batch(
        ht, analyzer.samples_batch2hashes(oodb))
    fp = sum(1 for rows in results if len(rows))
    assert fp == 0, fp


def test_speed_sweep_recovers_shifted_queries(db):
    """Matcher.match_samples_sweep closes the speed blind spot that
    test_speed_shift_discriminates pins: +4%-sped queries (recall
    collapsed on the plain path) recover to near-clean top-1 accuracy
    when swept at +/-4% corrections, and the winning factor is non-unity
    for the recovered ones."""
    from scipy.signal import resample_poly
    analyzer, ht, tracks, rng = db
    shifted, truths = [], []
    for i in range(N_TRACKS):
        start = rng.integers(0, int((DUR - 4) * SR))
        clip = tracks[i][start: start + 4 * SR].copy()
        shifted.append(resample_poly(
            clip.astype(np.float64), 962, 1000).astype(np.float32))
        truths.append(i)
    r_plain = _top1_acc(analyzer, ht, shifted, truths)
    best = Matcher().match_samples_sweep(analyzer, ht, shifted, 4.0)
    hits = sum(1 for (rr, _f, _nh), t in zip(best, truths)
               if len(rr) and int(rr[0][0]) == t)
    r_sweep = hits / len(truths)
    assert r_sweep >= 0.9, (r_plain, r_sweep)
    assert r_sweep >= r_plain + 0.3, (r_plain, r_sweep)
    assert any(f != 1.0 for _rr, f, _nh in best)
