"""Oracle self-consistency: analysis pipeline, hash packing, table, matcher."""

import numpy as np
import pytest

from audfprint_tpu import params as P
from audfprint_tpu.index.hash_table import HashTable
from audfprint_tpu.oracle import analyze as oa
from audfprint_tpu.oracle import match as om


def test_locmax_matches_reference_convention():
    v = np.array([0.0, 1.0, 0.5, 0.5, 2.0, 2.0, 1.0])
    m = oa.locmax(v)
    # i=1 rises and falls -> max; i=3 plateau start (v3>=v2 ok, v4>=v3 -> not)
    # i=5: v5>=v4 (equal) and v6<v5 -> max; last point not (v6<v5 handled)
    assert m.tolist() == [False, True, False, False, False, True, False]
    # last point is max iff >= its left neighbor
    assert oa.locmax(np.array([0.0, 1.0, 2.0])).tolist() == [False, False, True]


def test_hash_roundtrip():
    lmks = [(5, 200, 220, 10), (0, 0, 31, 2), (100, 255, 224, 62)]
    hashes = oa.landmarks2hashes(lmks)
    back = oa.hashes2landmarks(hashes)
    assert back.tolist() == [list(l) for l in lmks]
    assert np.all(hashes[:, 1] < (1 << 20))


def test_hash_negative_df_signextends():
    hashes = oa.landmarks2hashes([(3, 100, 80, 5)])  # df = -20
    back = oa.hashes2landmarks(hashes)
    assert back[0].tolist() == [3, 100, 80, 5]


def test_spectrogram_shape(audio_5s):
    p = P.AnalyzerParams()
    sg = oa.spectrogram(audio_5s, p)
    assert sg.shape == (p.frame_count(len(audio_5s)), 256)
    assert sg.dtype == np.float32


def test_find_peaks_density(audio_5s):
    p = P.AnalyzerParams()
    pks = oa.find_peaks(audio_5s, P.TARGET_SR, p)
    assert len(pks) > 20
    # columns sorted, <= maxpksperframe per column
    cols = np.array([c for c, _ in pks])
    assert np.all(np.diff(cols) >= 0)
    _, percol = np.unique(cols, return_counts=True)
    assert percol.max() <= p.maxpksperframe


def test_pairing_respects_windows(audio_5s):
    p = P.AnalyzerParams()
    lmks = oa.peaks2landmarks(oa.find_peaks(audio_5s, P.TARGET_SR, p), p)
    assert len(lmks) > 10
    arr = np.array(lmks)
    assert np.all(arr[:, 3] >= p.mindt) and np.all(arr[:, 3] < p.targetdt)
    assert np.all(np.abs(arr[:, 2] - arr[:, 1]) < p.targetdf)
    # fanout cap per anchor
    _, cnt = np.unique(arr[:, :2], axis=0, return_counts=True)
    assert cnt.max() <= p.maxpairsperpeak


def test_samples_to_hashes_sorted_unique(audio_5s):
    h = oa.samples_to_hashes(audio_5s)
    assert len(h) > 10
    packed = h[:, 0].astype(np.int64) * (1 << 20) + h[:, 1]
    assert np.all(np.diff(packed) > 0)  # strictly increasing = sorted+unique


def test_table_store_get_roundtrip():
    ht = HashTable(hashbits=10, depth=4, maxtime=256)
    pairs = np.array([[1, 5], [2, 5], [3, 5], [10, 7]])
    ht.store("a", pairs)
    hits = ht.get_hits(np.array([[0, 5]]))
    assert hits.shape == (3, 4)
    assert np.all(hits[:, 0] == 0)          # id
    assert hits[:, 1].tolist() == [1, 2, 3]  # dt = stored - 0
    e = ht.get_entry(7)
    assert e.tolist() == [[0, 10]]
    assert ht.totalhashes() == 4


def test_table_reservoir_overflow_deterministic():
    ht1 = HashTable(hashbits=8, depth=3, maxtime=64)
    ht2 = HashTable(hashbits=8, depth=3, maxtime=64)
    pairs = np.stack([np.arange(50) % 64, np.full(50, 9)], axis=1)
    ht1.store("x", pairs)
    ht2.store("x", pairs)
    assert np.array_equal(ht1.table, ht2.table)
    assert ht1.counts[9] == 50
    assert ht1.totalhashes() == 3


def test_store_vectorized_matches_sequential(rng):
    ht_seq = HashTable(hashbits=8, depth=5, maxtime=1024)
    ht_vec = HashTable(hashbits=8, depth=5, maxtime=1024)
    for name in ["a", "b"]:
        pairs = np.stack([rng.integers(0, 2000, 500),
                          rng.integers(0, 256, 500)], axis=1)
        ht_seq.store(name, pairs)
        ht_vec.store_vectorized(name, pairs)
    assert np.array_equal(ht_seq.table, ht_vec.table)
    assert np.array_equal(ht_seq.counts, ht_vec.counts)
    assert np.array_equal(ht_seq.hashesperid, ht_vec.hashesperid)


def test_table_save_load_merge_remove(tmp_path):
    ht = HashTable(hashbits=10, depth=4, maxtime=256)
    ht.store("a", np.array([[1, 5], [2, 6]]))
    f = str(tmp_path / "db.pklz")
    ht.save(f)
    ht2 = HashTable(f)
    assert ht2.names == ["a"]
    assert np.array_equal(ht2.table, ht.table)

    other = HashTable(hashbits=10, depth=4, maxtime=256)
    other.store("b", np.array([[3, 5]]))
    ht2.merge(other)
    hits = ht2.get_hits(np.array([[0, 5]]))
    assert sorted(hits[:, 0].tolist()) == [0, 1]
    assert ht2.names == ["a", "b"]

    ht2.remove("a")
    hits = ht2.get_hits(np.array([[0, 5]]))
    assert hits[:, 0].tolist() == [1]
    assert ht2.names[0] is None


def test_pklz_compact_save_roundtrip(tmp_path, rng):
    """Sparse saves pickle only occupied slots; reload is bit-exact.

    Includes overflowed buckets (counts > depth), a zero-valued stored
    entry (id 0 at t 0 packs to entry 0), and the dense fallback when the
    tail invariant is broken by external mutation."""
    import gzip as _gzip
    import pickle as _pickle

    ht = HashTable(hashbits=12, depth=4, maxtime=256)
    pairs = np.stack([rng.integers(0, 200, 4000) % 256,
                      rng.integers(0, 1 << 12, 4000)], axis=1)
    ht.store("a", pairs)                      # overflows many buckets
    ht.store("zero", np.array([[0, 7]]))      # id 1; then re-store id 0:
    ht.table[7, np.minimum(ht.counts[7], ht.depth) - 1] = 0  # fake (0, 0)
    # the poked slot is STORED (within counts) so compact must keep parity
    f = str(tmp_path / "c.pklz")
    ht.save(f)
    with _gzip.open(f, "rb") as fh:
        state = _pickle.load(fh)
    assert "table_compact" in state and "table" not in state
    ht2 = HashTable(f)
    assert np.array_equal(ht2.table, ht.table)
    assert np.array_equal(ht2.counts, ht.counts)
    assert ht2.names == ht.names

    # tail invariant broken (nonzero slot past stored count) -> dense save
    empty_bucket = int(np.nonzero(ht.counts == 0)[0][0])
    ht.table[empty_bucket, 2] = 12345
    f2 = str(tmp_path / "d.pklz")
    ht.save(f2)
    with _gzip.open(f2, "rb") as fh:
        state2 = _pickle.load(fh)
    assert "table" in state2 and "table_compact" not in state2
    ht3 = HashTable(f2)
    assert np.array_equal(ht3.table, ht.table)

    # near-full tables skip the compact form on size grounds
    full = HashTable(hashbits=6, depth=2, maxtime=256)
    full.table[:] = 1
    full.counts[:] = 2
    assert full._compact_table_state() is None


def _build_db(audio, n_tracks=4, rng=None):
    ht = HashTable()
    tracks = []
    for i in range(n_tracks):
        x = conftest_synth(rng)
        tracks.append(x)
        ht.store(f"track{i}", oa.samples_to_hashes(x))
    return ht, tracks


def conftest_synth(rng):
    from tests.conftest import synth_audio
    return synth_audio(rng, dur_sec=6.0)


def test_match_self_and_nomatch(rng):
    ht, tracks = _build_db(None, n_tracks=4, rng=rng)
    mp = P.MatcherParams()
    # self-match: a clip out of track 2
    sr = P.TARGET_SR
    clip = tracks[2][3 * sr: 6 * sr]
    qh = oa.samples_to_hashes(clip)
    res = om.match_hashes(ht, qh, mp)
    assert len(res) == 1
    assert res[0, 0] == 2
    # offset should be ~3 sec = 3*43.07 ~ 129 frames
    assert abs(res[0, 2] - 3 * sr / 256) < 5
    # noise query: no match
    noise = (0.1 * rng.standard_normal(3 * sr)).astype(np.float32)
    res = om.match_hashes(ht, oa.samples_to_hashes(noise), mp)
    assert len(res) == 0


def test_match_exact_count_and_time_range(rng):
    ht, tracks = _build_db(None, n_tracks=2, rng=rng)
    sr = P.TARGET_SR
    clip = tracks[1][2 * sr: 5 * sr]
    qh = oa.samples_to_hashes(clip)
    mp = P.MatcherParams(exact_count=True, find_time_range=True)
    res = om.match_hashes(ht, qh, mp)
    assert len(res) == 1 and res[0, 0] == 1
    assert res[0, 4] <= res[0, 5]  # min_t <= max_t
    mp2 = P.MatcherParams()
    res2 = om.match_hashes(ht, qh, mp2)
    # exact count cannot exceed approx (approx may double-count)
    assert res[0, 1] <= res2[0, 1]
