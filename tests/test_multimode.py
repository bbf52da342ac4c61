"""Multi-mode exact-count rows + candidate tie-break (VERDICT r1 missing #1,
ADVICE r1): the reference's _exact_match_counts emits one row per
local-maximum dt mode per track (find_modes), and _best_count_ids breaks
weighted-count ties toward the HIGHER id.  Oracle and device matcher must
agree exactly."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audfprint_tpu import params as P  # noqa: E402
from audfprint_tpu.index import device_table as DT  # noqa: E402
from audfprint_tpu.index.hash_table import HashTable  # noqa: E402
from audfprint_tpu.match import voting  # noqa: E402
from audfprint_tpu.oracle import match as om  # noqa: E402

TCFG = DT.TableConfig(hashbits=12, depth=8, maxtimebits=10, seed=0)


def _device_match(ht, q, mp, qt_cap=128, n_ids_cap=16):
    table = jnp.asarray(ht.table)
    counts = jnp.asarray(ht.counts)
    hpi = np.zeros(n_ids_cap, np.int32)
    hpi[: len(ht.hashesperid)] = ht.hashesperid
    mcfg = voting.MatchConfig.from_params(mp, qt_cap=qt_cap,
                                          n_ids_cap=n_ids_cap)
    Q = 128
    qt = np.zeros((1, Q), np.int32)
    qh = np.zeros((1, Q), np.int32)
    qv = np.zeros((1, Q), bool)
    qt[0, : len(q)] = q[:, 0]
    qh[0, : len(q)] = q[:, 1]
    qv[0, : len(q)] = True
    out = voting.match_batch(table, counts, jnp.asarray(hpi),
                             jnp.asarray(qt), jnp.asarray(qh),
                             jnp.asarray(qv), TCFG, mcfg)
    n = int(out["n_results"][0])
    return np.stack([np.asarray(out[k])[0] for k in
                     ("ids", "filtcount", "mode_dt", "rawcount",
                      "min_t", "max_t")], axis=1)[:n].astype(np.int64)


def test_one_track_two_offsets_two_rows():
    """A query matching the same track at two offsets yields two rows under
    --exact-count -x 2 (the reference's find_modes behavior)."""
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(5)
    hashes = rng.choice(1 << 12, size=40, replace=False)
    # track: hashes at times 100.. and (a different subset) at 500..
    track = np.concatenate([
        np.stack([100 + np.arange(20), hashes[:20]], axis=1),
        np.stack([500 + np.arange(20), hashes[20:]], axis=1)])
    ht.store_vectorized("song.wav", track.astype(np.int64))
    # query at times 0..19 hits offset +100 with the first subset and
    # offset +500 with the second (e.g. a medley repeating the hook)
    q = np.concatenate([
        np.stack([np.arange(20), hashes[:20]], axis=1),
        np.stack([np.arange(20), hashes[20:]], axis=1)]).astype(np.int32)
    mp = P.MatcherParams(max_returns=2, exact_count=True, threshcount=5,
                         search_depth=8, find_time_range=True)
    want = om.match_hashes(ht, q, mp)
    assert want.shape[0] == 2, want
    assert set(want[:, 0]) == {0}
    assert sorted(want[:, 2].tolist()) == [100, 500]
    assert (want[:, 1] == 20).all()           # exact count per mode
    got = _device_match(ht, q, mp)
    np.testing.assert_array_equal(got, want)
    # top-1 contract unchanged: -x 1 returns the single best mode row
    mp1 = mp.__class__(**{**mp.__dict__, "max_returns": 1})
    want1 = om.match_hashes(ht, q, mp1)
    got1 = _device_match(ht, q, mp1)
    np.testing.assert_array_equal(got1, want1)
    assert want1.shape[0] == 1


def test_exact_count_ranks_modes_by_unique_count():
    """A mode with a lower raw histogram peak but more unique aligned rows
    must outrank a taller-but-narrow mode (the adversarial case that broke
    raw-count mode selection)."""
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(6)
    hs = rng.choice(1 << 12, size=30, replace=False)
    # mode A at dt=200: 4 hits all at exactly dt=200 (raw peak 4, unique 4)
    # mode B at dt=600: 8 hits spread over dt in {598..602} (raw peak <= 3,
    # window-unique 8)
    track = np.concatenate([
        np.stack([200 + np.arange(4), hs[:4]], axis=1),
        np.stack([600 + np.array([-2, -1, -1, 0, 0, 1, 2, 2])
                  + np.arange(8), hs[4:12]], axis=1)])
    ht.store_vectorized("t.wav", track.astype(np.int64))
    q = np.stack([np.arange(12), hs[:12]], axis=1).astype(np.int32)
    mp = P.MatcherParams(max_returns=2, exact_count=True, threshcount=2,
                         search_depth=8)
    want = om.match_hashes(ht, q, mp)
    got = _device_match(ht, q, mp)
    np.testing.assert_array_equal(got, want)
    assert want[0, 1] >= want[1, 1]


def test_weighted_tie_breaks_to_higher_id():
    """Two tracks with identical raw counts and hashesperid: upstream's
    np.argsort(wcounts)[::-1] puts the higher id first; rows with equal
    filtered counts must follow that order in oracle and device."""
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(7)
    hs = rng.choice(1 << 12, size=10, replace=False)
    pairs = np.stack([50 + np.arange(10), hs], axis=1).astype(np.int64)
    ht.store_vectorized("low.wav", pairs)    # id 0
    ht.store_vectorized("high.wav", pairs)   # id 1, identical content
    q = np.stack([np.arange(10), hs], axis=1).astype(np.int32)
    for exact in (False, True):
        mp = P.MatcherParams(max_returns=2, exact_count=exact,
                             threshcount=2, search_depth=8)
        want = om.match_hashes(ht, q, mp)
        got = _device_match(ht, q, mp)
        np.testing.assert_array_equal(got, want)
        assert want[0, 0] == 1 and want[1, 0] == 0, want


def test_no_qualifying_mode_returns_empty():
    """exact-count with threshcount above every raw histogram peak: the
    reference's find_modes finds nothing, so no rows (even though the
    window-summed count would pass)."""
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(8)
    hs = rng.choice(1 << 12, size=6, replace=False)
    # 6 hits spread over dt 300..305: raw peak 1, window(2)-sum up to 5
    track = np.stack([300 + np.arange(6) + np.arange(6), hs], axis=1)
    ht.store_vectorized("t.wav", track.astype(np.int64))
    q = np.stack([np.arange(6), hs], axis=1).astype(np.int32)
    mp = P.MatcherParams(max_returns=2, exact_count=True, threshcount=3,
                         search_depth=8)
    want = om.match_hashes(ht, q, mp)
    got = _device_match(ht, q, mp)
    assert want.shape[0] == 0 and got.shape[0] == 0


def test_long_query_parity_beyond_old_cap():
    """Queries longer than the old 8192-frame cap (~190 s) must match
    oracle-identically with no tail truncation (VERDICT r1 #3; reference
    get_hits/match_hashes handle any query length)."""
    from audfprint_tpu.match.matcher import Matcher
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(9)
    hs = rng.choice(1 << 12, size=60, replace=False)
    # track hashes at times 0..59 (mod-1024 wrapped domain)
    track = np.stack([np.arange(60) % TCFG.maxtime, hs], axis=1)
    ht.store_vectorized("t.wav", track.astype(np.int64))
    # a ~12800-frame query (~297 s) whose TAIL (frames 12700+) carries the
    # matching hashes: the old cap dropped exactly these
    qt = 12700 + np.arange(60)
    q = np.stack([qt, hs], axis=1).astype(np.int32)
    # plus unrelated early hashes so the query spans the full length
    early = np.stack([np.arange(50),
                      rng.choice(1 << 12, size=50, replace=False)], axis=1)
    q = np.concatenate([early, q]).astype(np.int32)
    for exact in (False, True):
        mp = P.MatcherParams(max_returns=2, exact_count=exact,
                             threshcount=5, search_depth=8,
                             find_time_range=True)
        want = om.match_hashes(ht, q, mp)
        assert want.shape[0] >= 1, "oracle must find the tail match"
        m = Matcher(window=mp.window, threshcount=mp.threshcount,
                    max_returns=mp.max_returns, search_depth=mp.search_depth,
                    exact_count=exact, find_time_range=True)
        got = m.match_hashes(ht, q)
        np.testing.assert_array_equal(got, want)


def test_memory_budget_splits_batch_identically(capsys):
    """A tiny mem budget must split the batch transparently: same rows as
    one big call (VERDICT r1 #10: fail-safe voting-memory envelope)."""
    from audfprint_tpu.match.matcher import Matcher
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(10)
    queries = []
    for i in range(6):
        hs = rng.choice(1 << 12, size=20, replace=False)
        ht.store_vectorized(f"t{i}.wav", np.stack(
            [100 * i + np.arange(20), hs], axis=1).astype(np.int64))
        queries.append(np.stack([np.arange(20), hs], axis=1).astype(np.int32))
    m = Matcher(threshcount=5, search_depth=8)
    want = m.match_hashes_batch(ht, queries)
    m2 = Matcher(threshcount=5, search_depth=8)
    m2.mem_budget_bytes = 1   # force the sorted core + sub-batch size 1
    got = m2.match_hashes_batch(ht, queries)
    out = capsys.readouterr().out
    assert "sorted voting core" in out
    assert "splitting 6 queries into sub-batches of 1" in out
    assert len(got) == len(want) == 6
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
        assert w.shape[0] == 1


def test_search_depth_beyond_hit_capacity():
    """search_depth > H = Q*depth (shallow table, deep search) must not
    crash the hit-domain selection (round-2 review finding): extra slots
    are necessarily invalid and results equal the oracle."""
    tc = DT.TableConfig(hashbits=10, depth=2, maxtimebits=8, seed=0)
    ht = HashTable(hashbits=10, depth=2, maxtime=256, seed=0)
    rng = np.random.default_rng(13)
    hs = rng.choice(1 << 10, size=12, replace=False)
    ht.store_vectorized("t.wav", np.stack(
        [40 + np.arange(12), hs], axis=1).astype(np.int64))
    q = np.stack([np.arange(12), hs], axis=1).astype(np.int32)
    mp = P.MatcherParams(max_returns=2, threshcount=5, search_depth=100)
    want = om.match_hashes(ht, q, mp)
    assert want.shape[0] == 1
    Q = 16                       # H = Q*depth = 32 < search_depth = 100
    mcfg = voting.MatchConfig.from_params(mp, qt_cap=64, n_ids_cap=16)
    qt = np.zeros((1, Q), np.int32)
    qh = np.zeros((1, Q), np.int32)
    qv = np.zeros((1, Q), bool)
    qt[0, :len(q)], qh[0, :len(q)], qv[0, :len(q)] = q[:, 0], q[:, 1], True
    hpi = np.zeros(16, np.int32)
    hpi[:1] = ht.hashesperid
    for fn in (voting.match_batch_hist, voting.match_batch_sorted):
        out = fn(jnp.asarray(ht.table), jnp.asarray(ht.counts),
                 jnp.asarray(hpi), jnp.asarray(qt), jnp.asarray(qh),
                 jnp.asarray(qv), tc, mcfg)
        n = int(out["n_results"][0])
        got = np.stack([np.asarray(out[k])[0] for k in
                        ("ids", "filtcount", "mode_dt", "rawcount",
                         "min_t", "max_t")], axis=1)[:n].astype(np.int64)
        np.testing.assert_array_equal(got, want)


def test_memory_budget_splits_over_rle_core(capsys):
    """When the batch exceeds the memory budget, the matcher SPLITS into
    sub-batches over the default compacted-RLE core (round-4 policy: the
    RLE core is both the fast and the memory-light single-device core —
    its O(B*H) buffers are maxtime-independent, so splitting is always
    the right response; the hist core remains the shard_map path)."""
    from audfprint_tpu.match.matcher import Matcher
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(12)
    queries = []
    for i in range(4):
        hs = rng.choice(1 << 12, size=20, replace=False)
        ht.store_vectorized(f"t{i}.wav", np.stack(
            [50 * i + np.arange(20), hs], axis=1).astype(np.int64))
        queries.append(np.stack([np.arange(20), hs], axis=1).astype(np.int32))
    m = Matcher(threshcount=5, search_depth=8)
    want = m.match_hashes_batch(ht, queries)
    m2 = Matcher(threshcount=5, search_depth=8)
    # budget sized for ~2 rows of RLE buffers: per_row fits, 4 rows don't
    # (Q=128 — the matcher's padding floor — matching the dispatch's own
    # sizing)
    m2.mem_budget_bytes = 2 * m2._sorted_bytes_per_row(TCFG, 128)
    got = m2.match_hashes_batch(ht, queries)
    out = capsys.readouterr().out
    assert "sorted voting core" in out and "sub-batches of 2" in out
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_sort_by_time_keeps_earliest_modes():
    """--exact-count -T -x N truncates to the EARLIEST modes: a track whose
    early modes have the LOWEST unique counts must still return them first
    (round-2 review finding: count-desc mode selection inside modes_cap
    dropped them, returning the later high-count modes instead)."""
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    rng = np.random.default_rng(11)
    hs = rng.choice(1 << 12, size=60, replace=False)
    # 6 modes at dts 100, 250, 400, 550, 700, 850 with STRICTLY INCREASING
    # counts 5..10 (earliest = weakest), well past modes_cap=4
    parts, qparts, off = [], [], 0
    for k, dt in enumerate((100, 250, 400, 550, 700, 850)):
        cnt = 5 + k
        sub = hs[off: off + cnt]
        qt = np.arange(cnt)
        parts.append(np.stack([dt + qt, sub], axis=1))
        qparts.append(np.stack([qt, sub], axis=1))
        off += cnt
    ht.store_vectorized("t.wav", np.concatenate(parts).astype(np.int64))
    q = np.unique(np.concatenate(qparts), axis=0).astype(np.int32)
    for sbt in (False, True):
        mp = P.MatcherParams(max_returns=3, exact_count=True, threshcount=5,
                             search_depth=8, sort_by_time=sbt)
        want = om.match_hashes(ht, q, mp)
        got = _device_match(ht, q, mp)
        np.testing.assert_array_equal(got, want)
        modes = want[:, 2].tolist()
        assert modes == ([100, 250, 400] if sbt else [850, 700, 550]), modes


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_sorted_core_equals_hist_core(seed):
    """voting.match_batch (sort/searchsorted core) must be bit-identical to
    the histogram core (the shard_map path) on random duplicate-heavy data,
    across all option combinations."""
    rng = np.random.default_rng(100 + seed)
    ht = HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                   maxtime=TCFG.maxtime, seed=TCFG.seed)
    for i in range(5):
        pairs = np.stack([rng.integers(0, 200, 80),
                          rng.integers(0, 64, 80)], axis=1)
        ht.store_vectorized(f"t{i}", pairs.astype(np.int64))
    table = jnp.asarray(ht.table)
    counts = jnp.asarray(ht.counts)
    hpi = np.zeros(16, np.int32)
    hpi[:5] = ht.hashesperid
    Q = 128
    q = np.unique(np.stack([rng.integers(0, 150, 90),
                            rng.integers(0, 64, 90)], axis=1), axis=0)
    qt = np.zeros((2, Q), np.int32)
    qh = np.zeros((2, Q), np.int32)
    qv = np.zeros((2, Q), bool)
    qt[0, :len(q)], qh[0, :len(q)], qv[0, :len(q)] = q[:, 0], q[:, 1], True
    qt[1, :40], qh[1, :40], qv[1, :40] = q[:40, 0] + 5, q[:40, 1], True
    for exact in (False, True):
        for timerange in (False, True):
            for sbt in (False, True):
                # window sweep: 1 and 3 hit the run-hop walk with different
                # hop bounds; 9 > _MAX_WALK_WIN forces the searchsorted
                # fallback — all must stay bit-identical to the hist core
                for W in (1, 2, 3, 9) if (timerange, sbt) == (
                        False, False) else (2,):
                    mcfg = voting.MatchConfig(
                        window=W,
                        search_depth=8, max_returns=4, threshcount=1,
                        exact_count=exact, find_time_range=timerange,
                        sort_by_time=sbt, qt_cap=256, n_ids_cap=16)
                    a = voting.match_batch_sorted(
                        table, counts, jnp.asarray(hpi), jnp.asarray(qt),
                        jnp.asarray(qh), jnp.asarray(qv), TCFG, mcfg)
                    b = voting.match_batch_hist(
                        table, counts, jnp.asarray(hpi), jnp.asarray(qt),
                        jnp.asarray(qh), jnp.asarray(qv), TCFG, mcfg)
                    for k in a:
                        np.testing.assert_array_equal(
                            np.asarray(a[k]), np.asarray(b[k]),
                            err_msg=f"{k} exact={exact} tr={timerange} "
                                    f"sbt={sbt} W={W} seed={seed}")


@pytest.mark.parametrize("idbits", [0, 20])
def test_hpi_plane_path_bit_identical(idbits):
    """The per-entry hashesperid plane (DT.build_hpi_plane — the round-4
    replacement for the per-hit hpi word-gather) must leave the sorted
    core bit-identical, for packed AND wide entry layouts, across the
    option matrix.  Tracks get DISTINCT hash counts so a wrong per-hit
    hpi would reorder candidates."""
    tcfg = DT.TableConfig(hashbits=12, depth=8, maxtimebits=10, seed=0,
                          idbits=idbits)
    ht = HashTable(hashbits=tcfg.hashbits, depth=tcfg.depth,
                   maxtime=tcfg.maxtime, seed=tcfg.seed, idbits=idbits)
    rng = np.random.default_rng(77)
    for i in range(6):
        n = 40 + 15 * i                      # distinct hpi per track
        pairs = np.stack([rng.integers(0, 200, n),
                          rng.integers(0, 64, n)], axis=1)
        ht.store_vectorized(f"t{i}", pairs.astype(np.int64))
    table = jnp.asarray(DT.split_wide(ht.table) if tcfg.wide else ht.table)
    counts = jnp.asarray(ht.counts)
    hpi = np.zeros(16, np.int32)
    hpi[:6] = ht.hashesperid
    plane = DT.build_hpi_plane(table, jnp.asarray(hpi), tcfg)
    assert plane.shape == (tcfg.n_buckets, tcfg.depth)
    Q = 128
    q = np.unique(np.stack([rng.integers(0, 150, 90),
                            rng.integers(0, 64, 90)], axis=1), axis=0)
    qt = np.zeros((2, Q), np.int32)
    qh = np.zeros((2, Q), np.int32)
    qv = np.zeros((2, Q), bool)
    qt[0, :len(q)], qh[0, :len(q)], qv[0, :len(q)] = q[:, 0], q[:, 1], True
    qt[1, :40], qh[1, :40], qv[1, :40] = q[:40, 0] + 5, q[:40, 1], True
    for exact in (False, True):
        for timerange in (False, True):
            mcfg = voting.MatchConfig(
                window=2, search_depth=8, max_returns=4, threshcount=1,
                exact_count=exact, find_time_range=timerange,
                qt_cap=256, n_ids_cap=16)
            a = voting.match_batch_sorted(
                table, counts, jnp.asarray(hpi), jnp.asarray(qt),
                jnp.asarray(qh), jnp.asarray(qv), tcfg, mcfg)
            b = voting.match_batch_sorted(
                table, counts, jnp.asarray(hpi), jnp.asarray(qt),
                jnp.asarray(qh), jnp.asarray(qv), tcfg, mcfg,
                hpi_plane=plane)
            for k in a:
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]),
                    err_msg=f"{k} exact={exact} tr={timerange} "
                            f"idbits={idbits}")
