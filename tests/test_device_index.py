"""Device table + device matcher vs host table + oracle matcher (exact)."""

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


def _pad_stream(pairs, L):
    t = np.zeros(L, np.int32)
    h = np.zeros(L, np.int32)
    v = np.zeros(L, bool)
    n = len(pairs)
    t[:n] = pairs[:, 0]
    h[:n] = pairs[:, 1]
    v[:n] = True
    return t, h, v


def _host_table():
    return HashTable(hashbits=TCFG.hashbits, depth=TCFG.depth,
                     maxtime=TCFG.maxtime, seed=TCFG.seed)


def _rand_pairs(rng, n, tmax=1000, hbits=12):
    return np.stack([rng.integers(0, tmax, n),
                     rng.integers(0, 1 << hbits, n)], axis=1).astype(np.int32)


def test_store_batch_matches_sequential(rng):
    ht = _host_table()
    streams = [_rand_pairs(rng, rng.integers(50, 300)) for _ in range(5)]
    for i, s in enumerate(streams):
        ht.store(f"t{i}", s)

    table, counts = DT.empty_table(TCFG)
    L = max(len(s) for s in streams)
    tt = np.stack([_pad_stream(s, L)[0] for s in streams])
    hh = np.stack([_pad_stream(s, L)[1] for s in streams])
    vv = np.stack([_pad_stream(s, L)[2] for s in streams])
    table, counts = DT.store_batch(
        table, counts, jnp.asarray(tt), jnp.asarray(hh), jnp.asarray(vv),
        jnp.arange(5, dtype=jnp.int32), TCFG)
    assert np.array_equal(np.asarray(table), ht.table)
    assert np.array_equal(np.asarray(counts), ht.counts)


def test_store_batch_overflow_matches(rng):
    # hammer a few buckets far past depth to exercise the reservoir
    ht = _host_table()
    n = 500
    pairs = np.stack([rng.integers(0, 1000, n),
                      rng.integers(0, 4, n)], axis=1).astype(np.int32)
    ht.store("x", pairs)
    table, counts = DT.empty_table(TCFG)
    t, h, v = _pad_stream(pairs, n)
    table, counts = DT.store_batch(
        table, counts, jnp.asarray(t)[None], jnp.asarray(h)[None],
        jnp.asarray(v)[None], jnp.zeros(1, jnp.int32), TCFG)
    assert np.array_equal(np.asarray(table), ht.table)
    assert np.array_equal(np.asarray(counts), ht.counts)


def test_store_batch_incremental(rng):
    """Two store_batch calls == one sequential host ingest of both batches."""
    ht = _host_table()
    s1 = _rand_pairs(rng, 200)
    s2 = _rand_pairs(rng, 150)
    ht.store("a", s1)
    ht.store("b", s2)
    table, counts = DT.empty_table(TCFG)
    for i, s in enumerate([s1, s2]):
        t, h, v = _pad_stream(s, len(s))
        table, counts = DT.store_batch(
            table, counts, jnp.asarray(t)[None], jnp.asarray(h)[None],
            jnp.asarray(v)[None], jnp.full(1, i, jnp.int32), TCFG)
    assert np.array_equal(np.asarray(table), ht.table)
    assert np.array_equal(np.asarray(counts), ht.counts)


def test_get_hits_matches_host(rng):
    ht = _host_table()
    for i in range(3):
        ht.store(f"t{i}", _rand_pairs(rng, 200))
    table, counts, tcfg = DT.table_to_device(ht)
    q = _rand_pairs(rng, 40)
    want = ht.get_hits(q)
    t, h, v = _pad_stream(q, 64)
    ids, dts, hv = DT.get_hits(table, counts, jnp.asarray(t)[None],
                               jnp.asarray(h)[None], jnp.asarray(v)[None], tcfg)
    ids, dts, hv = map(np.asarray, (ids, dts, hv))
    got_rows = []
    for qi in range(64):
        for s in range(tcfg.depth):
            if hv[0, qi, s]:
                got_rows.append((ids[0, qi, s], dts[0, qi, s],
                                 h[qi], t[qi]))
    assert np.array_equal(np.array(got_rows, np.int32).reshape(-1, 4), want)


def _make_db_and_queries(rng, n_tracks=8, track_hashes=400):
    ht = _host_table()
    streams = []
    for i in range(n_tracks):
        s = _rand_pairs(rng, track_hashes, tmax=TCFG.maxtime - 1)
        s = np.unique(s, axis=0)
        streams.append(s)
        ht.store(f"t{i}", s)
    queries = []
    for i in range(n_tracks):
        s = streams[i]
        t0 = rng.integers(0, 400)
        sel = s[(s[:, 0] >= t0) & (s[:, 0] < t0 + 120)].copy()
        sel[:, 0] -= t0
        # add some noise hashes
        noise = _rand_pairs(rng, 20, tmax=100)
        q = np.unique(np.concatenate([sel, noise]), axis=0)
        queries.append(q)
    return ht, queries


def _run_device_match(ht, queries, mp, qt_cap=128):
    table, counts, tcfg = DT.table_to_device(ht)
    mcfg = voting.MatchConfig.from_params(mp, qt_cap=qt_cap, n_ids_cap=32)
    mcfg = mcfg._replace(search_depth=16)
    Q = max(len(q) for q in queries)
    B = len(queries)
    tt = np.zeros((B, Q), np.int32)
    hh = np.zeros((B, Q), np.int32)
    vv = np.zeros((B, Q), bool)
    for b, q in enumerate(queries):
        tt[b, :len(q)] = q[:, 0]
        hh[b, :len(q)] = q[:, 1]
        vv[b, :len(q)] = True
    hpi = np.zeros(32, np.int32)
    hpi[:len(ht.hashesperid)] = ht.hashesperid
    out = voting.match_batch(table, counts, jnp.asarray(hpi),
                             jnp.asarray(tt), jnp.asarray(hh),
                             jnp.asarray(vv), tcfg, mcfg)
    return {k: np.asarray(v) for k, v in out.items()}


@pytest.mark.parametrize("exact,timerange,sortbytime", [
    (False, False, False),
    (True, False, False),
    (False, True, False),
    (True, True, True),
])
def test_match_batch_matches_oracle(rng, exact, timerange, sortbytime):
    ht, queries = _make_db_and_queries(rng)
    mp = P.MatcherParams(exact_count=exact, find_time_range=timerange,
                         sort_by_time=sortbytime, search_depth=16,
                         max_returns=3)
    out = _run_device_match(ht, queries, mp)
    for b, q in enumerate(queries):
        want = om.match_hashes(ht, q, mp)
        n = int(out["n_results"][b])
        assert n == len(want), (b, n, len(want))
        got = np.stack([out["ids"][b], out["filtcount"][b],
                        out["mode_dt"][b], out["rawcount"][b],
                        out["min_t"][b], out["max_t"][b]], axis=1)[:n]
        assert np.array_equal(got, want), (b, got, want)


def test_match_batch_no_hits(rng):
    ht, _ = _make_db_and_queries(rng)
    mp = P.MatcherParams(search_depth=16)
    # query hashes that exist nowhere get zero results
    q = np.stack([np.arange(10), np.full(10, (1 << TCFG.hashbits) - 1)],
                 axis=1).astype(np.int32)
    ht.counts[(1 << TCFG.hashbits) - 1] = 0  # ensure bucket empty
    out = _run_device_match(ht, [q], mp)
    assert out["n_results"][0] == 0


def test_high_track_ids_decode_correctly():
    """Track ids with the entry's top bit set (id >= 2^(31-maxtimebits))
    must decode correctly: the packing supports 2^(32-maxtimebits) ids as
    in the reference, and an int32 cast before the shift silently halved
    that (round-2 review finding).  Pinned against the host table."""
    tc = DT.TableConfig(hashbits=10, depth=4, maxtimebits=10, seed=0)
    ht = HashTable(hashbits=10, depth=4, maxtime=1024, seed=0)
    rng = np.random.default_rng(40)
    # ids straddling the sign boundary 2^21 (entry = id << 10)
    big_ids = [(1 << 21) - 1, (1 << 21), (1 << 21) + 7, (1 << 22) - 1]
    table, counts = DT.empty_table(tc)
    L = 16
    for k, id_ in enumerate(big_ids):
        pairs = np.stack([np.arange(L) + 3 * k,
                          rng.choice(1 << 10, L, replace=False)],
                         axis=1).astype(np.int64)
        # host mirror uses the same id via direct packing
        ht.names.extend([None] * (id_ - len(ht.names)) + [f"t{id_}"])
        entries = ((np.uint32(id_) << np.uint32(10))
                   | pairs[:, 0].astype(np.uint32))
        t, h, v = _pad_stream(pairs, L)
        table, counts = DT.store_batch(
            table, counts, jnp.asarray(t[None]), jnp.asarray(h[None]),
            jnp.asarray(v[None]), jnp.asarray([id_], np.int32), tc)
        for hh, ee in zip(pairs[:, 1], entries):
            c = int(ht.counts[hh])
            if c < 4:
                ht.table[hh, c] = ee
            ht.counts[hh] = c + 1
    np.testing.assert_array_equal(np.asarray(table), ht.table)
    # gather decodes the full id range (logical, not arithmetic, shift)
    qh = np.zeros((1, 16), np.int32)
    qt = np.zeros((1, 16), np.int32)
    qv = np.zeros((1, 16), bool)
    hits_h = []
    seen = ht.table[ht.counts > 0]
    qs = np.nonzero(ht.counts > 0)[0][:16]
    qh[0, : len(qs)] = qs
    qv[0, : len(qs)] = True
    ids, dts, hv = DT.get_hits(table, counts, jnp.asarray(qt),
                               jnp.asarray(qh), jnp.asarray(qv), tc)
    ids = np.asarray(ids)
    hv = np.asarray(hv)
    got_ids = set(ids[0][hv[0]].tolist())
    assert got_ids <= set(big_ids), got_ids
    assert max(got_ids) >= (1 << 21), got_ids   # top-bit ids present
    assert min(got_ids) >= 0                    # and never negative
