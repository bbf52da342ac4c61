"""Wide-entry tables (VERDICT r2 #6): idbits + maxtimebits > 32 switches
to uint64 host entries / split (lo, hi) uint32 device planes, raising the
reference's 2^18-track / mod-16384 packing cap (SURVEY §2.3.4: "honor or
consciously raise").  Packed-mode (idbits=0) behavior is pinned byte-stable
by the rest of the suite."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audfprint_tpu.index import device_table as DT  # noqa: E402
from audfprint_tpu.index.hash_table import HashTable  # noqa: E402
from audfprint_tpu.match import voting  # noqa: E402
from audfprint_tpu.match.matcher import Matcher  # noqa: E402
from audfprint_tpu.parallel import sharded  # noqa: E402

# idbits 20 + maxtimebits 14 = 34 bits -> wide; ids past the packed cap
WIDE_KW = dict(hashbits=12, depth=8, maxtime=16384, idbits=20)
BIG_IDS = [0, 1, (1 << 18) - 1, 1 << 18, (1 << 19) + 7, (1 << 20) - 1]


def _wide_ht():
    ht = HashTable(**WIDE_KW)
    # place names sparsely so stored ids hit the interesting values
    n = max(BIG_IDS) + 1
    ht.names = [None] * n
    ht.hashesperid = np.zeros(n, np.int64)
    for i in BIG_IDS:
        ht.names[i] = f"t{i}"
    ht._invalidate_index()
    return ht


def test_wide_host_store_get_roundtrip(rng):
    ht = _wide_ht()
    assert ht.wide and ht.table.dtype == np.uint64
    pairs = {}
    for i in BIG_IDS:
        p = np.stack([rng.integers(0, ht.maxtime, 40),
                      rng.integers(0, 1 << ht.hashbits, 40)], axis=1)
        ht.store_vectorized(f"t{i}", p)
        pairs[i] = p
    for i in BIG_IDS:
        p = pairs[i]
        hits = ht.get_hits(np.stack([np.zeros(40, np.int64),
                                     p[:, 1]], axis=1))
        got_ids = set(hits[:, 0].tolist())
        assert i in got_ids, f"id {i} lost in wide decode"
    # dt decode: store one known pair, query with a time offset
    ht2 = _wide_ht()
    ht2.store_vectorized(f"t{1 << 18}", [(100, 5)])
    hits = ht2.get_hits([(40, 5)])
    assert hits.tolist() == [[1 << 18, 60, 5, 40]]


def test_wide_device_store_matches_host(rng):
    cfg = DT.TableConfig(hashbits=12, depth=8, maxtimebits=14, idbits=20)
    assert cfg.wide
    B, L = len(BIG_IDS), 60
    t = rng.integers(0, cfg.maxtime, (B, L)).astype(np.int32)
    h = rng.integers(0, 1 << cfg.hashbits, (B, L)).astype(np.int32)
    v = rng.random((B, L)) < 0.9
    ids = np.asarray(BIG_IDS, np.int32)

    table, counts = DT.empty_table(cfg)
    assert table.shape == (1 << 12, 8, 2)
    table, counts = DT.store_batch(table, counts, *map(jnp.asarray,
                                                       (t, h, v, ids)), cfg)
    # host reference: sequential store of the same streams
    ht = _wide_ht()
    for b, i in enumerate(BIG_IDS):
        p = np.stack([t[b][v[b]], h[b][v[b]]], axis=1)
        ht.store_vectorized(f"t{i}", p)
    np.testing.assert_array_equal(DT.join_wide(table), ht.table)
    np.testing.assert_array_equal(np.asarray(counts), ht.counts)

    # gather parity: device get_hits decode == host get_hits
    qt = t[3, :32].copy()
    qh = h[3, :32].copy()
    ids3, dts3, hv3 = DT.get_hits(
        table, counts, jnp.asarray(qt[None]), jnp.asarray(qh[None]),
        jnp.asarray(np.ones((1, 32), bool)), cfg)
    host_hits = ht.get_hits(np.stack([qt, qh], axis=1))
    dev_rows = []
    for q in range(32):
        for s in range(cfg.depth):
            if np.asarray(hv3)[0, q, s]:
                dev_rows.append([int(np.asarray(ids3)[0, q, s]),
                                 int(np.asarray(dts3)[0, q, s]),
                                 int(qh[q]), int(qt[q])])
    np.testing.assert_array_equal(np.asarray(dev_rows), host_hits)


def test_wide_matcher_end_to_end(rng):
    """Full product path on a wide table: tracks stored past the packed
    id cap must match back at rank 0 through the Matcher."""
    ht = _wide_ht()
    streams = {}
    for i in BIG_IDS:
        p = np.stack([np.sort(rng.integers(0, ht.maxtime, 120)),
                      rng.integers(0, 1 << ht.hashbits, 120)], axis=1)
        ht.store_vectorized(f"t{i}", p)
        streams[i] = p
    m = Matcher(verbose=0, search_depth=8, max_returns=1)
    for i in (1 << 18, (1 << 20) - 1):
        q = streams[i][:60].copy()
        q[:, 0] = q[:, 0] - q[0, 0]
        rows = m.match_hashes(ht, q)
        assert len(rows) and rows[0][0] == i, f"wide id {i} not matched"


def test_wide_sharded_matches_single(rng):
    cfg = DT.TableConfig(hashbits=12, depth=8, maxtimebits=14, idbits=20)
    assert jax.device_count() >= 8
    mesh = sharded.make_mesh(8)
    B, L = len(BIG_IDS), 80
    t = rng.integers(0, cfg.maxtime, (B, L)).astype(np.int32)
    h = rng.integers(0, 1 << cfg.hashbits, (B, L)).astype(np.int32)
    v = np.ones((B, L), bool)
    ids = np.asarray(BIG_IDS, np.int32)
    args = map(jnp.asarray, (t, h, v, ids))

    table1, counts1 = DT.empty_table(cfg)
    table1, counts1 = DT.store_batch(table1, counts1, *args, cfg)
    tableN, countsN = sharded.empty_sharded_table(mesh, cfg)
    store = sharded.sharded_store_fn(mesh, cfg)
    tableN, countsN = store(tableN, countsN, *map(jnp.asarray,
                                                  (t, h, v, ids)))
    np.testing.assert_array_equal(np.asarray(tableN), np.asarray(table1))

    N = 1 << 21
    mcfg = voting.MatchConfig(search_depth=8, max_returns=2, qt_cap=1024,
                              n_ids_cap=N, find_time_range=True)
    hpi = jnp.asarray(np.full(N, L, np.int32))
    tq = t[:2, :40].astype(np.int32)
    hq = h[:2, :40].astype(np.int32)
    vq = np.ones((2, 40), bool)
    want = voting.match_batch(table1, counts1, hpi, jnp.asarray(tq),
                              jnp.asarray(hq), jnp.asarray(vq), cfg, mcfg)
    match = sharded.sharded_match_fn(mesh, cfg, mcfg)
    got = match(tableN, countsN, hpi, jnp.asarray(tq), jnp.asarray(hq),
                jnp.asarray(vq))
    for k in want:
        assert np.array_equal(np.asarray(got[k]), np.asarray(want[k])), k
    # the top hit decodes to the true big id
    assert int(np.asarray(want["ids"])[0, 0]) == BIG_IDS[0]


def test_wide_persistence_roundtrip(tmp_path, rng):
    ht = _wide_ht()
    for i in BIG_IDS[:3]:
        p = np.stack([rng.integers(0, ht.maxtime, 30),
                      rng.integers(0, 1 << ht.hashbits, 30)], axis=1)
        ht.store_vectorized(f"t{i}", p)
    for ext in (".pklz", ".afdb"):
        path = str(tmp_path / f"wide{ext}")
        ht.save(path)
        ht2 = HashTable(path)
        assert ht2.wide and ht2.idbits == ht.idbits
        assert ht2.table.dtype == np.uint64
        np.testing.assert_array_equal(np.asarray(ht2.table), ht.table)
        np.testing.assert_array_equal(np.asarray(ht2.counts), ht.counts)
        assert list(ht2.names) == list(ht.names)


def test_wide_refuses_upstream_export(tmp_path):
    ht = HashTable(**WIDE_KW)
    with pytest.raises(ValueError, match="wide"):
        ht.save_upstream(str(tmp_path / "x.pklz"))


def test_packed_id_overflow_raises():
    """The packed mode now REFUSES silent id wraparound past its capacity
    (the reference corrupts entries silently there)."""
    ht = HashTable(hashbits=10, depth=4, maxtime=256)   # idbits_eff = 24
    ht.names = [None] * (1 << 24)
    ht.hashesperid = np.zeros(1 << 24, np.int64)
    ht._invalidate_index()
    with pytest.raises(ValueError, match="id capacity"):
        ht.store_vectorized("overflow", [(0, 1)])


def test_wide_merge_and_remove(rng):
    # sparse names up to id 2^18 only: the merged id must stay inside the
    # 20-bit capacity (the guard for going past it is tested above)
    a = HashTable(**WIDE_KW)
    a.names = [None] * ((1 << 18) + 1)
    a.names[1 << 18] = f"t{1 << 18}"
    a.hashesperid = np.zeros((1 << 18) + 1, np.int64)
    a._invalidate_index()
    b = HashTable(**WIDE_KW)
    pa = np.stack([rng.integers(0, a.maxtime, 50),
                   rng.integers(0, 1 << a.hashbits, 50)], axis=1)
    pb = np.stack([rng.integers(0, a.maxtime, 50),
                   rng.integers(0, 1 << a.hashbits, 50)], axis=1)
    a.store_vectorized(f"t{1 << 18}", pa)
    b.store_vectorized("other", pb)
    n_before = len(a.names)
    a.merge(b)
    assert a.names[n_before] == "other"
    hits = a.get_hits(np.stack([np.zeros(50, np.int64), pb[:, 1]], axis=1))
    assert n_before in set(hits[:, 0].tolist())
    a.remove(f"t{1 << 18}")
    hits = a.get_hits(np.stack([np.zeros(50, np.int64), pa[:, 1]], axis=1))
    assert (1 << 18) not in set(hits[:, 0].tolist())


def test_wide_device_merge_resharding(rng):
    """Merge-as-resharding with wide entries: replaying a wide host
    table's entry streams through the sharded device store must equal the
    host merge (the reference's only distribution story, on 64-bit
    entries)."""
    mesh = sharded.make_mesh(8)
    cfg = DT.TableConfig(hashbits=12, depth=8, maxtimebits=14, idbits=20)
    a = HashTable(**WIDE_KW)
    b = HashTable(**WIDE_KW)
    for i, (ht, nm) in enumerate([(a, "a"), (b, "b")]):
        p = np.stack([rng.integers(0, ht.maxtime, 300),
                      rng.integers(0, 1 << ht.hashbits, 300)], axis=1)
        ht.store_vectorized(nm, p)
    # host ground truth
    want = HashTable(**WIDE_KW)
    want.table = a.table.copy()
    want.counts = a.counts.copy()
    want.names = list(a.names)
    want.hashesperid = a.hashesperid.copy()
    want.merge(b)
    # device: upload a sharded, replay b's streams with the id offset
    tableN, countsN = sharded.shard_table(
        mesh, DT.split_wide(a.table), a.counts)
    merge = sharded.sharded_merge_fn(mesh, cfg)
    hs, es, vs = sharded.entry_streams(b, id_offset=len(a.names))
    assert es.ndim == 2 and es.shape[1] == 2      # wide (lo, hi) planes
    tableN, countsN = merge(tableN, countsN, jnp.asarray(hs),
                            jnp.asarray(es), jnp.asarray(vs))
    np.testing.assert_array_equal(DT.join_wide(tableN), want.table)
    np.testing.assert_array_equal(np.asarray(countsN), want.counts)
