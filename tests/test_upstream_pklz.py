"""Upstream `.pklz` interchange (VERDICT r1 missing #2 / ADVICE r1 medium).

The reference gzip-pickles its HashTable *class instance*
(hash_table.py:~250-330).  These tests fabricate byte-faithful upstream
pickles (a GLOBAL `hash_table.HashTable` + upstream's attribute layout,
written WITHOUT using our shim classes) and check that:

  * load() maps an upstream instance into our schema with identical query
    behavior,
  * save_upstream() emits a class-instance pickle that an upstream-style
    loader (plain pickle with a hash_table module on the path) reads back,
  * the two compose: our save_upstream -> our load round-trips.
"""

import gzip
import pickle
import sys
import types

import numpy as np
import pytest

from audfprint_tpu.index.hash_table import (
    HashTable, UPSTREAM_HT_VERSION, UPSTREAM_OLD_COMPAT)


def _fresh_upstream_class():
    """An upstream-shaped HashTable class registered as `hash_table.HashTable`,
    built independently of the production shim (so the test would catch the
    shim writing a wrong GLOBAL)."""
    mod = types.ModuleType("hash_table")

    class HashTable:
        pass

    HashTable.__module__ = "hash_table"
    HashTable.__qualname__ = "HashTable"
    mod.HashTable = HashTable
    return mod, HashTable


def _make_upstream_pklz(path, hashbits=16, depth=8, maxtimebits=10,
                        version=UPSTREAM_HT_VERSION):
    prev = sys.modules.get("hash_table")
    mod, cls = _fresh_upstream_class()
    sys.modules["hash_table"] = mod
    try:
        obj = cls()
        obj.ht_version = version
        obj.hashbits = hashbits
        obj.depth = depth
        obj.maxtimebits = maxtimebits
        rng = np.random.default_rng(7)
        obj.table = np.zeros((1 << hashbits, depth), np.uint32)
        obj.counts = np.zeros(1 << hashbits, np.int32)
        # two tracks with a handful of entries, upstream packing
        entries = []
        for id_ in (0, 1):
            for k in range(20):
                h = int(rng.integers(0, 1 << hashbits))
                t = int(rng.integers(0, 1 << maxtimebits))
                c = int(obj.counts[h])
                if c < depth:
                    obj.table[h, c] = (id_ << maxtimebits) | t
                obj.counts[h] = c + 1
                entries.append((id_, h, t))
        obj.names = ["trackA.mp3", "trackB.mp3"]
        obj.hashesperid = np.array([20, 20], np.uint32)
        obj.params = {"density": 20.0, "samplerate": 11025}
        obj.dirty = False
        with gzip.open(path, "wb") as f:
            pickle.dump(obj, f, protocol=2)
    finally:
        if prev is None:
            del sys.modules["hash_table"]
        else:
            sys.modules["hash_table"] = prev
    return entries


def test_load_upstream_instance(tmp_path, capsys):
    path = str(tmp_path / "upstream.pklz")
    entries = _make_upstream_pklz(path)
    # loading must not require any pickling-stub 'hash_table' module on the
    # path (a GENUINE `hash_table` may be present: the repo ships a root
    # drop-in shim under that name whose HashTable IS the real class;
    # any other leaked module — including a spec-built stub carrying a
    # __file__ — must fail this identity check)
    if "hash_table" in sys.modules:
        import audfprint_tpu.index.hash_table as _real
        assert sys.modules["hash_table"].HashTable is _real.HashTable
    ht = HashTable(path)
    assert ht.hashbits == 16 and ht.depth == 8
    assert ht.maxtime == 1 << 10 and ht.maxtimebits == 10
    assert ht.names == ["trackA.mp3", "trackB.mp3"]
    assert ht.hashesperid.tolist() == [20, 20]
    assert ht.params["density"] == 20.0
    assert ht.params["loaded_from_upstream_version"] == UPSTREAM_HT_VERSION
    # query behavior: every stored entry is retrievable with the right id/dt
    for id_, h, t in entries:
        hits = ht.get_hits(np.array([[0, h]], np.int32))
        if int(ht.counts[h]) <= ht.depth:    # not overflowed: must be there
            assert ((hits[:, 0] == id_) & (hits[:, 1] == t)).any()


def test_load_upstream_missing_maxtimebits_defaults_14(tmp_path):
    path = str(tmp_path / "old.pklz")
    prev = sys.modules.get("hash_table")
    mod, cls = _fresh_upstream_class()
    sys.modules["hash_table"] = mod
    try:
        obj = cls()
        obj.ht_version = UPSTREAM_OLD_COMPAT
        obj.hashbits = 12
        obj.depth = 4
        obj.table = np.zeros((1 << 12, 4), np.uint32)
        obj.counts = np.zeros(1 << 12, np.int32)
        obj.names = []
        obj.params = {}
        with gzip.open(path, "wb") as f:
            pickle.dump(obj, f, protocol=2)
    finally:
        if prev is None:
            del sys.modules["hash_table"]
        else:
            sys.modules["hash_table"] = prev
    ht = HashTable(path)
    assert ht.maxtimebits == 14 and ht.maxtime == 16384
    assert len(ht.hashesperid) == 0


def test_load_upstream_too_old_refused(tmp_path):
    path = str(tmp_path / "ancient.pklz")
    _make_upstream_pklz(path, version=UPSTREAM_OLD_COMPAT - 1)
    with pytest.raises(ValueError, match="predates"):
        HashTable(path)


def test_save_upstream_read_by_upstream_loader(tmp_path, capsys):
    ht = HashTable(hashbits=16, depth=8, maxtime=1024)
    rng = np.random.default_rng(3)
    pairs = np.stack([rng.integers(0, 1024, 30),
                      rng.integers(0, 1 << 16, 30)], axis=1)
    ht.store_vectorized("song.wav", pairs)
    path = str(tmp_path / "export.pklz")
    ht.save_upstream(path, params={"density": 20.0})

    # an "upstream" process: plain pickle.load with hash_table importable
    prev = sys.modules.get("hash_table")
    mod, cls = _fresh_upstream_class()
    sys.modules["hash_table"] = mod
    try:
        with gzip.open(path, "rb") as f:
            obj = pickle.load(f)
        assert type(obj) is cls
        assert obj.ht_version == UPSTREAM_HT_VERSION
        assert obj.hashbits == 16 and obj.depth == 8
        assert obj.maxtimebits == 10
        assert obj.names == ["song.wav"]
        assert obj.hashesperid.dtype == np.uint32
        assert not hasattr(obj, "maxtime") and not hasattr(obj, "seed")
        np.testing.assert_array_equal(obj.table, ht.table)
        np.testing.assert_array_equal(obj.counts, ht.counts)
    finally:
        if prev is None:
            del sys.modules["hash_table"]
        else:
            sys.modules["hash_table"] = prev


def test_save_upstream_load_roundtrip(tmp_path, capsys):
    ht = HashTable(hashbits=16, depth=8, maxtime=1024)
    rng = np.random.default_rng(4)
    pairs = np.stack([rng.integers(0, 1024, 50),
                      rng.integers(0, 1 << 16, 50)], axis=1)
    ht.store_vectorized("a.wav", pairs)
    path = str(tmp_path / "rt.pklz")
    ht.save_upstream(path)
    # the pickling shim must not leave a STUB module behind that would
    # shadow a later genuine `import hash_table` (round-2 review finding);
    # the genuine root drop-in shim (which has a __file__) may be present
    assert getattr(sys.modules.get("hash_table"), "__file__", None) \
        is not None or "hash_table" not in sys.modules
    ht2 = HashTable(path)
    np.testing.assert_array_equal(ht2.table, ht.table)
    np.testing.assert_array_equal(ht2.counts, ht.counts)
    assert ht2.names == ht.names
    assert ht2.maxtime == ht.maxtime
    q = np.stack([np.zeros(50, np.int64), pairs[:, 1]], axis=1)
    np.testing.assert_array_equal(ht2.get_hits(q), ht.get_hits(q))


def _merge_loop_reference(self, other):
    """The round-1 per-bucket Python merge loop, kept as the equivalence
    oracle for the vectorized HashTable.merge."""
    from audfprint_tpu.utils import prng
    idoffset = len(self.names)
    self.names.extend(other.names)
    self.hashesperid = np.concatenate([self.hashesperid, other.hashesperid])
    idoffsetval = np.uint32(idoffset << self.maxtimebits)
    for h in np.nonzero(other.counts)[0]:
        nstored = min(other.depth, int(other.counts[h]))
        count = int(self.counts[h])
        for e in other.table[h, :nstored]:
            e = np.uint32(e + idoffsetval)
            if count < self.depth:
                self.table[h, count] = e
            else:
                slot = int(prng.reservoir_slot(h, count, self.seed))
                if slot < self.depth:
                    self.table[h, slot] = e
            count += 1
        self.counts[h] = int(self.counts[h]) + int(other.counts[h])


def _random_table(seed, n_tracks, n_pairs, hashbits=10, depth=4,
                  maxtime=256):
    rng = np.random.default_rng(seed)
    ht = HashTable(hashbits=hashbits, depth=depth, maxtime=maxtime)
    for i in range(n_tracks):
        pairs = np.stack([rng.integers(0, maxtime, n_pairs),
                          rng.integers(0, 1 << hashbits, n_pairs)], axis=1)
        ht.store_vectorized(f"t{seed}_{i}.wav", pairs)
    return ht


@pytest.mark.parametrize("n_pairs", [50, 2000])   # 2000 forces overflow
def test_vectorized_merge_matches_loop(n_pairs):
    a1 = _random_table(1, 3, n_pairs)
    b = _random_table(2, 2, n_pairs)
    a2 = HashTable(hashbits=a1.hashbits, depth=a1.depth, maxtime=a1.maxtime)
    a2.table = a1.table.copy()
    a2.counts = a1.counts.copy()
    a2.names = list(a1.names)
    a2.hashesperid = a1.hashesperid.copy()
    a1.merge(b)
    _merge_loop_reference(a2, b)
    np.testing.assert_array_equal(a1.table, a2.table)
    np.testing.assert_array_equal(a1.counts, a2.counts)
    assert a1.names == a2.names
    np.testing.assert_array_equal(a1.hashesperid, a2.hashesperid)


def _remove_loop_reference(self, name):
    """The round-2 per-bucket Python remove loop, kept as the equivalence
    oracle for the vectorized HashTable.remove (VERDICT r2 #8)."""
    id_ = self.name_to_id(name)
    id_arr = (self.table >> self.maxtimebits).astype(np.int64)
    keep = id_arr != id_
    stored = np.minimum(self.counts, self.depth)[:, None]
    in_use = np.arange(self.depth)[None, :] < stored
    keep &= in_use
    for h in np.nonzero((~keep & in_use).any(axis=1))[0]:
        vals = self.table[h][keep[h]]
        self.table[h] = 0
        self.table[h, : len(vals)] = vals
        self.counts[h] = len(vals)
    self.names[id_] = None
    self.hashesperid[id_] = 0
    self._invalidate_index()


@pytest.mark.parametrize("n_pairs", [50, 2000])   # 2000 forces overflow
@pytest.mark.parametrize("victim", [0, 1, 2])
def test_vectorized_remove_matches_loop(n_pairs, victim):
    a1 = _random_table(3, 3, n_pairs)
    a2 = HashTable(hashbits=a1.hashbits, depth=a1.depth, maxtime=a1.maxtime)
    a2.table = a1.table.copy()
    a2.counts = a1.counts.copy()
    a2.names = list(a1.names)
    a2.hashesperid = a1.hashesperid.copy()
    name = a1.names[victim]
    a1.remove(name)
    _remove_loop_reference(a2, name)
    np.testing.assert_array_equal(a1.table, a2.table)
    np.testing.assert_array_equal(a1.counts, a2.counts)
    assert a1.names == a2.names
    np.testing.assert_array_equal(a1.hashesperid, a2.hashesperid)
