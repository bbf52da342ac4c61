"""The .afdb mmap-able snapshot format: round-trip, mutation-after-load
(copy-on-write memmap), magic-sniffed load, and the CLI surface."""

import numpy as np

from audfprint_tpu.index.hash_table import AFDB_MAGIC, HashTable


def _small_ht(n_tracks=5, n=60, seed=3):
    rng = np.random.default_rng(seed)
    ht = HashTable(hashbits=12, depth=6, maxtime=1024)
    streams = []
    for i in range(n_tracks):
        h = np.stack(
            [np.sort(rng.integers(0, 1024, n)).astype(np.int32),
             rng.integers(0, 1 << 12, n).astype(np.int32)], axis=1)
        ht.store_vectorized(f"t{i}", h)
        streams.append(h)
    ht.params.update({"density": 20.0, "samplerate": 11025})
    return ht, streams


def test_afdb_roundtrip(tmp_path):
    ht, _ = _small_ht()
    p = str(tmp_path / "db.afdb")
    ht.save(p)
    assert open(p, "rb").read(8) == AFDB_MAGIC
    back = HashTable(p)
    np.testing.assert_array_equal(np.asarray(back.table), ht.table)
    np.testing.assert_array_equal(np.asarray(back.counts), ht.counts)
    assert back.names == ht.names
    np.testing.assert_array_equal(back.hashesperid, ht.hashesperid)
    assert back.params["density"] == 20.0
    assert (back.hashbits, back.depth, back.maxtime) == (
        ht.hashbits, ht.depth, ht.maxtime)


def test_afdb_load_is_magic_sniffed(tmp_path):
    """An .afdb payload loads even under a .pklz filename (and vice versa
    the gzip pickle path still engages when the magic is absent)."""
    ht, _ = _small_ht()
    p = str(tmp_path / "actually_afdb.pklz")
    ht._save_afdb(p)
    back = HashTable(p)
    np.testing.assert_array_equal(np.asarray(back.table), ht.table)


def test_afdb_mutation_after_load(tmp_path):
    """The memmap is copy-on-write: store/merge/remove after load must
    work and must NOT alter the file on disk."""
    ht, streams = _small_ht()
    p = str(tmp_path / "db.afdb")
    ht.save(p)
    import hashlib
    digest0 = hashlib.sha256(open(p, "rb").read()).hexdigest()
    back = HashTable(p)
    rng = np.random.default_rng(7)
    extra = np.stack(
        [np.sort(rng.integers(0, 1024, 40)).astype(np.int32),
         rng.integers(0, 1 << 12, 40).astype(np.int32)], axis=1)
    back.store_vectorized("extra", extra)
    back.remove("t0")
    assert back.totalhashes() > 0
    assert hashlib.sha256(open(p, "rb").read()).hexdigest() == digest0
    # and a re-save of the mutated table round-trips
    p2 = str(tmp_path / "db2.afdb")
    back.save(p2)
    again = HashTable(p2)
    np.testing.assert_array_equal(np.asarray(again.table),
                                  np.asarray(back.table))


def test_afdb_matches_pklz_semantics(tmp_path):
    """get_hits through an .afdb-loaded table is identical to .pklz."""
    ht, streams = _small_ht()
    pa = str(tmp_path / "db.afdb")
    pz = str(tmp_path / "db.pklz")
    ht.save(pa)
    ht.save(pz)
    a, z = HashTable(pa), HashTable(pz)
    q = streams[2][:20]
    np.testing.assert_array_equal(a.get_hits(q), z.get_hits(q))


def test_afdb_cli(tmp_path):
    """new -> .afdb -> match through the CLI (small table geometry)."""
    from audfprint_tpu.cli import main
    from audfprint_tpu.utils.audio import audio_write_wav
    from tests.conftest import synth_audio

    SR = 11025
    rng = np.random.default_rng(99)
    wavs = []
    tracks = []
    for i in range(2):
        x = synth_audio(rng, dur_sec=6.0, n_tones=50)
        p = str(tmp_path / f"track{i}.wav")
        audio_write_wav(p, x, SR)
        wavs.append(p)
        tracks.append(x)
    q = tracks[1][2 * SR: 5 * SR] + 0.02 * rng.standard_normal(
        3 * SR).astype(np.float32)
    qp = str(tmp_path / "query.wav")
    audio_write_wav(qp, q * 0.7, SR)
    small = ["-h", "16", "-b", "20", "-t", "4096"]
    db = str(tmp_path / "db.afdb")
    out = str(tmp_path / "out.txt")
    main(["new", "-d", db, "-o", out, *small, *wavs])
    assert open(db, "rb").read(8) == AFDB_MAGIC
    main(["match", "-d", db, "-o", out, *small, qp])
    text = open(out).read()
    assert "Matched" in text and "track1" in text


def test_afdb_resave_over_backing_file(tmp_path):
    """load .afdb -> mutate -> save to the SAME path: the save must not
    truncate the file that still backs the live copy-on-write memmaps
    (round-2 review finding: open(name, 'wb') SIGBUSed or corrupted the
    table).  Atomic temp+rename keeps the mapped inode intact."""
    ht = HashTable(hashbits=10, depth=4, maxtime=256)
    rng = np.random.default_rng(50)
    p1 = np.stack([rng.integers(0, 256, 40),
                   rng.integers(0, 1 << 10, 40)], axis=1)
    ht.store_vectorized("a.wav", p1)
    path = str(tmp_path / "db.afdb")
    ht.save(path)

    ht2 = HashTable(path)                      # memmaps back onto `path`
    p2 = np.stack([rng.integers(0, 256, 40),
                   rng.integers(0, 1 << 10, 40)], axis=1)
    ht2.store_vectorized("b.wav", p2)          # dirties private pages
    ht2.save(path)                             # re-save over backing file
    # the still-open memmaps must remain readable (old inode alive)
    assert int(np.asarray(ht2.counts).sum()) == 80
    ht3 = HashTable(path)
    assert ht3.names == ["a.wav", "b.wav"]
    assert ht3.totalhashes() == ht2.totalhashes()
    q = np.stack([np.zeros(40, np.int64), p1[:, 1]], axis=1)
    np.testing.assert_array_equal(ht3.get_hits(q), ht2.get_hits(q))


def test_load_invalidates_name_index(tmp_path):
    """After load(), the cached name->id index must be rebuilt even when
    the new names list has the same length (round-2 review finding: a
    size heuristic kept the stale index, splitting a track across ids)."""
    other = HashTable(hashbits=10, depth=4, maxtime=256)
    rng = np.random.default_rng(51)
    for n in ("C.wav", "D.wav"):
        other.store_vectorized(n, np.stack(
            [rng.integers(0, 256, 20), rng.integers(0, 1 << 10, 20)],
            axis=1))
    path = str(tmp_path / "other.pklz")
    other.save(path)

    ht = HashTable(hashbits=10, depth=4, maxtime=256)
    for n in ("A.wav", "B.wav"):               # primes the index {A,B}
        ht.store_vectorized(n, np.stack(
            [rng.integers(0, 256, 20), rng.integers(0, 1 << 10, 20)],
            axis=1))
    assert ht.name_to_id("A.wav") == 0
    ht.load(path)                              # same names-list length
    assert ht.name_to_id("C.wav") == 0         # not appended as id 2
    ht.store_vectorized("C.wav", np.stack(
        [rng.integers(0, 256, 10), rng.integers(0, 1 << 10, 10)], axis=1))
    assert ht.names == ["C.wav", "D.wav"]      # no duplicate C row
    assert ht.hashesperid[0] == 30
    import pytest
    with pytest.raises(ValueError):
        ht.name_to_id("A.wav")                 # stale entry is gone


def test_duplicate_names_resolve_to_first_id():
    """After a merge introduces a duplicate name, name_to_id follows
    upstream's list.index (FIRST id), remove() removes the first id's
    entries, and the index cache stays effective (no per-call rebuild)."""
    rng = np.random.default_rng(52)
    a = HashTable(hashbits=10, depth=4, maxtime=256)
    b = HashTable(hashbits=10, depth=4, maxtime=256)
    pa = np.stack([rng.integers(0, 256, 20),
                   rng.integers(0, 1 << 10, 20)], axis=1)
    pb = np.stack([rng.integers(0, 256, 20),
                   rng.integers(0, 1 << 10, 20)], axis=1)
    a.store_vectorized("shared.wav", pa)
    b.store_vectorized("shared.wav", pb)
    a.merge(b)
    assert a.names == ["shared.wav", "shared.wav"]
    assert a.name_to_id("shared.wav") == 0
    idx_before = a._index()
    assert a._index() is idx_before            # cached, not rebuilt
    a.remove("shared.wav")                     # removes FIRST id (0)
    assert a.names[0] is None and a.names[1] == "shared.wav"
    assert a.name_to_id("shared.wav") == 1     # index re-resolves to id 1
