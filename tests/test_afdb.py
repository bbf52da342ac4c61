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
