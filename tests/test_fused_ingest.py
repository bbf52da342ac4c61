"""Fused fingerprint->store ingest (VERDICT r4 #2/#4).

Pins the bit-identity contract of models/ingest.DeviceIngest against the
sequential host store (reference ingest loop, audfprint.py:~200 /
hash_table.py:~120-180 [M]):

  * single-device fused graph == host store_vectorized, file by file
  * sharded (8-dev) fused graph with all_to_all hash routing == host
  * mixed precomputed + wav chunks keep strict input-order ids
  * a forced routing-cap overflow masks every write and the replicated
    replay reproduces the identical table
  * the CLI new/add path drives it end-to-end (--device-store)
"""

import numpy as np
import pytest

from audfprint_tpu import params as P
from audfprint_tpu.index.hash_table import HashTable
from audfprint_tpu.models.analyzer import Analyzer
from audfprint_tpu.models.ingest import (DeviceIngest,
                                         sharded_fused_ingest_fn)
from audfprint_tpu.utils import formats
from audfprint_tpu.utils.audio import audio_write_wav

SR = 11025


def _clips(rng, n, dur=3.0):
    from tests.conftest import synth_audio
    return [synth_audio(rng, dur_sec=dur + 0.3 * (i % 3)) for i in range(n)]


def _host_reference(analyzer, names, sigs):
    """Sequential host ingest of the same signals -> HashTable."""
    ht = HashTable()
    hashes = analyzer.samples_batch2hashes(sigs)
    for name, h in zip(names, hashes):
        ht.store_vectorized(name, h)
    return ht


def _ingest_device(ht, analyzer, ndev, ordered):
    ing = DeviceIngest(ht, analyzer, ndev)
    handle = ing.dispatch_chunk(ordered, report=print)
    rows = ing.consume_chunk(handle)
    ing.finalize()
    return ing, rows


def _assert_tables_equal(got: HashTable, want: HashTable):
    np.testing.assert_array_equal(got.counts, want.counts)
    np.testing.assert_array_equal(got.table, want.table)
    np.testing.assert_array_equal(got.hashesperid, want.hashesperid)
    assert got.names[: len(want.names)] == want.names


@pytest.mark.parametrize("ndev", [1, 8])
def test_fused_ingest_matches_host(rng, ndev):
    an = Analyzer()
    sigs = _clips(rng, 5)
    names = [f"clip{i}.wav" for i in range(5)]
    want = _host_reference(an, names, sigs)

    ht = HashTable()
    ordered = [(n, "wav", d) for n, d in zip(names, sigs)]
    _ing, rows = _ingest_device(ht, an, ndev, ordered)
    _assert_tables_equal(ht, want)
    # per-file counts == host hash counts; report rows in input order
    assert [n for n, _, _ in rows] == names
    got_counts = [nh for _, nh, _ in rows]
    assert got_counts == [int(want.hashesperid[i]) for i in range(5)]


def test_fused_ingest_mixed_pre_and_wav(rng, tmp_path):
    """Precomputed .afpt entries interleave with raw audio; ids and table
    must equal the sequential reference loop over the same input order."""
    an = Analyzer()
    sigs = _clips(rng, 4)
    hashes = an.samples_batch2hashes(sigs)
    pre_path = tmp_path / "pre1.afpt"
    formats.hashes_save(str(pre_path), hashes[1])
    names = ["a.wav", str(pre_path), "c.wav", "d.wav"]

    want = HashTable()
    for name, h in zip(names, [hashes[0], hashes[1], hashes[2], hashes[3]]):
        want.store_vectorized(name, h)

    ht = HashTable()
    ordered = [("a.wav", "wav", sigs[0]),
               (str(pre_path), "pre", None),
               ("c.wav", "wav", sigs[2]),
               ("d.wav", "wav", sigs[3])]
    _ingest_device(ht, an, 8, ordered)
    _assert_tables_equal(ht, want)
    assert ht.names[:4] == names


def test_fused_ingest_overflow_replays_identically(rng):
    """A routing cap far below the real per-dest volume must (a) flag
    ok=0 with every write masked, and (b) replay to the identical
    table through the replicated store."""
    an = Analyzer()
    sigs = _clips(rng, 4)
    names = [f"o{i}.wav" for i in range(4)]
    want = _host_reference(an, names, sigs)

    ht = HashTable()
    ing = DeviceIngest(ht, an, 8)
    ing._fn = sharded_fused_ingest_fn(ing.mesh, an.config, ing.cfg,
                                      cap_override=4)
    handle = ing.dispatch_chunk([(n, "wav", d)
                                 for n, d in zip(names, sigs)],
                                report=print)
    # the fetched buffer must carry ok == 0
    seg = handle[0]
    buf = np.asarray(seg[3])
    assert buf[-1] == 0, "cap=4 must overflow"
    rows = ing.consume_chunk(handle)
    ing.finalize()
    _assert_tables_equal(ht, want)
    assert [nh for _, nh, _ in rows] == [
        int(want.hashesperid[i]) for i in range(4)]


def test_fused_ingest_incremental_add(rng):
    """add into a non-empty table uploads existing state and continues
    the reservoir bit-identically."""
    an = Analyzer()
    sigs = _clips(rng, 6)
    names = [f"inc{i}.wav" for i in range(6)]
    want = _host_reference(an, names, sigs)

    ht = HashTable()
    hashes = an.samples_batch2hashes(sigs[:2])
    for name, h in zip(names[:2], hashes):
        ht.store_vectorized(name, h)
    ordered = [(n, "wav", d) for n, d in zip(names[2:], sigs[2:])]
    _ingest_device(ht, an, 8, ordered)
    _assert_tables_equal(ht, want)


def test_cli_device_store_single(rng, tmp_path):
    """`new --device-store` on one device == the host-store DB."""
    from audfprint_tpu.cli import main as cli_main

    wavs = []
    for i, x in enumerate(_clips(rng, 3)):
        p = tmp_path / f"w{i}.wav"
        audio_write_wav(str(p), x, SR)
        wavs.append(str(p))
    db_host = str(tmp_path / "host.pklz")
    db_dev = str(tmp_path / "dev.pklz")
    assert cli_main(["new", "-d", db_host, "--ndev", "1",
                     "-o", str(tmp_path / "o1")] + wavs) == 0
    assert cli_main(["new", "-d", db_dev, "--ndev", "1", "--device-store",
                     "-o", str(tmp_path / "o2")] + wavs) == 0
    a, b = HashTable(db_host), HashTable(db_dev)
    _assert_tables_equal(b, a)
    # the ingested lines must agree too (counts ride the report); the
    # "Processed ... x RT" timing line is wall-clock, excluded
    l1 = [ln for ln in (tmp_path / "o1").read_text().splitlines()
          if not ln.startswith("Processed ")]
    l2 = [ln for ln in (tmp_path / "o2").read_text().splitlines()
          if not ln.startswith("Processed ")]
    assert l1 == l2


def test_exact_count_event_overflow_matches_oracle():
    """The round-5 exact-count event compaction falls back to the
    full-width path when one query hash has more duplicate pairs than
    the static E_r cap — this input forces that overflow (one hash
    stored 24x for one track at consecutive times) and must still agree
    with the oracle exactly; a sparse control stays on the compacted
    path and must agree too."""
    import jax.numpy as jnp

    from audfprint_tpu.index import device_table as DT
    from audfprint_tpu.match import voting
    from audfprint_tpu.oracle import match as om

    tcfg = DT.TableConfig(hashbits=12, depth=32, maxtimebits=10, seed=0)
    for dup in (24, 2):            # overflow (24 > E_r=8) and compacted
        ht = HashTable(hashbits=tcfg.hashbits, depth=tcfg.depth,
                       maxtime=tcfg.maxtime, seed=tcfg.seed)
        rows = [np.stack([100 + np.arange(dup),
                          np.full(dup, 1234)], axis=1)]
        rng2 = np.random.default_rng(9)
        extra = rng2.choice(1 << 12, size=12, replace=False)
        rows.append(np.stack([110 + np.arange(12), extra], axis=1))
        ht.store_vectorized("t0", np.concatenate(rows).astype(np.int64))
        q = np.concatenate([np.stack([[10], [1234]], axis=1),
                            np.stack([20 + np.arange(12), extra],
                                     axis=1)]).astype(np.int64)
        mp = P.MatcherParams(max_returns=2, exact_count=True,
                             threshcount=2, search_depth=8)
        want = om.match_hashes(ht, q, mp)
        mcfg = voting.MatchConfig.from_params(mp, qt_cap=128, n_ids_cap=16)
        Q = 64
        qt = np.zeros((1, Q), np.int32)
        qh = np.zeros((1, Q), np.int32)
        qv = np.zeros((1, Q), bool)
        qt[0, : len(q)] = q[:, 0]
        qh[0, : len(q)] = q[:, 1]
        qv[0, : len(q)] = True
        hpi = np.zeros(16, np.int32)
        hpi[: len(ht.hashesperid)] = ht.hashesperid
        out = np.asarray(voting.match_batch_packed(
            jnp.asarray(ht.table), jnp.asarray(ht.counts),
            jnp.asarray(hpi), jnp.asarray(qt), jnp.asarray(qh),
            jnp.asarray(qv), tcfg, mcfg, "sorted"))
        n = int(out[0, :, 6].sum())
        got = out[0, :n, :6].astype(np.int64)
        np.testing.assert_array_equal(got, want)


def test_batched_peaks_match_serial(rng, tmp_path):
    """samples_batch2peaks (the batched `precompute -K` path, VERDICT r4
    #9) returns exactly wavfile2peaks' sorted unique peak sets, shifts
    included."""
    an = Analyzer(shifts=2)
    sigs = _clips(rng, 3)
    paths = []
    for i, x in enumerate(sigs):
        p = tmp_path / f"pk{i}.wav"
        audio_write_wav(str(p), x, SR)
        paths.append(str(p))
    batched = an.samples_batch2peaks(sigs)
    for p, got in zip(paths, batched):
        want = an.wavfile2peaks(p)
        assert got == want


def test_fused_mesh_serving_matches_two_stage(rng):
    """The fused fingerprint+match shard_map graph (VERDICT r4 #3) is
    bit-identical to the two-stage sharded matcher, including the
    over-cap readback fallback."""
    from audfprint_tpu.match.matcher import Matcher

    an = Analyzer()
    sigs = _clips(rng, 6, dur=4.0)
    names = [f"s{i}.wav" for i in range(6)]
    ht = _host_reference(an, names, sigs)

    m = Matcher(ndev=8, verbose=0)
    queries = [s[: SR * 2] for s in sigs[:5]]       # 5 rows: pads to 8
    fused = m.match_samples_fused(an, ht, queries)
    assert fused is not None, "mesh fused path must be eligible"
    rows_f, nh_f = fused
    hashes = an.samples_batch2hashes(queries)
    rows_t = m.match_hashes_batch(ht, hashes)
    assert nh_f == [len(h) for h in hashes]
    for rf, rt in zip(rows_f, rows_t):
        np.testing.assert_array_equal(rf, rt)
    # top-1 self sanity
    for i, rf in enumerate(rows_f):
        assert len(rf) and ht.names[int(rf[0][0])] == names[i]

    # force per-row ineligibility: a tiny static cap re-routes every row
    # through the two-stage path at resolve time, results unchanged
    m2 = Matcher(ndev=8, verbose=0)
    m2.fused_qcap = P.next_pow2(1, 128)   # 128 < real unique counts? ensure
    hcounts = [len(h) for h in hashes]
    if max(hcounts) > 128:
        fused2 = m2.match_samples_fused(an, ht, queries)
        rows_f2, _ = fused2
        for rf, rt in zip(rows_f2, rows_t):
            np.testing.assert_array_equal(rf, rt)


@pytest.mark.parametrize("idbits", [0, 24])
def test_finalize_compact_equals_slice(idbits):
    """The compacted finalize download (round-5: D2H bytes track stored
    hashes, not capacity) must reproduce the column-slice fetch exactly,
    for packed and wide tables, including over-full buckets."""
    import jax.numpy as jnp

    from audfprint_tpu.index import device_table as DT
    from audfprint_tpu.models import ingest as ING

    cfg = DT.TableConfig(hashbits=10, depth=8, idbits=idbits)
    rng = np.random.default_rng(7)
    table, counts = DT.empty_table(cfg)
    B, L = 8, 256            # ~2k entries into 1k buckets: some overflow
    tt = rng.integers(0, cfg.maxtime, (B, L)).astype(np.int32)
    hh = rng.integers(0, cfg.n_buckets, (B, L)).astype(np.int32)
    vv = rng.random((B, L)) < 0.9
    ids = np.arange(B, dtype=np.int32)
    table, counts = DT.store_batch(table, counts, jnp.asarray(tt),
                                   jnp.asarray(hh), jnp.asarray(vv),
                                   jnp.asarray(ids), cfg)

    di = object.__new__(DeviceIngest)
    di.cfg, di.table, di.counts, di.mesh = cfg, table, counts, None
    di.ht = HashTable()
    di.finalize()

    full = np.asarray(table)
    want = DT.join_wide(full) if cfg.wide else full
    np.testing.assert_array_equal(di.ht.table, want)
    np.testing.assert_array_equal(di.ht.counts, np.asarray(counts))
    # sanity: this fixture actually took the compact path
    occ = np.minimum(np.asarray(counts), cfg.depth)
    S = P.next_pow2(max(1, int(occ.sum())), 1)
    assert S * 4 <= cfg.n_buckets * P.next_pow2(
        int(min(cfg.depth, np.asarray(counts).max())), 1)
