"""End-to-end CLI tests: every subcommand through main(), golden-output style
(the reference's tests/Makefile approach, SURVEY §4), on generated WAVs."""

import os
import re
import time

import numpy as np
import pytest

from audfprint_tpu.cli import main
from audfprint_tpu.utils import formats
from audfprint_tpu.utils.audio import audio_write_wav
from tests.conftest import synth_audio

SR = 11025
# small table geometry so CPU tests stay light
COMMON = ["-h", "16", "-b", "20", "-t", "4096"]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    rng = np.random.default_rng(99)
    d = tmp_path_factory.mktemp("audio")
    tracks = []
    for i in range(3):
        x = synth_audio(rng, dur_sec=6.0, n_tones=50)
        audio_write_wav(str(d / f"track{i}.wav"), x, SR)
        tracks.append(x)
    # query: clip of track1 from 2.0s..5.0s + noise
    q = tracks[1][2 * SR: 5 * SR] + 0.02 * rng.standard_normal(3 * SR).astype(
        np.float32)
    audio_write_wav(str(d / "query.wav"), q * 0.7, SR)
    # noise-only query
    audio_write_wav(str(d / "noise.wav"),
                    0.1 * rng.standard_normal(3 * SR), SR)
    return d


def _run(capsys, argv):
    rc = main([str(a) for a in argv])
    assert rc == 0
    return capsys.readouterr().out


def test_new_and_match(fixture_dir, tmp_path, capsys):
    db = tmp_path / "test.pklz"
    out = _run(capsys, ["new", "-d", db, *COMMON,
                        *(fixture_dir / f"track{i}.wav" for i in range(3))])
    assert "Saved fprints for 3 files" in out
    assert re.search(r"Processed 3 files \(18\.0 s total dur\)", out)

    out = _run(capsys, ["match", "-d", db, *COMMON, fixture_dir / "query.wav"])
    m = re.search(
        r"Matched .*query\.wav 3\.0 sec (\d+) raw hashes as .*track1\.wav "
        r"at (\d+\.\d) s with (\d+) of (\d+) common hashes at rank 0", out)
    assert m, out
    # clip starts at 2.0 s -> mode ~ 2.0 s
    assert abs(float(m.group(2)) - 2.0) <= 0.1
    # NOMATCH line for noise
    out = _run(capsys, ["match", "-d", db, *COMMON, fixture_dir / "noise.wav"])
    assert "NOMATCH" in out and "noise.wav" in out


def test_match_time_range_and_quiet(fixture_dir, tmp_path, capsys):
    db = tmp_path / "db.pklz"
    _run(capsys, ["new", "-d", db, *COMMON,
                  fixture_dir / "track0.wav", fixture_dir / "track1.wav"])
    out = _run(capsys, ["match", "-d", db, *COMMON, "-R", "-X",
                        fixture_dir / "query.wav"])
    assert re.search(r"Matched\s+\d+\.\d s starting at\s+\d+\.\d s in .*query",
                     out), out
    # verbose=0 -> tab-separated quiet format
    out = _run(capsys, ["match", "-d", db, *COMMON, "-v", "0",
                        fixture_dir / "query.wav"])
    lines = [l for l in out.splitlines() if "query.wav" in l]
    assert lines and "\t" in lines[0] and "track1.wav" in lines[0]


def test_precompute_add_roundtrip(fixture_dir, tmp_path, capsys):
    pre = tmp_path / "pre"
    out = _run(capsys, ["precompute", "--precompdir", pre, *COMMON,
                        *(fixture_dir / f"track{i}.wav" for i in range(2))])
    afpts = [str(pre / str(fixture_dir).lstrip("/") / f"track{i}.afpt")
             for i in range(2)]
    assert all(os.path.exists(a) for a in afpts), out
    # skip-existing is honored
    out = _run(capsys, ["precompute", "--precompdir", pre, "-k", *COMMON,
                        *(fixture_dir / f"track{i}.wav" for i in range(2))])
    assert out.count("skipping existing") == 2

    db = tmp_path / "dbp.pklz"
    _run(capsys, ["new", "-d", db, *COMMON, *afpts])
    out = _run(capsys, ["match", "-d", db, *COMMON, fixture_dir / "query.wav"])
    assert "track1.afpt" in out and "Matched" in out


def test_precompute_peaks(fixture_dir, tmp_path, capsys):
    pre = tmp_path / "prek"
    _run(capsys, ["precompute", "-K", "--precompdir", pre, *COMMON,
                  fixture_dir / "track0.wav"])
    afpk = str(pre / str(fixture_dir).lstrip("/") / "track0.afpk")
    assert os.path.exists(afpk)
    peaks = formats.peaks_load(afpk)
    assert len(peaks) > 30
    assert all(0 <= f < 256 for _, f in peaks)


def test_merge_and_newmerge(fixture_dir, tmp_path, capsys):
    db0 = tmp_path / "a.pklz"
    db1 = tmp_path / "b.pklz"
    _run(capsys, ["new", "-d", db0, *COMMON, fixture_dir / "track0.wav"])
    _run(capsys, ["new", "-d", db1, *COMMON, fixture_dir / "track1.wav"])
    dbm = tmp_path / "m.pklz"
    _run(capsys, ["newmerge", "-d", dbm, *COMMON, db0, db1])
    out = _run(capsys, ["list", "-d", dbm, *COMMON])
    assert "track0.wav" in out and "track1.wav" in out
    out = _run(capsys, ["match", "-d", dbm, *COMMON, fixture_dir / "query.wav"])
    assert "track1.wav" in out and "Matched" in out
    # merge db1 into db0 in place
    _run(capsys, ["merge", "-d", db0, *COMMON, db1])
    out = _run(capsys, ["match", "-d", db0, *COMMON, fixture_dir / "query.wav"])
    assert "track1.wav" in out


def test_list_remove(fixture_dir, tmp_path, capsys):
    db = tmp_path / "lr.pklz"
    _run(capsys, ["new", "-d", db, *COMMON,
                  fixture_dir / "track0.wav", fixture_dir / "track1.wav"])
    out = _run(capsys, ["list", "-d", db, *COMMON])
    assert "track0.wav" in out and "hashes" in out
    _run(capsys, ["remove", "-d", db, *COMMON, fixture_dir / "track1.wav"])
    out = _run(capsys, ["list", "-d", db, *COMMON])
    assert "track1.wav" not in out
    out = _run(capsys, ["match", "-d", db, *COMMON, fixture_dir / "query.wav"])
    assert "NOMATCH" in out


def test_opfile_and_listfile(fixture_dir, tmp_path, capsys):
    db = tmp_path / "op.pklz"
    listfile = tmp_path / "inputs.txt"
    listfile.write_text(
        f"{fixture_dir}/track0.wav\n{fixture_dir}/track1.wav\n")
    _run(capsys, ["new", "-d", db, *COMMON, "-l", listfile])
    opfile = tmp_path / "out.txt"
    _run(capsys, ["match", "-d", db, *COMMON, "-o", opfile,
                  fixture_dir / "query.wav"])
    text = opfile.read_text()
    assert "Matched" in text and "track1.wav" in text


def test_continue_on_error(fixture_dir, tmp_path, capsys):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    db = tmp_path / "ce.pklz"
    out = _run(capsys, ["new", "-d", db, *COMMON, "-C",
                        bad, fixture_dir / "track0.wav"])
    assert "Error reading" in out
    assert "Processed 1 files" in out
    with pytest.raises(Exception):
        main(["new", "-d", str(tmp_path / "x.pklz"), *COMMON, str(bad)])


def test_shifts_and_density_flags(fixture_dir, tmp_path, capsys):
    db = tmp_path / "sd.pklz"
    out = _run(capsys, ["new", "-d", db, *COMMON, "-i", "2", "-n", "40",
                        fixture_dir / "track1.wav"])
    assert "Saved fprints" in out
    out = _run(capsys, ["match", "-d", db, *COMMON, "-i", "2", "-n", "40",
                        fixture_dir / "query.wav"])
    assert "Matched" in out and "track1.wav" in out
    # param mismatch warning when matching with different density
    out = _run(capsys, ["match", "-d", db, *COMMON,
                        fixture_dir / "query.wav"])
    assert "Warning: database" in out


def test_json_metrics_and_verbose_stages(fixture_dir, tmp_path, capsys):
    import json
    db = tmp_path / "jm.pklz"
    metrics = tmp_path / "m.json"
    _run(capsys, ["new", "-d", db, *COMMON, "-v", "2",
                  "--json-metrics", metrics, fixture_dir / "track0.wav"])
    data = json.loads(metrics.read_text())
    assert data["command"] == "new" and data["n_files"] == 1
    assert "analyze" in data["stage_seconds"]
    assert "store" in data["stage_seconds"]


def test_wavdir_wavext(fixture_dir, tmp_path, capsys):
    db = tmp_path / "wd.pklz"
    _run(capsys, ["new", "-d", db, *COMMON, "-W", fixture_dir, "-V", ".wav",
                  "track0", "track1"])
    out = _run(capsys, ["match", "-d", db, *COMMON, "-W", fixture_dir,
                        "-V", ".wav", "query"])
    assert "Matched" in out and "track1.wav" in out


def test_illustrate_flag_writes_png(fixture_dir, tmp_path, capsys):
    db = tmp_path / "il.pklz"
    _run(capsys, ["new", "-d", db, *COMMON, fixture_dir / "track1.wav"])
    _run(capsys, ["match", "-d", db, *COMMON, "-I", fixture_dir / "query.wav"])
    png = str(fixture_dir / "query.wav.match.png")
    assert os.path.exists(png) and os.path.getsize(png) > 10000


def test_afpk_ingest_and_match(fixture_dir, tmp_path, capsys):
    """Peak precompute files are re-paired and usable for add + match
    (reference wavfile2hashes .afpk path)."""
    pre = tmp_path / "pk"
    _run(capsys, ["precompute", "-K", "--precompdir", pre, *COMMON,
                  fixture_dir / "track1.wav"])
    afpk = str(pre / str(fixture_dir).lstrip("/") / "track1.afpk")
    db = tmp_path / "pk.pklz"
    out = _run(capsys, ["new", "-d", db, *COMMON, afpk])
    assert "Saved fprints for 1 files" in out
    out = _run(capsys, ["match", "-d", db, *COMMON, fixture_dir / "query.wav"])
    assert "Matched" in out and "track1.afpk" in out
    # matching a .afpk query directly also works
    out = _run(capsys, ["match", "-d", db, *COMMON, afpk])
    assert "Matched" in out


def test_missing_dbase_is_clean_error(capsys):
    from audfprint_tpu.cli import main as _main
    for cmd in ("new", "newmerge", "add", "match"):
        assert _main([cmd, "x.wav"]) == 2


def test_maxtimebits_flag(fixture_dir, tmp_path, capsys):
    from audfprint_tpu.index.hash_table import HashTable
    db = tmp_path / "mtb.pklz"
    _run(capsys, ["new", "-d", db, "-h", "16", "-b", "8", "-u", "9",
                  fixture_dir / "track0.wav"])
    ht = HashTable(str(db))
    assert ht.maxtime == 512


def test_upstream_short_flag_mapping():
    """Short options must match upstream audfprint's docopt assignments
    (ADVICE r1: -d dbase, -n density, -p precompdir, -i shifts, -S freq-sd,
    -H ncores); an upstream-style invocation must parse identically."""
    from audfprint_tpu.cli import make_parser
    args = make_parser().parse_args(
        ["match", "-d", "db.pklz", "-n", "40", "-p", "pre", "-i", "4",
         "-S", "25", "-H", "8", "q.wav"])
    assert args.dbase == "db.pklz"
    assert args.density == 40.0
    assert args.precompdir == "pre"
    assert args.shifts == 4
    assert args.freq_sd == 25.0
    assert args.ncores == 8


def test_sonify_writes_wav(fixture_dir, tmp_path, capsys):
    import shutil as _sh
    db = tmp_path / "s.pklz"
    q = tmp_path / "query.wav"
    _sh.copy(fixture_dir / "query.wav", q)
    _run(capsys, ["new", "-d", db, *COMMON, fixture_dir / "track1.wav"])
    out = _run(capsys, ["match", "-d", db, *COMMON, "--sonify", str(q)])
    assert "sonify_match: wrote" in out
    son = str(q) + ".sonify.wav"
    import wave
    with wave.open(son) as w:
        assert w.getnframes() > 0 and w.getframerate() == 11025


def test_mixed_precomp_wav_preserves_input_order(fixture_dir, tmp_path,
                                                 capsys):
    """Mixed .afpt and .wav inputs must be ingested and matched strictly
    in input order (round-2 review finding: precomputed inputs were
    reordered to the chunk tail, diverging id assignment and output-line
    order from the reference)."""
    pre = tmp_path / "pre"
    _run(capsys, ["precompute", "-p", pre, *COMMON,
                  fixture_dir / "track0.wav", fixture_dir / "track2.wav"])
    afpts = sorted(str(p) for p in pre.rglob("*.afpt"))
    assert len(afpts) == 2
    db = tmp_path / "ordered.pklz"
    # interleave: afpt(track0), wav(track1), afpt(track2) in ONE chunk
    out = _run(capsys, ["new", "-d", db, *COMMON, "--batchsize", "8",
                        afpts[0], fixture_dir / "track1.wav", afpts[1]])
    order = [line.split(": ")[1].split(" (")[0]
             for line in out.splitlines() if line.startswith("ingested #")]
    assert [os.path.basename(n) for n in order] == [
        "track0.afpt", "track1.wav", "track2.afpt"]
    out = _run(capsys, ["list", "-d", db])
    listed = [ln.split(" (")[0] for ln in out.splitlines()
              if ln.endswith("hashes)")]
    assert [os.path.basename(n) for n in listed] == [
        "track0.afpt", "track1.wav", "track2.afpt"]
    # match: output lines follow query input order too
    out = _run(capsys, ["match", "-d", db, *COMMON, "--batchsize", "8",
                        afpts[1], fixture_dir / "query.wav", afpts[0]])
    qlines = [ln for ln in out.splitlines()
              if ln.startswith(("Matched", "NOMATCH"))]
    assert len(qlines) == 3
    assert "track2.afpt" in qlines[0]
    assert "query.wav" in qlines[1]
    assert "track0.afpt" in qlines[2]


def test_matcher_device_cache_not_aliased(fixture_dir, tmp_path):
    """Two HashTables with identical shape/rev but different content must
    not share cached device state (round-2 review finding: an id(ht) cache
    key could alias a GC'd table's address)."""
    from audfprint_tpu.index.hash_table import HashTable
    from audfprint_tpu.match.matcher import Matcher

    rng = np.random.default_rng(60)
    m = Matcher(threshcount=3, search_depth=8, verbose=0)
    q = None
    seen = []
    for k in range(2):
        ht = HashTable(hashbits=10, depth=4, maxtime=256)
        pairs = np.stack([np.arange(20),
                          rng.choice(1 << 10, 20, replace=False)], axis=1)
        ht.store_vectorized(f"only{k}.wav", pairs)
        if q is None:
            q = pairs.astype(np.int32)
            rows = m.match_hashes(ht, q)
            assert len(rows) == 1
        else:
            # same rev/shape, different content: must re-upload, so the
            # old query cannot match in the new table
            rows = m.match_hashes(ht, q)
            assert len(rows) == 0, rows
        seen.append(ht)   # keep alive; aliasing is guarded structurally


def test_continue_on_error_covers_precomp_inputs(fixture_dir, tmp_path,
                                                 capsys):
    """A missing or corrupt .afpt under -C is reported and skipped for
    both add and match, like raw audio (round-2 review finding)."""
    pre = tmp_path / "pre2"
    _run(capsys, ["precompute", "-p", pre, *COMMON,
                  fixture_dir / "track0.wav"])
    afpt = str(next(pre.rglob("*.afpt")))
    bad = str(tmp_path / "missing.afpt")
    db = tmp_path / "cprec.pklz"
    out = _run(capsys, ["new", "-d", db, "-C", *COMMON,
                        afpt, bad, fixture_dir / "track1.wav"])
    assert "Error reading" in out and "missing.afpt" in out
    assert "Saved fprints for 2 files" in out
    out = _run(capsys, ["match", "-d", db, "-C", *COMMON,
                        bad, fixture_dir / "query.wav"])
    assert "Error reading" in out
    assert "Matched" in out and "query.wav" in out
    # without -C the same input aborts
    db2 = tmp_path / "cprec2.pklz"
    with pytest.raises((OSError, ValueError)):
        main(["new", "-d", str(db2), *COMMON, bad])


def test_cli_wide_table_end_to_end(tmp_path, capsys):
    """Wide-entry tables through the product surface (VERDICT r2 #6):
    --idbits 20 at maxtimebits 14 = 64-bit entries; new -> match must
    round-trip and match at rank 0 on the (sharded, auto --ndev) mesh."""
    import numpy as np

    from audfprint_tpu.cli import main
    from audfprint_tpu.index.hash_table import HashTable
    from audfprint_tpu.utils.audio import audio_write_wav
    from tests.conftest import synth_audio

    rng = np.random.default_rng(31)
    sr = 11025
    tracks = [synth_audio(rng, dur_sec=5.0, n_tones=40) for _ in range(2)]
    wavs = []
    for i, x in enumerate(tracks):
        p = str(tmp_path / f"w{i}.wav")
        audio_write_wav(p, x, sr)
        wavs.append(p)
    q = str(tmp_path / "q.wav")
    audio_write_wav(q, tracks[1][256 * 43: 256 * 43 + 3 * sr], sr)
    db = str(tmp_path / "wide.pklz")
    common = ["-h", "14", "-b", "20", "--idbits", "20"]
    assert main(["new", "-d", db, *common, *wavs]) == 0
    ht = HashTable(db)
    assert ht.wide and ht.table.dtype == np.uint64
    capsys.readouterr()
    assert main(["match", "-d", db, *common, q]) == 0
    out = capsys.readouterr().out
    assert "w1.wav at " in out and "rank 0" in out, out


def test_speed_sweep_recovers_offspeed_query(fixture_dir, tmp_path, capsys):
    """--speed-sweep N: a +4% speed-changed query (the accuracy harness's
    recall-0 condition, docs/STATUS.md config 3) is unmatched by the plain
    path but recovered by the sweep, with the winning factor annotated.
    Default (sweep off) output stays byte-stable (golden tests)."""
    from audfprint_tpu.utils.audio import _resample
    db = tmp_path / "sweep.pklz"
    _run(capsys, ["new", "-d", db, *COMMON,
                  *(fixture_dir / f"track{i}.wav" for i in range(3))])
    # speed up track1's 2.0-5.0 s clip by 4% (time-scale + pitch shift)
    rng = np.random.default_rng(5)
    clip = np.fromfile(str(fixture_dir / "query.wav"), np.int16)[22:] \
        .astype(np.float32) / 32768.0
    sped = _resample(clip, 104, 100)
    qp = tmp_path / "sped.wav"
    audio_write_wav(str(qp), sped, SR)

    plain = _run(capsys, ["match", "-d", db, *COMMON, qp])
    swept = _run(capsys, ["match", "-d", db, *COMMON,
                          "--speed-sweep", "4", qp])
    m = re.search(r"Matched .*sped\.wav .* as .*track1\.wav .*rank 0 "
                  r"\(speed \+4%\)", swept)
    assert m, (plain, swept)

    def aligned(out):
        g = re.search(r"with (\d+) of \d+ common hashes at rank 0", out)
        return int(g.group(1)) if g else 0
    assert aligned(swept) > aligned(plain), (plain, swept)


def test_match_listen_serving_loop(fixture_dir, tmp_path, capsys,
                                   monkeypatch):
    """--listen: queries stream in over stdin one path per line; each
    emits its result lines (flushed) before the next is read, against the
    once-uploaded cached device table.  Output must equal the batch-mode
    output for the same inputs, in input order."""
    import io

    db = tmp_path / "listen.pklz"
    _run(capsys, ["new", "-d", db, *COMMON,
                  *(fixture_dir / f"track{i}.wav" for i in range(3))])
    q1 = str(fixture_dir / "query.wav")
    q2 = str(fixture_dir / "noise.wav")

    batch = _run(capsys, ["match", "-d", db, *COMMON, q1, q2])
    monkeypatch.setattr("sys.stdin", io.StringIO(f"{q1}\n\n{q2}\n"))
    served = _run(capsys, ["match", "-d", db, *COMMON, "--listen"])

    def result_lines(out):
        return [ln for ln in out.splitlines()
                if ln.startswith(("Matched", "NOMATCH"))]
    assert result_lines(served) == result_lines(batch)
    assert "Matched" in served and "NOMATCH" in served
    # the summary line counts the streamed queries
    assert re.search(r"Processed 2 files \(6\.0 s total dur\)", served)

    # a bad request must not kill the service (forced continue-on-error):
    # the error is reported and later lines still serve
    monkeypatch.setattr(
        "sys.stdin", io.StringIO(f"{tmp_path}/nope.wav\n{q1}\n"))
    served = _run(capsys, ["match", "-d", db, *COMMON, "--listen"])
    assert "Error reading" in served and "Matched" in served


def test_match_listen_mixed_inputs_out_of_order_pressure(
        fixture_dir, tmp_path, capsys, monkeypatch):
    """Out-of-order completion pressure (VERDICT r3 #9): a flooded backlog
    interleaving instant precomputed .afpt inputs with wav inputs (decode
    cost) must still emit every result in exact input order, with results
    equal to batch mode over the same list."""
    import io

    db = tmp_path / "listenm.pklz"
    _run(capsys, ["new", "-d", db, *COMMON,
                  *(fixture_dir / f"track{i}.wav" for i in range(3))])
    # precompute the query -> instant hash-load input
    _run(capsys, ["precompute", "-p", tmp_path / "pre", *COMMON,
                  fixture_dir / "query.wav"])
    import glob
    afpt = glob.glob(str(tmp_path / "pre" / "**" / "query.afpt"),
                     recursive=True)[0]
    qw = str(fixture_dir / "query.wav")
    nz = str(fixture_dir / "noise.wav")
    queries = [qw, afpt, nz, afpt, qw, afpt, nz, afpt]

    batch = _run(capsys, ["match", "-d", db, *COMMON, *queries])
    monkeypatch.setattr("sys.stdin", io.StringIO("".join(
        q + "\n" for q in queries)))
    served = _run(capsys, ["match", "-d", db, *COMMON, "--listen"])

    def result_lines(out):
        return [ln for ln in out.splitlines()
                if ln.startswith(("Matched", "NOMATCH"))]
    got = result_lines(served)
    assert got == result_lines(batch)
    # order pin: each result line names its own query, in input order
    for ln, q in zip(got, queries):
        assert q in ln, (ln, q)


def test_match_listen_opfile_flushes_per_query(fixture_dir, tmp_path,
                                               capsys, monkeypatch):
    """With -o, an INTERACTIVE caller (write a path, wait for its result,
    write the next) sees each query's lines flushed to the opfile before
    it sends the next request — the dynamic-batching drain must serve an
    empty backlog immediately, never wait for more input (a write→wait
    driver would otherwise deadlock)."""
    import io

    db = tmp_path / "listenf.pklz"
    _run(capsys, ["new", "-d", db, *COMMON, fixture_dir / "track1.wav"])
    q1 = str(fixture_dir / "query.wav")
    opfile = tmp_path / "served.txt"

    class Interactive(io.StringIO):
        """Yields line i+1 only after query i's result reached the opfile
        (exactly how a request/response driver behaves)."""

        sent = 0

        def __iter__(self):
            return self

        def __next__(self):
            deadline = time.time() + 120
            while self.sent > 0:
                txt = opfile.read_text() if opfile.exists() else ""
                if txt.count("Matched") >= self.sent:
                    break
                assert time.time() < deadline, "serving loop stalled"
                time.sleep(0.01)
            line = self.readline()
            if not line:
                raise StopIteration
            self.sent += 1
            return line

    monkeypatch.setattr("sys.stdin", Interactive(f"{q1}\n{q1}\n{q1}\n"))
    _run(capsys, ["match", "-d", db, *COMMON, "-o", opfile, "--listen"])
    assert opfile.read_text().count("Matched") == 3


def test_warmup_precompiles_serving_graphs(fixture_dir, tmp_path, capsys):
    """`warmup -d db`: compiles the fingerprint + match graphs a serving
    process will dispatch, against the real table.  Functional check: it
    runs end-to-end, reports each duration bucket, and a subsequent match
    still produces the normal result lines."""
    db = tmp_path / "warm.pklz"
    _run(capsys, ["new", "-d", db, *COMMON, fixture_dir / "track1.wav"])
    out = _run(capsys, ["warmup", "-d", db, *COMMON,
                        "--warm-durations", "3", "--batchsize", "2"])
    assert "warmed 3 s bucket (batch sizes [1, 2])" in out
    assert re.search(r"warmup: \d+ serving graphs compiled/cached", out)
    out = _run(capsys, ["match", "-d", db, *COMMON,
                        fixture_dir / "query.wav"])
    assert "Matched" in out
    # a --dbase is required
    assert main(["warmup"]) == 2
    capsys.readouterr()


def test_match_windowed_monitoring(fixture_dir, tmp_path, capsys):
    """--windowed W: a long recording containing two different DB tracks
    (with dead air between them) reports each track in the window where
    it occurs, labeled '<query> t=<start>s' — the broadcast-monitoring
    mode.  Windows are sliced in the hash domain after one fingerprint
    pass, so every window shares one batched device match."""
    from audfprint_tpu.utils.audio import audio_read

    db = tmp_path / "mon.pklz"
    _run(capsys, ["new", "-d", db, *COMMON,
                  *(fixture_dir / f"track{i}.wav" for i in range(3))])

    t0, _ = audio_read(str(fixture_dir / "track0.wav"), sr=SR)
    t2, _ = audio_read(str(fixture_dir / "track2.wav"), sr=SR)
    rng = np.random.default_rng(5)
    stream = np.concatenate([
        t0[: 4 * SR],
        0.01 * rng.standard_normal(4 * SR).astype(np.float32),
        t2[SR: 5 * SR],
    ])
    rec = tmp_path / "broadcast.wav"
    audio_write_wav(str(rec), stream, SR)

    out = _run(capsys, ["match", "-d", db, *COMMON,
                        "--windowed", "4", "--window-hop", "2", rec])
    lines = [ln for ln in out.splitlines()
             if ln.startswith(("Matched", "NOMATCH"))]
    # 12 s at hop 2 s, window 4 s -> 5 windows, one result line each
    assert len(lines) == 5, out
    by_t = {re.search(r"t=(\d+\.\d)s", ln).group(1): ln for ln in lines}
    assert "track0.wav" in by_t["0.0"] and by_t["0.0"].startswith("Matched")
    assert "track2.wav" in by_t["8.0"] and by_t["8.0"].startswith("Matched")
    # the dead-air-centered window matches neither full track strongly
    assert "track1.wav" not in out
    # summary counts FILES, not windows
    assert re.search(r"Processed 1 files \(12\.0 s total dur\)", out)

    # incompatible with --speed-sweep (sweep needs per-variant samples)
    assert main(["match", "-d", str(db), "--windowed", "4",
                 "--speed-sweep", "2", str(rec)]) == 2
    capsys.readouterr()


def test_match_listen_batches_backlog(fixture_dir, tmp_path, capsys,
                                      monkeypatch):
    """A backlogged stdin (all lines already queued) is served in batched
    do_match calls — far fewer dispatches than queries — with result
    order still exactly the input order."""
    import io

    from audfprint_tpu import cli as cli_mod

    db = tmp_path / "listenb.pklz"
    _run(capsys, ["new", "-d", db, *COMMON,
                  *(fixture_dir / f"track{i}.wav" for i in range(3))])
    q1 = str(fixture_dir / "query.wav")
    q2 = str(fixture_dir / "noise.wav")
    queries = [q1, q2, q1, q1, q2, q1]

    calls = []
    real_do_match = cli_mod.do_match

    def probe(ht, analyzer, matcher, names, *a, **kw):
        if not calls:
            time.sleep(0.05)   # let the reader thread enqueue the backlog
        calls.append(list(names))
        return real_do_match(ht, analyzer, matcher, names, *a, **kw)

    monkeypatch.setattr(cli_mod, "do_match", probe)
    monkeypatch.setattr("sys.stdin", io.StringIO("".join(
        q + "\n" for q in queries)))
    served = _run(capsys, ["match", "-d", db, *COMMON, "--listen"])

    # all queries served, in order, and the backlog coalesced: the 5
    # post-warm queries arrive in at most 2 batches (first call may run
    # before the reader catches up, everything after it is batched)
    assert [n for c in calls for n in c] == queries
    assert len(calls) <= 3, calls
    got = [ln for ln in served.splitlines()
           if ln.startswith(("Matched", "NOMATCH"))]
    assert len(got) == len(queries)
    assert [("NOMATCH" if ln.startswith("NOMATCH") else "Matched")
            for ln in got] == ["Matched", "NOMATCH", "Matched", "Matched",
                               "NOMATCH", "Matched"]
