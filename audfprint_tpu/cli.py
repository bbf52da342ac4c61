"""Command-line interface: the reference's 8 subcommands + flag surface.

Reference: audfprint.py (SURVEY §2.3.6 + Appendix A).  Same commands
(new | add | precompute | merge | newmerge | match | list | remove), same
flag names/defaults (argparse instead of docopt; note -h means --hashbits as
in the reference, so use --help for help).  Short options follow the
upstream docopt assignments exactly: -d dbase, -n density, -p precompdir,
-i shifts, -S freq-sd, -H ncores (ADVICE r1: the survey's Appendix A had
recalled some of these wrong; upstream-style invocations like `-S 30`
(freq-sd) or `-i 4` (shifts) now behave identically here).

Orchestration differences (TPU-native by design, SURVEY §2.2):
  * ingest/match run *batched* on the device; `--ncores N` parallelizes host
    decode with threads (there is no joblib process pool — the accelerator
    replaces per-file process parallelism).
  * The end-of-run throughput line keeps the reference's exact shape
    ("Processed N files (D s total dur) in T s sec = R x RT",
    audfprint.py:~470 [H]).
"""

from __future__ import annotations

import argparse
import os
import queue
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


from audfprint_tpu import params as P
from audfprint_tpu.index.hash_table import HashTable
from audfprint_tpu.match.matcher import Matcher, slice_hash_windows
from audfprint_tpu.models.analyzer import Analyzer
from audfprint_tpu.utils import audio as audio_io
from audfprint_tpu.utils import formats
from audfprint_tpu.utils.timing import Stages

COMMANDS = ("new", "add", "precompute", "merge", "newmerge", "match",
            "list", "remove", "warmup")


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="audfprint_tpu", add_help=False,
        description="TPU-native landmark audio fingerprinter "
                    "(capabilities of dpwe/audfprint)")
    p.add_argument("command", choices=COMMANDS)
    p.add_argument("file", nargs="*")
    p.add_argument("--help", action="help")
    a = p.add_argument
    a("-n", "--density", type=float, default=P.DENSITY)
    a("-h", "--hashbits", type=int, default=P.TABLE_HASHBITS)
    a("-b", "--bucketsize", type=int, default=P.TABLE_DEPTH)
    a("-t", "--maxtime", type=int, default=P.TABLE_MAXTIME)
    a("-u", "--maxtimebits", type=int, default=None)
    a("-r", "--samplerate", type=int, default=P.TARGET_SR)
    a("-d", "--dbase", type=str, default=None)
    a("-o", "--opfile", type=str, default=None)
    a("-F", "--fanout", type=int, default=P.MAX_PAIRS_PER_PEAK)
    a("-P", "--pks-per-frame", dest="pks_per_frame", type=int,
      default=P.MAX_PKS_PER_FRAME)
    a("-i", "--shifts", type=int, default=0)
    a("-S", "--freq-sd", dest="freq_sd", type=float, default=P.F_SD)
    a("-D", "--search-depth", dest="search_depth", type=int,
      default=P.SEARCH_DEPTH)
    a("-w", "--match-win", dest="match_win", type=int, default=P.MATCH_WIN)
    a("-N", "--min-count", dest="min_count", type=int, default=P.MIN_COUNT)
    a("-x", "--max-matches", dest="max_matches", type=int,
      default=P.MAX_MATCHES)
    a("-X", "--exact-count", dest="exact_count", action="store_true")
    a("-R", "--find-time-range", dest="find_time_range", action="store_true")
    a("-Q", "--time-quantile", dest="time_quantile", type=float,
      default=P.TIME_QUANTILE)
    a("-T", "--sortbytime", action="store_true")
    a("-H", "--ncores", type=int, default=None,
      help="host decode threads (default: auto = 2, decode is I/O-bound; "
           "an explicit value is honored exactly, 1 = serial)")
    a("-K", "--precompute-peaks", dest="precompute_peaks",
      action="store_true")
    a("-k", "--skip-existing", dest="skip_existing", action="store_true")
    a("-C", "--continue-on-error", dest="continue_on_error",
      action="store_true")
    a("-l", "--list", dest="listflag", action="store_true")
    a("-W", "--wavdir", type=str, default="")
    a("-V", "--wavext", type=str, default="")
    a("-p", "--precompdir", type=str, default=".")
    a("-I", "--illustrate", action="store_true")
    a("-J", "--illustrate-hpf", dest="illustrate_hpf", action="store_true")
    a("--sonify", action="store_true")
    a("-v", "--verbose", type=int, default=1)
    a("--batchsize", type=int, default=16,
      help="files analyzed per device batch (TPU-native knob)")
    a("--ndev", type=int, default=None,
      help="devices for table-sharded store/match (default: all local "
           "devices; 1 = single-device). Results are bit-identical at "
           "any value")
    a("--idbits", type=int, default=0,
      help="track-id bits of the entry packing (0 = the reference's "
           "32 - maxtimebits). idbits + maxtimebits > 32 switches to "
           "wide 64-bit entries: capacity beyond the reference's 2^18 "
           "tracks / mod-16384 time cap")
    a("--device-store", dest="device_store", action="store_true",
      help="new/add: keep the hash table device-resident for the whole "
           "run — each chunk is ONE fused fingerprint+store dispatch "
           "(hashes never touch the host) and the table downloads once "
           "at the end. Default on multi-device meshes; this flag "
           "enables it on a single device too (wins when the ingest is "
           "large or the link is fast; bit-identical either way)")
    a("--speed-sweep", dest="speed_sweep", type=float, default=0.0,
      help="match: also fingerprint each query at speed corrections up "
           "to +/-PCT%% (1%% steps, extra device batch rows) and report "
           "the best-scoring variant. Recovers speed-changed queries "
           "that landmark dt/df quantization inherently misses "
           "(capability beyond the reference; default off keeps output "
           "bit-identical)")
    a("--windowed", type=float, default=0.0, metavar="SEC",
      help="match: broadcast-monitoring mode — slice each (long) query "
           "into SEC-second windows (hash-domain slicing after ONE "
           "fingerprint pass; all windows matched as one device batch) "
           "and report each window's matches as '<query> t=<start>s'. "
           "Finds every DB track occurring anywhere inside a long "
           "recording (capability beyond the reference)")
    a("--window-hop", dest="window_hop", type=float, default=0.0,
      metavar="SEC", help="match --windowed: window hop in seconds "
                          "(default SEC/2, 50%% overlap)")
    a("--warm-durations", dest="warm_durations", type=str, default="5,10",
      help="warmup: comma-separated query durations (seconds) whose "
           "fingerprint + match graphs to precompile")
    a("--listen", action="store_true",
      help="match: serving loop — read query paths from stdin (one per "
           "line), match against the warm cached device table, and emit "
           "result lines immediately (flushed), in input order. Pending "
           "lines are drained and served as ONE device batch (up to "
           "--batchsize): interactive callers keep single-query latency, "
           "backlogged pipes get batched-match throughput. EOF ends; "
           "blank lines are ignored (capability beyond the reference)")
    a("--stream-above", dest="stream_above", type=float, default=3600.0,
      metavar="SEC",
      help="ingest: WAV inputs longer than SEC analyze in fixed-size "
           "chunks with O(chunk) host+device memory (carried envelope/HPF "
           "state; exact sparse backward prune). 0 disables streaming "
           "(capability beyond the reference, SURVEY long-audio plan)")
    a("--stream-chunk", dest="stream_chunk", type=int, default=8192,
      metavar="FRAMES",
      help="streamed ingest chunk size in analysis frames (~190 s at "
           "defaults); results are bit-identical at any value")
    a("--profile", type=str, default=None,
      help="write a jax.profiler trace to this directory")
    a("--json-metrics", dest="json_metrics", type=str, default=None,
      help="write per-stage timing/counters JSON to this file")
    return p


def setup_analyzer(args) -> Analyzer:
    an = Analyzer(density=args.density,
                  target_sr=args.samplerate,
                  shifts=max(1, args.shifts),
                  maxpksperframe=args.pks_per_frame,
                  maxpairsperpeak=args.fanout,
                  f_sd=args.freq_sd,
                  fail_on_error=not args.continue_on_error)
    an.stream_above_sec = max(0.0, args.stream_above)
    an.stream_chunk_frames = max(64, args.stream_chunk)
    return an


def setup_matcher(args) -> Matcher:
    return Matcher(window=args.match_win,
                   threshcount=args.min_count,
                   max_returns=args.max_matches,
                   search_depth=args.search_depth,
                   exact_count=args.exact_count,
                   find_time_range=args.find_time_range,
                   time_quantile=args.time_quantile,
                   sort_by_time=args.sortbytime,
                   verbose=args.verbose,
                   illustrate=args.illustrate,
                   illustrate_hpf=args.illustrate_hpf,
                   sonify=args.sonify,
                   # unset --ndev = auto (all local devices): a user on an
                   # 8-chip host gets sharded matching without any flag
                   ndev=args.ndev if args.ndev is not None else 0)


def filename_list_iterator(filelist, wavdir: str, wavext: str,
                           listflag: bool):
    """Expand CLI file args (reference filename_list_iterator):
    --list makes each arg a file of filenames; --wavdir/--wavext prefix."""
    if not listflag:
        for name in filelist:
            yield os.path.join(wavdir, name + wavext)
    else:
        for listfile in filelist:
            with open(listfile) as f:
                for line in f:
                    name = line.rstrip("\n")
                    if name:
                        yield os.path.join(wavdir, name + wavext)


def _new_table(args) -> HashTable:
    maxtimebits = args.maxtimebits
    maxtime = ((1 << maxtimebits) if maxtimebits is not None
               else args.maxtime)
    return HashTable(hashbits=args.hashbits, depth=args.bucketsize,
                     maxtime=maxtime, idbits=args.idbits)


def _check_params(ht: HashTable, analyzer: Analyzer, report) -> None:
    """DB/analyzer param compat check (reference stores analyzer params in
    the DB and validates on load/add — SURVEY §5 config row)."""
    want = analyzer.params_dict()
    for k, v in (ht.params or {}).items():
        if k in want and want[k] != v:
            report(f"Warning: database {k}={v} but analyzer {k}={want[k]}")


def _decode_threads(ncores) -> int:
    """--ncores unset -> auto (2 threads: decode is I/O-bound and benefits
    from overlap even at the default); an explicit value is honored exactly,
    including 1 = truly serial (ADVICE r2: users limiting host CPU)."""
    return 2 if ncores is None else max(1, ncores)


def _decode_many(analyzer: Analyzer, names: list, ncores, report):
    """Host-parallel decode (the QueueReaderThread/joblib analog).

    PCM WAVs take the native C++ threaded bulk loader when available
    (native/audfp_host.cpp); everything else (other formats, float WAVs,
    decode errors) falls back to the per-file Python/ffmpeg path."""
    results: dict[int, object] = {}
    # 16-bit mono WAVs already at the analysis rate stay raw int16 (half
    # the H2D bytes, device-side exact conversion) and are read on host
    # threads; the remaining WAV subset takes the native C++ loader even
    # when the chunk mixes formats (round 1 sent mixed chunks wholesale
    # down the slow path).  Eligibility is checked once per file here;
    # audio_read_staged re-verifies on the same handle it reads from.
    wav_idx = [i for i, n in enumerate(names)
               if n.lower().endswith(".wav") and os.path.exists(n)
               and not audio_io.wav_is_target_mono16(n, analyzer.target_sr)]
    if wav_idx:
        fast = audio_io.read_wav_batch([names[i] for i in wav_idx],
                                       sr=analyzer.target_sr,
                                       n_threads=_decode_threads(ncores))
        if fast is not None:
            for i, d in zip(wav_idx, fast):
                if d is not None:      # native couldn't handle; fall back
                    results[i] = d
    todo = [i for i in range(len(names)) if i not in results]

    def _one(name):
        try:
            d, _ = audio_io.audio_read_staged(name, sr=analyzer.target_sr)
            return d
        except audio_io.DecodeError as e:
            if analyzer.fail_on_error:
                raise
            report(f"Error reading {name}: {e}")
            return None

    if todo:
        nthreads = _decode_threads(ncores) if len(todo) > 1 else 1
        if nthreads > 1:
            with ThreadPoolExecutor(max_workers=nthreads) as ex:
                slow = list(ex.map(_one, [names[i] for i in todo]))
        else:
            slow = [_one(names[i]) for i in todo]
        for i, d in zip(todo, slow):
            results[i] = d
    return [results[i] for i in range(len(names))]


def _ingest_device_store(ht: HashTable, args, report, analyzer=None):
    """Fused device ingest for new/add (VERDICT r4 #2/#4): the table
    lives on device and every chunk is ONE fingerprint+store dispatch
    (models/ingest.DeviceIngest) — sharded with all_to_all hash routing
    when >1 device is available, single-device when --device-store is
    set.  Returns None (= host store + two-stage fingerprint) on a
    single device without --device-store, or an indivisible table."""
    from audfprint_tpu.parallel import sharded
    ndev = sharded.resolve_ndev(args.ndev)
    if ndev <= 1 and not getattr(args, "device_store", False):
        return None
    from audfprint_tpu.models.ingest import DeviceIngest
    try:
        return DeviceIngest(ht, analyzer, max(1, ndev))
    except ValueError as e:
        report(f"Note: {e}; using host store")
        return None


def do_merge(ht: HashTable, names: list, args, report,
             stages: "Stages") -> None:
    """CLI merge/newmerge (reference merge loop, audfprint.py do_cmd).

    With >1 device available the merge runs as resharding on the device
    mesh (VERDICT r3 #5): one table upload, every source's entry stream
    replayed through the sharded deterministic reservoir, one download.
    Bit-identical to the chained host merge: the replay continues from the
    true-pressure counts (re-synced from the host after every source, so a
    source's own bucket overflow never skews the next source's slot
    decisions — the same rule HashTable.merge applies).  Single device (or
    an indivisible table) falls back to the vectorized host merge."""
    from audfprint_tpu.parallel import sharded
    ndev = sharded.resolve_ndev(args.ndev)
    mesh = None
    if ndev > 1 and names:
        try:
            mesh = sharded.make_mesh(ndev)
            with stages.time("upload"):
                table, counts, tcfg = sharded.upload_sharded(ht, mesh)
            merge_fn = sharded.sharded_merge_fn(mesh, tcfg)
        except ValueError as e:
            report(f"Note: {e}; using host merge")
            mesh = None
    if mesh is None:
        for name in names:
            other = HashTable(name)
            with stages.time("merge"):
                ht.merge(other)
            report(f"merged {name} "
                   f"({sum(1 for n in other.names if n)} files)")
        return
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PS

    from audfprint_tpu.index import device_table as DT
    cs = NamedSharding(mesh, PS("d"))
    for name in names:
        other = HashTable(name)
        idoffset = ht._merge_meta(other)
        hs, es, vs = sharded.entry_streams(other, id_offset=idoffset)
        if len(hs):
            # pow2 padding: every source length shares O(log N) compiled
            # graphs (invalid rows are masked in the kernel)
            n = _next_pow2_int(len(hs))
            pad = n - len(hs)
            hs = np.pad(hs, (0, pad))
            es = (np.pad(es, ((0, pad), (0, 0))) if es.ndim == 2
                  else np.pad(es, (0, pad)))
            vs = np.pad(vs, (0, pad))
            with stages.time("merge"):
                table, counts = merge_fn(
                    table, counts, jnp.asarray(hs), jnp.asarray(es),
                    jnp.asarray(vs))
        ht._merge_counts(other)
        # re-sync device counts to the true combined pressure before the
        # next source (see docstring)
        counts = jax.device_put(ht.counts, cs)
        report(f"merged {name} ({sum(1 for n in other.names if n)} files)")
    with stages.time("download"):
        ht.table = (DT.join_wide(np.asarray(table)) if tcfg.wide
                    else np.asarray(table))


def _next_pow2_int(n: int) -> int:
    return 1 << max(0, (int(n) - 1).bit_length())


def _decode_chunk(analyzer: Analyzer, args, report, chunk: list) -> list:
    """Decode one chunk -> (name, kind, payload) entries in the chunk's
    ORIGINAL order (the reference processes files strictly in input order
    — id assignment and output lines must match even when precomputed and
    raw inputs are mixed).  kind is "pre" (precomputed, loads later),
    "wav" (payload = decoded samples), or "stream" (a WAV past
    --stream-above: analyzed chunk-wise right here with O(chunk) memory,
    payload = (hashes, duration) — full decode would defeat streaming)."""
    def _kind(n):
        if os.path.splitext(n)[1] in (formats.PRECOMPEXT,
                                      formats.PRECOMPPKEXT):
            return "pre"
        return "stream" if analyzer._should_stream(n) else "wav"

    kinds = [_kind(n) for n in chunk]
    wavs = [n for n, k in zip(chunk, kinds) if k == "wav"]
    signals = iter(_decode_many(analyzer, wavs, args.ncores, report))
    out = []
    for n, k in zip(chunk, kinds):
        if k == "wav":
            out.append((n, k, next(signals)))
        elif k == "stream":
            try:
                h = analyzer.wavfile2hashes_streaming(n)
                out.append((n, k, (h, analyzer.soundfiledur)))
            except (OSError, ValueError, audio_io.DecodeError) as e:
                if analyzer.fail_on_error:
                    raise
                report(f"Error reading {n}: {e}")
                out.append((n, k, None))
        else:
            out.append((n, k, None))
    return out


def _resolve_chunk(analyzer: Analyzer, ordered: list, hashes_iter,
                   report) -> list:
    """Decoded entries + resolved device hashes -> ordered
    (name, hashes, dur) rows; precomputed files load here; failures are
    reported + skipped (the --continue-on-error contract covers corrupt
    precompute inputs too)."""
    rows = []
    for name, kind, d in ordered:              # strict input order
        if kind == "wav":
            if d is None:
                continue                       # decode failed, reported
            rows.append((name, next(hashes_iter),
                         len(d) / analyzer.target_sr))
        elif kind == "stream":
            if d is None:
                continue                       # stream failed, reported
            rows.append((name, d[0], d[1]))
        else:
            try:
                h = analyzer.wavfile2hashes(name)   # .afpt or .afpk
            except (OSError, ValueError) as e:
                if analyzer.fail_on_error:
                    raise
                report(f"Error reading {name}: {e}")
                continue
            rows.append((name, h, analyzer.soundfiledur))
    return rows


def _run_pipelined(chunks: list, analyzer: Analyzer, args, report,
                   stages: Stages, consume, dispatch=None) -> None:
    """Three-stage pipeline shared by do_ingest and do_match: decode chunk
    i+1 on a host thread while the device fingerprints chunk i and
    `consume(ordered, handle)` handles chunk i-1 (the TPU-era
    QueueReaderThread, SURVEY §2.2; the device never idles).

    `dispatch(ordered) -> handle` overrides the device-dispatch stage
    (default: fingerprint the chunk's decoded wavs); do_match uses it to
    dispatch the fused fingerprint+match graph instead."""
    if dispatch is None:
        dispatch = lambda ordered: analyzer.fingerprint_async(  # noqa: E731
            [d for _, kind, d in ordered if kind == "wav" and d is not None])
    pool = ThreadPoolExecutor(max_workers=1)
    dec = lambda c: _decode_chunk(analyzer, args, report, c)  # noqa: E731
    pending = pool.submit(dec, chunks[0]) if chunks else None
    in_flight = None   # (ordered entries, async handle) awaiting consume
    try:
        for ci in range(len(chunks)):
            with stages.time("decode"):
                ordered = pending.result()
            pending = (pool.submit(dec, chunks[ci + 1])
                       if ci + 1 < len(chunks) else None)
            with stages.time("dispatch"):
                handle = dispatch(ordered)
            if in_flight is not None:
                consume(*in_flight)
            in_flight = (ordered, handle)
        if in_flight is not None:
            consume(*in_flight)
    finally:
        # wait=True: the decode worker may still call report(); returning
        # with it running would let main() close the opfile under it
        pool.shutdown(wait=True)


def do_ingest(ht: HashTable, analyzer: Analyzer, names: list, args,
              report, stages: Stages | None = None) -> tuple[int, float]:
    """Batched analyze + store; returns (n_files, total_dur).

    With a device store active (mesh ingest, or --device-store on one
    device) each chunk is ONE fused fingerprint+store dispatch + one tiny
    counts fetch (models/ingest.DeviceIngest — the hashes never touch the
    host); otherwise fingerprint resolves to host and stores into the
    host table directly."""
    stages = stages or Stages()
    tot_dur = 0.0
    n_done = 0
    store = _ingest_device_store(ht, args, report, analyzer)
    if args.skip_existing:
        # idempotent ingest: a killed batch job can simply rerun (SURVEY §5
        # failure-detection row; extends the reference's precompute-only
        # --skip-existing to add/new)
        present = {n for n in ht.names if n is not None}
        skipped = [n for n in names if n in present]
        names = [n for n in names if n not in present]
        for n in skipped:
            report(f"skipping existing {n}")
    B = max(1, args.batchsize)
    chunks = [names[i: i + B] for i in range(0, len(names), B)]

    dispatch = None
    if store is not None:
        dispatch = lambda ordered: store.dispatch_chunk(  # noqa: E731
            ordered, report)

    def consume(ordered, handle):
        nonlocal tot_dur, n_done
        if store is not None:
            # the chunk was stored at dispatch (device-ordered); resolve
            # fetches only the per-file counts — report AFTER the fetch
            # so a failed store never leaves "ingested" lines behind
            with stages.time("analyze"):
                rows = store.consume_chunk(handle)
            for name, nh, dur in rows:
                tot_dur += dur
                n_done += 1
                report(f"ingested #{n_done}: {name} "
                       f"({dur:.1f} s, {nh} hashes)")
            return
        with stages.time("analyze"):
            hashes = iter(analyzer.fingerprint_resolve(handle))
        rows = _resolve_chunk(analyzer, ordered, hashes, report)
        for name, h, dur in rows:
            with stages.time("store"):
                ht.store_vectorized(name, h)
            tot_dur += dur
            n_done += 1
            report(f"ingested #{n_done}: {name} "
                   f"({dur:.1f} s, {len(h)} hashes)")

    try:
        _run_pipelined(chunks, analyzer, args, report, stages, consume,
                       dispatch=dispatch)
    finally:
        # even when a chunk raises (fail_on_error), the host table must
        # reflect every chunk already stored on device — names and
        # hashesperid were updated eagerly
        if store is not None:
            with stages.time("store"):
                store.finalize()
    return n_done, tot_dur


def _precomp_outname(name: str, args, ext: str) -> str:
    outname = os.path.splitext(name)[0] + ext
    if args.precompdir not in ("", "."):
        outname = os.path.join(args.precompdir,
                               os.path.normpath(outname).lstrip(os.sep))
    return outname


def do_precompute(analyzer: Analyzer, names: list, args,
                  report) -> tuple[int, float]:
    """Batched precompute: the designed bulk-ingest front half (SURVEY §3.3:
    embarrassingly parallel; here files are fingerprinted in device batches
    and `.afpt` written per input)."""
    tot_dur = 0.0
    n_done = 0
    ext = formats.PRECOMPPKEXT if args.precompute_peaks else formats.PRECOMPEXT
    todo = []
    for name in names:
        outname = _precomp_outname(name, args, ext)
        if args.skip_existing and os.path.exists(outname):
            report(f"skipping existing {outname}")
            continue
        todo.append((name, outname))

    # peaks (-K) and hashes share the decode-prefetch + device-batch
    # driver; only the device op and the saved format differ (the -K
    # path was the last serial per-file host loop, VERDICT r4 #9)
    B = max(1, args.batchsize)
    for i in range(0, len(todo), B):
        chunk = todo[i: i + B]
        signals = _decode_many(analyzer, [n for n, _ in chunk],
                               args.ncores, report)
        good = [(n, o, d) for (n, o), d in zip(chunk, signals)
                if d is not None]
        if not good:
            continue
        if args.precompute_peaks:
            results = analyzer.samples_batch2peaks([d for _, _, d in good])
            save, unit = formats.peaks_save, "peaks"
        else:
            results = analyzer.samples_batch2hashes([d for _, _, d in good])
            save, unit = formats.hashes_save, "hashes"
        for (name, outname, d), r in zip(good, results):
            os.makedirs(os.path.dirname(outname) or ".", exist_ok=True)
            save(outname, r)
            dur = len(d) / analyzer.target_sr
            tot_dur += dur
            n_done += 1
            report(f"wrote {outname} ( {len(r)} {unit}, {dur:.1f} sec)")
    return n_done, tot_dur


def do_match(ht: HashTable, analyzer: Analyzer, matcher: Matcher,
             names: list, args, report,
             stages: Stages | None = None) -> tuple[int, float]:
    """Batched query matching with decode/compute overlap (VERDICT r2 #4):
    chunk i+1 decodes on a host thread while the device analyzes and
    matches chunk i — the _run_pipelined driver shared with do_ingest, so
    the device never idles during query decode.  Output lines still follow
    the strict input order (reference contract)."""
    stages = stages or Stages()
    tot_dur = 0.0
    n_done = 0
    B = max(1, args.batchsize)
    chunks = [names[i: i + B] for i in range(0, len(names), B)]
    pct = getattr(args, "speed_sweep", 0.0)

    wsec = getattr(args, "windowed", 0.0)
    whop = getattr(args, "window_hop", 0.0)

    def _explode_windows(rows):
        """Broadcast-monitoring mode (--windowed W [--window-hop H]):
        hash-domain window slicing (matcher.slice_hash_windows — one
        fingerprint pass per input, raw frame times, any length), with
        the windows of EVERY file in the chunk concatenated so they all
        ride one batched device match.  Returns (label, hashes, win_dur)
        rows."""
        fps = analyzer.target_sr / float(analyzer.n_hop)
        out = []
        for name, h, dur in rows:
            for t0, sel, wdur in slice_hash_windows(h, dur, wsec, fps,
                                                    whop):
                out.append((f"{name} t={t0:.1f}s", sel, wdur))
        return out

    # fused serving fast path (no windowing/sweep; single-device OR mesh —
    # on --ndev>1 the dispatch is the sharded_fused_match_cached shard_map
    # jit, VERDICT r4 #3): the
    # dispatch stage runs ONE fingerprint+match graph per chunk, so an
    # interactive query through a relay-attached chip pays one dispatch +
    # one result fetch instead of fingerprint dispatch + two hash fetches
    # + match dispatch + result fetch (matcher._fused_match_graph;
    # bit-identical, with per-row two-stage fallback past the static caps)
    fused_ok = wsec <= 0 and not pct

    def dispatch(ordered):
        sigs = [d for _, kind, d in ordered
                if kind == "wav" and d is not None]
        if fused_ok and sigs and len(sigs) == len(ordered):
            h = matcher.match_samples_fused_async(analyzer, ht, sigs)
            if h is not None:
                return ("fused", h)
        return ("fp", analyzer.fingerprint_async(sigs))

    def consume(ordered, handle):
        nonlocal tot_dur, n_done
        tag, payload = handle
        if tag == "fused":
            with stages.time("match"):
                res, nh = matcher.match_fused_resolve(analyzer, ht,
                                                      payload)
            for (name, _k, d), rrows, nhq in zip(ordered, res, nh):
                dur = len(d) / analyzer.target_sr
                for msg in matcher.results_to_msgs(rrows, dur, nhq,
                                                   analyzer, ht, name):
                    report(msg)
                tot_dur += dur
                n_done += 1
            return
        with stages.time("analyze"):
            hashes = iter(analyzer.fingerprint_resolve(payload))
        rows = _resolve_chunk(analyzer, ordered, hashes, report)
        if not rows:
            return
        if wsec > 0:
            n_done += len(rows)
            tot_dur += sum(dur for _, _, dur in rows)
            wrows = _explode_windows(rows)
            with stages.time("match"):
                wres = matcher.match_hashes_batch(
                    ht, [h for _, h, _ in wrows])
            for (label, h, wdur), rrows in zip(wrows, wres):
                for msg in matcher.results_to_msgs(rrows, wdur, len(h),
                                                   analyzer, ht, label):
                    report(msg)
            return
        base = [h for _, h, _ in rows]
        # --speed-sweep: the decoded samples ride along in `ordered`;
        # precomputed rows carry None (base hashes only)
        smp = {n: d for n, kind, d in ordered
               if kind == "wav" and d is not None}
        with stages.time("match"):
            best = matcher.match_samples_sweep(
                analyzer, ht, [smp.get(n) for n, _, _ in rows], pct,
                base_hashes=base)
        for (name, _h, dur), (rrows, f, nh) in zip(rows, best):
            msgs = matcher.results_to_msgs(rrows, dur, nh,
                                           analyzer, ht, name)
            if f != 1.0 and len(rrows):
                msgs[0] += f" (speed {round((f - 1) * 100):+d}%)"
            for msg in msgs:
                report(msg)
            tot_dur += dur
            n_done += 1

    _run_pipelined(chunks, analyzer, args, report, stages, consume,
                   dispatch=dispatch)
    return n_done, tot_dur


def do_warmup(ht: HashTable, analyzer: Analyzer, matcher: Matcher,
              args, report) -> int:
    """`warmup -d db`: precompile the serving graphs (beyond the
    reference).  Fingerprints synthetic clips at each --warm-durations
    bucket and matches them at sub-batch sizes 1 and --batchsize's power
    of two — exactly the graphs a `match` / `match --listen` process
    dispatches — so compiled executables land in the persistent compile
    cache and the device table upload happens once.  A serving process
    started afterwards answers its first query at steady-state latency
    instead of paying multi-second (relay: multi-minute) compiles.

    Returns the number of (fingerprint batch + match) dispatches run."""
    rng = np.random.default_rng(0)
    sr = analyzer.target_sr
    durs = [float(x) for x in args.warm_durations.split(",") if x.strip()]
    bmax = P.next_pow2(max(1, args.batchsize))
    bsizes = sorted({1, bmax})
    n_graphs = 0
    for d in durs:
        n = max(1, int(d * sr))
        clips = [0.1 * rng.standard_normal(n).astype(np.float32)
                 for _ in range(bmax)]
        hashes = analyzer.samples_batch2hashes(clips)   # analyzer bucket
        for b in bsizes:
            matcher.match_hashes_batch(ht, hashes[:b])  # (bsub, Q) graph
            # the fused serving graph for the same (rows, bucket) shape —
            # what `match` / `match --listen` actually dispatches first.
            # None = fused ineligible here (pinned hist core / memory
            # envelope): only the two-stage graph was compiled (ADVICE r4)
            fused = matcher.match_samples_fused(analyzer, ht, clips[:b])
            n_graphs += 2 if fused is not None else 1
        report(f"warmed {d:g} s bucket (batch sizes {bsizes})")
    return len(durs) + n_graphs


def do_listen(ht: HashTable, analyzer: Analyzer, matcher: Matcher,
              args, report, stages: Stages, out_f,
              stream=None) -> tuple[int, float]:
    """`match --listen`: a stdin-driven serving loop (beyond the reference).

    Reads one query path per line, matches it against the device-resident
    table (uploaded once, cached across queries by Matcher._device_state),
    and emits its result lines (flushed) in input order.  The first query
    pays graph compilation; every later one is decode + device dispatch.
    Blank lines are skipped, EOF ends the loop.  Precomputed
    `.afpt`/`.afpk` inputs work exactly as in batch mode (same do_match
    path).

    Dynamic batching: a reader thread feeds a queue; each serving
    iteration drains every line already waiting (up to --batchsize) and
    matches the group as ONE device batch.  An interactive caller
    (write one path, wait for the result) sees single-query latency
    unchanged — the drain finds nothing pending and serves immediately —
    while a backlogged pipe rides the batched match path's much higher
    throughput, converging on the one-dispatch-per-batch rate instead of
    one dispatch per query.

    A bad request (missing/corrupt file) must not kill the service: the
    loop forces the reference's --continue-on-error behavior per line
    ("Error reading <name>: ..." is reported, the loop continues)."""
    stream = stream if stream is not None else sys.stdin
    prev_fail = analyzer.fail_on_error
    analyzer.fail_on_error = False
    n_files, tot_dur = 0, 0.0
    lines: queue.Queue = queue.Queue()
    _EOF = object()

    def _reader():
        for line in stream:
            lines.put(line)
        lines.put(_EOF)

    threading.Thread(target=_reader, daemon=True).start()
    cap = max(1, args.batchsize)
    eof = False
    try:
        while not eof:
            item = lines.get()
            if item is _EOF:
                break
            names = []
            while True:
                name = item.strip()
                if name:
                    names.append(name)
                if len(names) >= cap:
                    break
                try:
                    item = lines.get_nowait()
                except queue.Empty:
                    break
                if item is _EOF:
                    eof = True
                    break
            if not names:
                continue
            n, d = do_match(ht, analyzer, matcher, names, args, report,
                            stages)
            n_files += n
            tot_dur += d
            (out_f or sys.stdout).flush()
    finally:
        analyzer.fail_on_error = prev_fail
    return n_files, tot_dur


def main(argv=None) -> int:
    import audfprint_tpu.utils.jaxconfig as jaxconfig
    jaxconfig.setup()

    args = make_parser().parse_args(argv)
    cmd = args.command
    if args.shifts == 0:
        args.shifts = 1

    out_f = open(args.opfile, "w") if args.opfile else None
    report_lock = threading.Lock()

    def report(msg: str) -> None:
        # thread-safe: the decode-prefetch worker can emit error lines
        with report_lock:
            if out_f is not None:
                out_f.write(msg + "\n")
            else:
                print(msg)

    analyzer = setup_analyzer(args)
    matcher = setup_matcher(args)
    stages = Stages()
    profile_ctx = None
    if args.profile:
        import jax
        os.makedirs(args.profile, exist_ok=True)
        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()
    t0 = time.time()
    n_files, tot_dur = 0, 0.0

    names = list(filename_list_iterator(
        args.file, args.wavdir, args.wavext, args.listflag))

    if args.windowed > 0 and args.speed_sweep > 0:
        # the sweep needs decoded samples per variant; windows are sliced
        # in the hash domain after one fingerprint pass — incompatible
        print("--windowed cannot be combined with --speed-sweep",
              file=sys.stderr)
        return 2
    if cmd in ("new", "newmerge", "add", "match", "merge", "list",
               "remove", "warmup") and not args.dbase:
        print("a --dbase is required for " + cmd, file=sys.stderr)
        return 2
    if cmd in ("new", "newmerge"):
        ht = _new_table(args)
    elif cmd in ("add", "match", "merge", "list", "remove", "warmup"):
        ht = HashTable(args.dbase)
    else:
        ht = None

    if cmd in ("new", "add"):
        if cmd == "add":
            _check_params(ht, analyzer, report)
        n_files, tot_dur = do_ingest(ht, analyzer, names, args, report,
                                     stages)
        with stages.time("save"):
            ht.save(args.dbase, params=analyzer.params_dict())
    elif cmd == "precompute":
        n_files, tot_dur = do_precompute(analyzer, names, args, report)
    elif cmd == "match":
        _check_params(ht, analyzer, report)
        if args.listen:
            n_files, tot_dur = do_listen(ht, analyzer, matcher, args,
                                         report, stages, out_f)
        else:
            n_files, tot_dur = do_match(ht, analyzer, matcher, names, args,
                                        report, stages)
    elif cmd in ("merge", "newmerge"):
        do_merge(ht, names, args, report, stages)
        with stages.time("save"):
            ht.save(args.dbase)
    elif cmd == "warmup":
        _check_params(ht, analyzer, report)
        n = do_warmup(ht, analyzer, matcher, args, report)
        report(f"warmup: {n} serving graphs compiled/cached in "
               f"{time.time() - t0:.1f} s")
    elif cmd == "list":
        ht.list(report)
    elif cmd == "remove":
        for name in names:
            ht.remove(name)
            report(f"removed {name}")
        ht.save(args.dbase)

    elapsed = time.time() - t0
    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)
        report(f"profiler trace written to {args.profile}")
    if cmd in ("new", "add", "precompute", "match") and args.verbose:
        ratio = elapsed / tot_dur if tot_dur > 0 else 0.0
        report(f"Processed {n_files} files ({tot_dur:.1f} s total dur) "
               f"in {elapsed:.1f} s sec = {ratio:.3f} x RT")
    if args.verbose > 1:
        stages.report(report)
    if args.json_metrics:
        stages.add_meta(command=cmd, n_files=n_files,
                        total_dur_s=round(tot_dur, 3),
                        elapsed_s=round(elapsed, 3))
        stages.dump_json(args.json_metrics)
    if out_f is not None:
        out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
