"""The five BASELINE.json benchmark configs, scalable via --scale.

  1 self-match sanity     : 10 s WAV `new` + self `match` (bit-compat smoke)
  2 1k-track clean        : 30 s tracks, exact-segment queries -> P/R + q/s
  3 noisy + resampled     : 5 s queries, --shifts 4 --density 40
  4 precompute + merge    : batched .afpt precompute -> shard DBs -> merge
  5 sharded 100k-track    : bucket-sharded device table, streaming queries

Run:  python benchmarks/baseline_configs.py <config> [--scale 0.1]
Each prints one JSON line.  --scale shrinks track counts/durations so every
config also runs on CPU in CI-ish time (scale=1 is the full BASELINE size).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import synth_batch  # noqa: E402

SR = 11025


def _analyzer(**kw):
    from audfprint_tpu.models.analyzer import Analyzer
    return Analyzer(**kw)


def _tracks(n, dur, seed=0):
    return [synth_batch(1, int(dur * SR), seed=seed * 100003 + i)[0]
            for i in range(n)]


def config1(scale):
    from audfprint_tpu.cli import main
    with tempfile.TemporaryDirectory() as d:
        from audfprint_tpu.utils.audio import audio_write_wav
        x = synth_batch(1, 10 * SR)[0]
        wav = os.path.join(d, "t.wav")
        audio_write_wav(wav, x, SR)
        db = os.path.join(d, "db.pklz")
        t0 = time.time()
        main(["new", "-d", db, wav])
        out = os.path.join(d, "out.txt")
        main(["match", "-d", db, "-o", out, wav])
        ok = "Matched" in open(out).read()
        return {"config": 1, "self_match": bool(ok),
                "elapsed_s": round(time.time() - t0, 2)}


def _build_db(tracks, analyzer, **htkw):
    from audfprint_tpu.index.hash_table import HashTable
    ht = HashTable(**htkw)
    hashes = analyzer.samples_batch2hashes(tracks)
    for i, h in enumerate(hashes):
        ht.store_vectorized(f"t{i}", h)
    return ht


def _pr(results, truths):
    tp = sum(1 for r, t in zip(results, truths)
             if len(r) and r[0][0] == t)
    fp = sum(1 for r, t in zip(results, truths)
             if len(r) and r[0][0] != t)
    fn = sum(1 for r in results if not len(r))
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fp + fn)
    return prec, rec


def config2(scale):
    from audfprint_tpu.match.matcher import Matcher
    n = max(8, int(1000 * scale))
    dur = 30.0 if scale >= 0.5 else 10.0
    an = _analyzer()
    tracks = _tracks(n, dur)
    ht = _build_db(tracks, an)
    rng = np.random.default_rng(1)
    queries, truths = [], []
    for i in range(min(n, 64)):
        s = rng.integers(0, int((dur - 5) * SR))
        queries.append(tracks[i][s: s + 5 * SR].copy())
        truths.append(i)
    qh = an.samples_batch2hashes(queries)
    m = Matcher()
    # warm call: compile + one-time device table upload; the timed call
    # uses shifted query times so the relay cannot memoize the execution
    results = m.match_hashes_batch(ht, qh)
    qh2 = [np.stack([h[:, 0] + 1, h[:, 1]], axis=1) for h in qh]
    t0 = time.time()
    m.match_hashes_batch(ht, qh2)
    dt = time.time() - t0
    prec, rec = _pr(results, truths)
    return {"config": 2, "tracks": n, "precision": round(prec, 3),
            "recall": round(rec, 3),
            "match_queries_per_sec": round(len(queries) / dt, 1)}


def _degrade(clip, rng, snr_db=None, speed=None, lowpass_hz=None):
    """Query degradations (VERDICT r2 #5: a harness that discriminates).

    speed != 1.0 is the documented hard case — landmark dt/df quantization
    is NOT robust to time-scaling (SURVEY §0), so the P/R curve must bend
    there; lowpass simulates codec band-limiting; SNR is additive noise
    scaled to the clip's measured power."""
    from scipy.signal import butter, resample_poly, sosfilt
    x = clip.astype(np.float64)
    if speed and speed != 1.0:
        # rational approximation of the speed factor (time-scale + pitch)
        up, dn = max(1, round(1000 / speed)), 1000
        x = resample_poly(x, up, dn)
    if lowpass_hz:
        sos = butter(6, lowpass_hz / (SR / 2), output="sos")
        x = sosfilt(sos, x)
    if snr_db is not None:
        sig_pow = float(np.mean(x ** 2))
        noise_pow = sig_pow / (10 ** (snr_db / 10))
        x = x + np.sqrt(noise_pow) * rng.standard_normal(len(x))
    return x.astype(np.float32)


# condition name -> _degrade kwargs.  3 s queries; the combined row is the
# "phone in a bar" case (noisy + band-limited + slightly off-speed).
CONFIG3_CONDITIONS = [
    ("clean", {}),
    ("snr10", {"snr_db": 10}),
    ("snr5", {"snr_db": 5}),
    ("snr0", {"snr_db": 0}),
    ("lowpass3k", {"lowpass_hz": 3000}),
    ("speed+2%", {"speed": 1.02}),
    ("speed-3%", {"speed": 0.97}),
    ("speed+4%", {"speed": 1.04}),
    ("snr5_lp3k_speed+2%", {"snr_db": 5, "lowpass_hz": 3000,
                            "speed": 1.02}),
]


def config3(scale):
    from audfprint_tpu.match.matcher import Matcher
    n = max(8, int(1000 * scale))
    dur = 30.0 if scale >= 0.5 else 10.0
    qdur = 3.0
    an = _analyzer()
    tracks = _tracks(n, dur)
    ht = _build_db(tracks, an)
    an4 = _analyzer(shifts=4, density=40.0)
    rng = np.random.default_rng(2)
    nq = min(n, 32)
    starts = [int(rng.integers(0, int((dur - qdur - 1) * SR)))
              for _ in range(nq)]
    m = Matcher()
    curve = {}
    for name, kw in CONFIG3_CONDITIONS:
        queries, truths = [], []
        for i in range(nq):
            clip = tracks[i][starts[i]: starts[i] + int(qdur * SR)].copy()
            queries.append(_degrade(clip, rng, **kw))
            truths.append(i)
        qh = an4.samples_batch2hashes(queries)
        t0 = time.time()
        results = m.match_hashes_batch(ht, qh)
        dt = time.time() - t0
        prec, rec = _pr(results, truths)
        curve[name] = {"precision": round(prec, 3), "recall": round(rec, 3),
                       "match_queries_per_sec": round(nq / dt, 1)}
        if "speed" in name:
            # --speed-sweep recovery (the capability the reference lacks):
            # the same degraded queries, swept at +/-4% corrections.  Cost
            # quoted next to the recovery (VERDICT r4 #7): the sweep
            # re-fingerprints each query at len(sweep_factors(4.0)) == 8
            # extra speed corrections and matches 9x the batch rows, so
            # sweep4_queries_per_sec INCLUDES variant fingerprinting.
            # chunked (8 queries -> 8 + 64 = 72 sweep rows per dispatch):
            # one 288-row voting graph at full-scale shapes SIGKILLs this
            # environment's remote tpu_compile_helper (compile-time
            # memory); every chunk shares ONE compiled graph, and the
            # per-query cost is unchanged — sweep rows scale with the
            # chunk, not the total
            t0 = time.time()
            best = []
            for c in range(0, nq, 8):
                best.extend(m.match_samples_sweep(
                    an4, ht, queries[c: c + 8], 4.0,
                    base_hashes=qh[c: c + 8]))
            dts = time.time() - t0
            sp, sr_ = _pr([rr for rr, _f, _nh in best], truths)
            curve[name]["sweep4_precision"] = round(sp, 3)
            curve[name]["sweep4_recall"] = round(sr_, 3)
            curve[name]["sweep4_queries_per_sec"] = round(nq / dts, 1)
    from audfprint_tpu.match.matcher import sweep_factors
    return {"config": 3, "tracks": n, "query_dur_s": qdur,
            "sweep_variants_per_query": 1 + len(sweep_factors(4.0)),
            "curve": curve}


def config4(scale):
    from audfprint_tpu.cli import main
    n = max(8, int(10000 * scale))
    dur = 5.0
    with tempfile.TemporaryDirectory() as d:
        from audfprint_tpu.utils.audio import audio_write_wav
        tracks = _tracks(n, dur)
        wavs = []
        for i, x in enumerate(tracks):
            p = os.path.join(d, f"t{i}.wav")
            audio_write_wav(p, x, SR)
            wavs.append(p)
        t0 = time.time()
        pre = os.path.join(d, "pre")
        main(["precompute", "--precompdir", pre, "-o", os.devnull, *wavs])
        t_pre = time.time() - t0
        afpts = [os.path.join(pre, w.lstrip("/")).replace(".wav", ".afpt")
                 for w in wavs]
        half = len(afpts) // 2
        out = {"config": 4, "tracks": n,
               "precompute_audio_sec_per_sec": round(n * dur / t_pre, 1)}
        # A/B the new+merge tail: default host store vs the round-5 fused
        # fingerprint->store device graph (--device-store); the merged
        # tables must be bit-identical
        totals = {}
        for variant, flags in [("host", []), ("device", ["--device-store"])]:
            t1 = time.time()
            db1 = os.path.join(d, f"a_{variant}.pklz")
            db2 = os.path.join(d, f"b_{variant}.pklz")
            main(["new", *flags, "-d", db1, "-o", os.devnull, *afpts[:half]])
            main(["new", *flags, "-d", db2, "-o", os.devnull, *afpts[half:]])
            dbm = os.path.join(d, f"m_{variant}.pklz")
            main(["newmerge", "-d", dbm, "-o", os.devnull, db1, db2])
            t_tail = time.time() - t1
            import hashlib

            from audfprint_tpu.index.hash_table import HashTable
            ht = HashTable(dbm)
            totals[variant] = (ht.totalhashes(),
                               hashlib.sha1(ht.table.tobytes()).hexdigest(),
                               hashlib.sha1(ht.counts.tobytes()).hexdigest())
            del ht
            out[f"new_merge_{variant}_audio_sec_per_sec"] = round(
                n * dur / t_tail, 1)
            out[f"pipeline_{variant}_audio_sec_per_sec"] = round(
                n * dur / (t_pre + t_tail), 1)
        out["total_hashes"] = totals["host"][0]
        out["variants_equal"] = totals["host"] == totals["device"]
        # headline field keeps its historical meaning (precompute + default
        # new/merge tail)
        out["pipeline_audio_sec_per_sec"] = out["pipeline_host_audio_sec_per_sec"]
        return out


def config5(scale, idbits=0):
    import jax.numpy as jnp

    from audfprint_tpu.index import device_table as DT
    from audfprint_tpu.match import voting
    from audfprint_tpu.parallel import sharded
    import jax
    n_tracks = max(64, int(100000 * scale))
    hpt = 300
    ndev = jax.device_count()
    # idbits > 18 at the default maxtimebits=14 engages the WIDE split-word
    # table (VERDICT r2 #6) — required past 262,144 tracks
    tcfg = DT.TableConfig(idbits=idbits)
    mesh = sharded.make_mesh(ndev)
    table, counts = sharded.empty_sharded_table(mesh, tcfg)
    store = sharded.sharded_store_fn(mesh, tcfg)
    rng = np.random.default_rng(3)
    B = 256
    t0 = time.time()
    queries = None
    for i0 in range(0, n_tracks, B):
        nb = min(B, n_tracks - i0)
        tt = rng.integers(0, tcfg.maxtime, (B, hpt)).astype(np.int32)
        hh = rng.integers(0, 1 << 20, (B, hpt)).astype(np.int32)
        vv = np.zeros((B, hpt), bool)
        vv[:nb] = True
        ids = (i0 + np.arange(B)).astype(np.int32)
        table, counts = store(table, counts, jnp.asarray(tt),
                              jnp.asarray(hh), jnp.asarray(vv),
                              jnp.asarray(ids))
        if queries is None:   # keep the first batch as query source
            queries = (tt.copy(), hh.copy())
    np.asarray(counts)  # sync
    build_s = time.time() - t0
    # streaming batched queries: sample hashes per track from batch 0.
    # QB=128 amortizes the fixed per-dispatch cost (~30 ms through the
    # relay); the voting buffers at (128, SD+1, maxtime+qt_cap) int32
    # stay ~0.9 GB — well inside one v5e chip.
    QB, Q = 128, 128
    qt = np.maximum(0, queries[0][:QB, :Q] - 3)
    qh = queries[1][:QB, :Q]
    qv = np.ones((QB, Q), bool)
    ncap = 1 << max(17, (n_tracks - 1).bit_length())
    hpi = np.full(ncap, hpt, np.int32)
    mcfg = voting.MatchConfig(qt_cap=512, n_ids_cap=ncap)
    hpi_dev = jnp.asarray(hpi)
    if ndev == 1:
        # the product single-device path (what Matcher dispatches since
        # round 4): compacted-RLE core + per-entry hpi plane + ONE packed
        # result fetch — measure what a user actually gets on one chip
        plane = DT.build_hpi_plane(table, hpi_dev, tcfg)

        def run_match(a_qt, a_qh, a_qv):
            p = np.asarray(voting.match_batch_packed(
                table, counts, hpi_dev, jnp.asarray(a_qt),
                jnp.asarray(a_qh), jnp.asarray(a_qv), tcfg, mcfg,
                "sorted", plane))
            return {"ids": p[:, :, 0],
                    "n_results": p[:, :, 6].sum(axis=1)}
    else:
        match = sharded.sharded_match_fn(mesh, tcfg, mcfg)

        def run_match(a_qt, a_qh, a_qv):
            out = match(table, counts, hpi_dev, jnp.asarray(a_qt),
                        jnp.asarray(a_qh), jnp.asarray(a_qv))
            return {"ids": np.asarray(out["ids"]),
                    "n_results": np.asarray(out["n_results"])}
    out = run_match(qt, qh, qv)
    ids0 = out["ids"][:, 0]
    # timed reps with distinct inputs (the relay memoizes identical
    # executions) — a single dispatch carries relay jitter, so report the
    # best of 3 (device-rate proxy) and keep all samples
    reps = []
    for r in range(1, 4):
        t0 = time.time()
        run_match(qt + r, qh, qv)
        reps.append(time.time() - t0)
    q_s = min(reps)
    acc = float((ids0 == np.arange(QB)).mean())
    # out-of-DB false-positive rate at the default threshold (VERDICT r2
    # #5): fresh random hash streams that were never stored — any row the
    # matcher reports is a pure bucket-collision false positive.  rvalid
    # (row kept) is the report decision; n_results > 0 <=> "Matched" line.
    oq_t = rng.integers(0, tcfg.maxtime, (QB, Q)).astype(np.int32)
    oq_h = rng.integers(0, 1 << 20, (QB, Q)).astype(np.int32)
    oo = run_match(oq_t, oq_h, qv)
    fp = float((oo["n_results"] > 0).mean())
    return {"config": 5, "tracks": n_tracks, "devices": ndev,
            "match_path": ("rle+hpi_plane" if ndev == 1 else "sharded-hist"),
            "idbits": idbits, "wide": bool(tcfg.wide),
            "build_s": round(build_s, 1), "top1_self": acc,
            "queries_per_sec": round(QB / q_s, 1),
            "rep_s": [round(r, 3) for r in reps],
            "oodb_fp_rate": round(fp, 4), "oodb_queries": QB}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", type=int, choices=[1, 2, 3, 4, 5])
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--idbits", type=int, default=0,
                    help="config 5: entry id bits (engages the wide table "
                         "past 18 at default maxtimebits)")
    args = ap.parse_args()
    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    fn = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}
    if args.config == 5:
        print(json.dumps(config5(args.scale, idbits=args.idbits)))
    else:
        print(json.dumps(fn[args.config](args.scale)))


if __name__ == "__main__":
    main()
