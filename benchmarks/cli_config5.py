"""Config-5 scale driven THROUGH THE CLI (VERDICT r2 #1 done-criterion):
the product surface — `new` ingest of precomputed .afpt streams into the
sharded device store, then batched `match` over the sharded table — at
tens of thousands of tracks on whatever mesh the process sees (run under
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 for
the 8-virtual-device mesh, or on real multi-chip hardware unchanged).

Queries are exact sub-streams of stored tracks re-based to t=0, so top-1
self-accuracy must be 1.0.  Prints one JSON line.

Run: python benchmarks/cli_config5.py [--tracks 20000] [--ndev 0]
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

SR = 11025


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=20000)
    ap.add_argument("--hashes-per-track", type=int, default=300)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--ndev", type=int, default=0, help="0 = all devices")
    ap.add_argument("--batchsize", type=int, default=256)
    args = ap.parse_args()

    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax

    from audfprint_tpu.cli import main as cli_main
    from audfprint_tpu.index.hash_table import HashTable
    from audfprint_tpu.utils import formats

    rng = np.random.default_rng(7)
    with tempfile.TemporaryDirectory() as d:
        # synthetic hash streams as .afpt files (the designed bulk-ingest
        # front half, SURVEY §3.3 — skips audio decode, which config 4
        # measures; this config measures the sharded store + match path)
        t0 = time.time()
        afpts = []
        qstreams = []
        for i in range(args.tracks):
            t = np.sort(rng.integers(0, 1 << 14, args.hashes_per_track))
            h = rng.integers(0, 1 << 20, args.hashes_per_track)
            rows = np.stack([t, h], axis=1).astype(np.int32)
            p = os.path.join(d, f"t{i:06d}.afpt")
            formats.hashes_save(p, rows)
            afpts.append(p)
            if i < args.queries:
                q = rows[:128].copy()
                q[:, 0] -= q[0, 0]
                qstreams.append(np.unique(q, axis=0))
        gen_s = time.time() - t0

        db = os.path.join(d, "db.pklz")
        ndev_args = ["--ndev", str(args.ndev)] if args.ndev else []
        t0 = time.time()
        rc = cli_main(["new", "-d", db, "-o", os.devnull,
                       "--batchsize", str(args.batchsize), *ndev_args,
                       *afpts])
        ingest_s = time.time() - t0
        assert rc == 0

        # batched match through the CLI: queries as .afpt files
        qdir = os.path.join(d, "q")
        os.makedirs(qdir)
        qfiles = []
        for i, q in enumerate(qstreams):
            p = os.path.join(qdir, f"q{i:03d}.afpt")
            formats.hashes_save(p, q)
            qfiles.append(p)
        out = os.path.join(d, "match.out")
        t0 = time.time()
        rc = cli_main(["match", "-d", db, "-o", out,
                       "--batchsize", str(args.batchsize), *ndev_args,
                       *qfiles])
        match_s = time.time() - t0
        assert rc == 0
        lines = [ln for ln in open(out) if ln.startswith("Matched")]
        correct = 0
        for i, ln in enumerate(lines):
            if f"t{i:06d}.afpt" in ln:
                correct += 1
        ht = HashTable(db)
        print(json.dumps({
            "bench": "cli_config5", "tracks": args.tracks,
            "devices": int(jax.device_count()),
            "ndev_flag": args.ndev or "auto",
            "total_hashes": int(ht.totalhashes()),
            "gen_s": round(gen_s, 1),
            "cli_ingest_s": round(ingest_s, 1),
            "cli_match_s": round(match_s, 1),
            "queries": len(qfiles),
            "top1_self": round(correct / max(1, len(qfiles)), 3)}))


if __name__ == "__main__":
    main()
