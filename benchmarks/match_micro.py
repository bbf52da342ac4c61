"""Honest matching micro-benchmark (round 2 methodology).

Measures warm, steady-state `Matcher.match_hashes_batch` wall time with
INPUTS VARIED PER CALL (the axon relay memoizes identical executions, so
repeating one input measures the cache, not the chip) and the one-time
costs (compile, device table upload) excluded by a warm call.

Run: python benchmarks/match_micro.py [--tracks 1024] [--exact]
Prints one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=1024)
    ap.add_argument("--hashes-per-track", type=int, default=300)
    ap.add_argument("--qhashes", type=int, default=100)
    ap.add_argument("--batches", type=int, default=(32, 64, 128), nargs="+")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--ndev", type=int, default=1,
                    help="table-sharded matching over this many devices "
                         "(0 = all local devices)")
    ap.add_argument("--core", choices=("hist", "sorted"), default=None,
                    help="pin the voting core (A/B the two bit-identical "
                         "formulations on hardware)")
    args = ap.parse_args()

    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    from audfprint_tpu.index.hash_table import HashTable
    from audfprint_tpu.match.matcher import Matcher

    rng = np.random.default_rng(11)
    ht = HashTable()
    streams = []
    for i in range(args.tracks):
        n = args.hashes_per_track
        h = np.stack([np.sort(rng.integers(0, ht.maxtime, n)).astype(np.int32),
                      rng.integers(0, 1 << 20, n).astype(np.int32)], axis=1)
        ht.store_vectorized(f"t{i}", h)
        streams.append(h)

    m = Matcher(exact_count=args.exact, verbose=0, ndev=args.ndev)
    m.force_core = args.core
    for B in args.batches:
        queries = []
        for b in range(B):
            s = streams[b % args.tracks]
            idx = np.sort(rng.choice(len(s), args.qhashes, replace=False))
            q = s[idx].copy()
            q[:, 0] = np.maximum(0, q[:, 0] - int(q[0, 0]))  # rebase times
            queries.append(q)
        res = m.match_hashes_batch(ht, queries)      # warm: compile + upload
        top1 = np.mean([len(r) > 0 and r[0][0] == (b % args.tracks)
                        for b, r in enumerate(res)])
        best = float("inf")
        for k in range(1, args.iters + 1):
            shifted = [np.stack([q[:, 0] + k, q[:, 1]], axis=1)
                       for q in queries]
            t0 = time.time()
            m.match_hashes_batch(ht, shifted)
            best = min(best, time.time() - t0)
        print(json.dumps({
            "B": B, "exact": bool(args.exact), "ndev": args.ndev,
            "core": args.core or "auto",
            "tracks": args.tracks,
            "total_hashes": int(ht.totalhashes()),
            "top1_self": round(float(top1), 3),
            "best_batch_s": round(best, 3),
            "queries_per_sec": round(B / best, 1)}))


if __name__ == "__main__":
    main()
