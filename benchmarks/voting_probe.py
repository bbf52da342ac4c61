"""Probe: per-stage device time of the round-4 compacted-RLE voting core.

Prefix graphs at config-5 shapes (100k-track table, B=128, Q=128,
SD=100), each reduced to one scalar fetch; inputs pre-staged on device
and varied per call (relay memoizes identical executions; SKILL.md).
The marginal deltas attribute the batch time across: dispatch constant,
hits gather, candidate selection, key-sort+compaction, mode/count vector
work (shifts + segmented reductions + ranking).

Run on the chip:  python benchmarks/voting_probe.py [--tracks N] [--exact]
"""

import argparse
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=102400)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--Q", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--exact", action="store_true")
    args = ap.parse_args()

    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax
    import jax.numpy as jnp

    from audfprint_tpu.index import device_table as DT
    from audfprint_tpu.match import voting

    B, Q, SD = args.B, args.Q, 100
    depth = 100
    tcfg = DT.TableConfig(hashbits=20, depth=depth, maxtimebits=14, seed=0)
    ncap = 1 << max(12, int(np.ceil(np.log2(max(2, args.tracks)))))
    # modes_cap=1 mirrors the product derivation (max(1, max_returns) at
    # default -x 1); the NamedTuple default of 4 predates round 4's
    # minimal-Mc derivation and would 4x the exact-count mode loop here
    mcfg = voting.MatchConfig(search_depth=SD, qt_cap=2048, n_ids_cap=ncap,
                              exact_count=args.exact, modes_cap=1)
    nbins = tcfg.maxtime + mcfg.qt_cap
    H = Q * depth

    rng = np.random.default_rng(3)
    # synthetic loaded table at config-5 occupancy (~30 entries/bucket)
    nhash = args.tracks * 300
    counts_h = np.bincount(
        rng.integers(0, 1 << 20, nhash), minlength=1 << 20).astype(np.int32)
    stored = np.minimum(counts_h, depth)
    table_h = ((rng.integers(0, args.tracks, (1 << 20, depth),
                             dtype=np.int64) << 14)
               | rng.integers(0, 1 << 14, (1 << 20, depth), dtype=np.int64))
    table_h = np.where(np.arange(depth)[None, :] < stored[:, None],
                       table_h, 0).astype(np.uint32)
    table = jnp.asarray(table_h)
    counts = jnp.asarray(counts_h)
    hpi = jnp.asarray(np.full(ncap, 300, np.int32))

    def staged(n):
        out = []
        for _ in range(n):
            qt = jnp.asarray(rng.integers(0, 256, (B, Q)), jnp.int32)
            qh = jnp.asarray(rng.integers(0, 1 << 20, (B, Q)), jnp.int32)
            qv = jnp.asarray(np.ones((B, Q), bool))
            out.append((qt, qh, qv))
        for t in out:
            np.asarray(t[0][0, :1])
        return out

    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, H))

    # table/counts/hpi are explicit jit ARGUMENTS, not closure captures:
    # a closed-over 400 MB device array becomes a compile-request constant
    # and the axon relay rejects the body (HTTP 413)
    @jax.jit
    def p0_null(table, counts, hpi, qt, qh, qv):
        return (qt[0, 0] + qh[0, 0]).astype(jnp.float32)

    @jax.jit
    def p1_hits(table, counts, hpi, qt, qh, qv):
        ids3, dts3, hv3 = DT.get_hits_local(table, counts, qt, qh, qv,
                                            tcfg, 0)
        return (jnp.sum(ids3 & 1023) + jnp.sum(dts3 & 1023)).astype(
            jnp.float32)

    # p2/p3 mirror the round-4 FUSED core's prefix: F1 (id, bin) 2-key
    # sort, then the F2 selection sort over the id-run starts
    @jax.jit
    def p2_f1sort(table, counts, hpi, qt, qh, qv):
        ids3, dts3, hv3 = DT.get_hits_local(table, counts, qt, qh, qv,
                                            tcfg, 0)
        id_f = ids3.reshape(B, H)
        dt_f = dts3.reshape(B, H)
        v_f = hv3.reshape(B, H)
        N = mcfg.n_ids_cap
        dtbin_f = jnp.clip(dt_f + mcfg.qt_cap, 0, nbins - 1)
        idk = jnp.where(v_f, jnp.minimum(id_f, N - 1), N)
        s_id, s_db = jax.lax.sort((idk, dtbin_f), num_keys=2)
        return (jnp.sum(s_id & 1023) + jnp.sum(s_db & 1023)).astype(
            jnp.float32)

    @jax.jit
    def p3_select(table, counts, hpi, qt, qh, qv):
        ids3, dts3, hv3 = DT.get_hits_local(table, counts, qt, qh, qv,
                                            tcfg, 0)
        id_f = ids3.reshape(B, H)
        dt_f = dts3.reshape(B, H)
        v_f = hv3.reshape(B, H)
        N = mcfg.n_ids_cap
        dtbin_f = jnp.clip(dt_f + mcfg.qt_cap, 0, nbins - 1)
        idk = jnp.where(v_f, jnp.minimum(id_f, N - 1), N)
        s_id, s_db = jax.lax.sort((idk, dtbin_f), num_keys=2)
        iota_h = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.int32)[None], (B, H))
        idruns = voting._Runs.of(s_id)
        c_h = (idruns.end - idruns.start).astype(jnp.int32)
        id_first = iota_h == idruns.start
        hpi_f = jnp.maximum(1, hpi).astype(jnp.float32)
        wc = c_h.astype(jnp.float32) / hpi_f[jnp.minimum(s_id, N - 1)]
        k1 = jnp.where(id_first & (s_id < N), -wc, jnp.float32(jnp.inf))
        k1s, negid_s, pos_s = jax.lax.sort((k1, -s_id, iota_h), num_keys=2)
        return (jnp.sum(-negid_s[:, :SD] & 1023)
                + jnp.sum(pos_s[:, :SD])).astype(jnp.float32)

    @jax.jit
    def p4_full(table, counts, hpi, qt, qh, qv):
        out = voting.match_batch_packed(table, counts, hpi, qt, qh, qv,
                                        tcfg, mcfg, core="sorted")
        return jnp.sum(out).astype(jnp.float32)

    # plane as a jit ARGUMENT (closure constants 413 through the relay)
    plane = DT.build_hpi_plane(table, hpi, tcfg)
    np.asarray(plane[0, :1])

    @jax.jit
    def _p4b(table, counts, hpi, pl, qt, qh, qv):
        out = voting.match_batch_packed(table, counts, hpi, qt, qh, qv,
                                        tcfg, mcfg, core="sorted",
                                        hpi_plane=pl)
        return jnp.sum(out).astype(jnp.float32)

    def p4b_plane(table, counts, hpi, qt, qh, qv):
        return _p4b(table, counts, hpi, plane, qt, qh, qv)

    @jax.jit
    def p5_hist(table, counts, hpi, qt, qh, qv):
        out = voting.match_batch_packed(table, counts, hpi, qt, qh, qv,
                                        tcfg, mcfg, core="hist")
        return jnp.sum(out).astype(jnp.float32)

    probes = [("null(dispatch)", p0_null), ("hits-gather", p1_hits),
              ("+f1-sort", p2_f1sort), ("+selection", p3_select),
              ("full-rle", p4_full), ("full-rle+plane", p4b_plane),
              ("full-hist", p5_hist)]
    st = staged(args.iters + 1)
    prev = 0.0
    for name, fn in probes:
        float(fn(table, counts, hpi, *st[0]))
        t0 = time.time()
        for k in range(args.iters):
            float(fn(table, counts, hpi, *st[k + 1]))
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"{name:>16}: {ms:7.1f} ms  (delta {ms - prev:+7.1f})",
              flush=True)
        if name != "full-rle":
            prev = ms


if __name__ == "__main__":
    main()
