"""Batched on-device time-offset histogram voting (the Matcher core).

TPU-native reformulation of the reference's per-candidate Python loop
(audfprint_match.py match_hashes/_approx_match_counts/_exact_match_counts,
SURVEY §2.3.5 / §3.2): all queries in a batch and all `search_depth`
candidates are processed together as scatter-adds into a
(batch, candidate, dt-bin) histogram, a cumulative-sum window smear, and
masked argmax reductions — no data-dependent shapes anywhere.

Bit-compat contract vs audfprint_tpu.oracle.match.match_hashes:
  * candidate ranking: raw count / hashesperid, ties -> HIGHER id (the
    upstream np.argsort(wcounts)[::-1] rule)
  * approx (default): mode = first argmax of the +/-window-smeared dt
    histogram over the candidate's own dt domain (bins below the
    candidate's min dt masked, matching the oracle's bincount starting at
    dtmin); count = smeared value at mode; one row per candidate
  * exact (--exact-count): modes = local maxima of the RAW histogram
    within +/-window with count >= threshcount (oracle find_modes); ONE
    ROW PER MODE, counted as #distinct query rows with an aligned hit
    (rows are pre-deduped, so distinct row == distinct (qtime, hash) —
    _unique_match_hashes).  modes_cap bounds modes per candidate with
    static shape, but selection is BY the final ranking's own order —
    exact count desc normally, earliest mode time under --sortbytime —
    so returned rows are provably oracle-identical whenever
    modes_cap >= max_returns
  * time range: integer-index quantiles over the aligned-hit qtime multiset

The core is written against *combiner* callables so the identical code runs
single-device (identity combiners) and table-sharded under shard_map (psum /
pmin over the mesh axis; see audfprint_tpu.parallel.sharded) with
bit-identical results.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from audfprint_tpu import params as P
from audfprint_tpu.index import device_table as DT

_I32MAX = jnp.int32(2**31 - 1)
_ident: Callable = lambda x: x


class MatchConfig(NamedTuple):
    window: int = P.MATCH_WIN
    threshcount: int = P.MIN_COUNT
    max_returns: int = P.MAX_MATCHES
    search_depth: int = P.SEARCH_DEPTH
    exact_count: bool = False
    find_time_range: bool = False
    time_quantile: float = P.TIME_QUANTILE
    sort_by_time: bool = False
    qt_cap: int = 2048          # max query frame index + 1 (static)
    n_ids_cap: int = 4096       # id-space capacity (static, >= #tracks)
    modes_cap: int = 4          # exact-count: result rows kept per
                                # candidate (static-shape cap; results are
                                # exact whenever modes_cap >= max_returns,
                                # see match_core)

    @classmethod
    def from_params(cls, mp: P.MatcherParams, qt_cap: int = 2048,
                    n_ids_cap: int = 4096) -> "MatchConfig":
        return cls(window=mp.window, threshcount=mp.threshcount,
                   max_returns=mp.max_returns, search_depth=mp.search_depth,
                   exact_count=mp.exact_count,
                   find_time_range=mp.find_time_range,
                   time_quantile=mp.time_quantile,
                   sort_by_time=mp.sort_by_time,
                   qt_cap=qt_cap, n_ids_cap=n_ids_cap,
                   # oracle parity requires modes_cap >= max_returns
                   # (see match_core); derive it so no caller can silently
                   # under-cap exact-count multi-mode results
                   modes_cap=max(4, mp.max_returns))


def _select_candidates_hits(id_f, v_f, bidx, hashesperid,
                            mcfg: MatchConfig):
    """Hit-domain candidate selection (single-device fast path).

    The id-domain path below sorts the FULL (B, n_ids_cap) weighted-count
    array — at 100k+ tracks that one sort dominates the whole matching
    graph (measured 52 of 126 ms per B=128 batch at config-5 scale).  A
    query only ever hits H = Q*depth ids, so this formulation works
    entirely in the (B, H) hit domain:

      sort hit ids -> run-length raw counts (cummax/cummin scans, no
      searchsorted) -> one 3-operand sort over the run STARTS by
      (-wc, -id) -> top-SD; per-hit ranks via a (B, n_ids_cap) scatter +
      gather (bandwidth-cheap, no sort).

    Bit-identical to the id-domain path: same wc = raw/hpi f32 values,
    same (wc desc, id desc) order, same validity (raw > 0).  Invalid
    candidate slots scatter their rank at index n_ids_cap (out of bounds
    -> dropped), so a filler id can never alias a real hit id."""
    B, H = id_f.shape
    SD = mcfg.search_depth
    N = mcfg.n_ids_cap
    iota_h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))
    key = jnp.where(v_f, jnp.minimum(id_f, N - 1), N)
    s = jax.lax.sort(key)
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    # run length per hit, scan-only: a hit's run ends at the next start
    # strictly after it (exclusive reverse cummin of start positions —
    # identical for every hit of a run) and begins at its own run start
    # (forward cummax of start positions)
    a = jnp.where(first, iota_h, H)
    nxt_incl = jnp.flip(jax.lax.cummin(jnp.flip(a, 1), axis=1), 1)
    nxt = jnp.concatenate(
        [nxt_incl[:, 1:], jnp.full((B, 1), H, jnp.int32)], axis=1)
    sidx = jax.lax.cummax(jnp.where(first, iota_h, 0), axis=1)
    c_h = nxt - sidx                                    # count per hit
    hpi = jnp.maximum(1, hashesperid).astype(jnp.float32)
    wc = c_h.astype(jnp.float32) / hpi[jnp.minimum(s, N - 1)]
    inf = jnp.float32(jnp.inf)
    k1 = jnp.where(first & (s < N), -wc, inf)           # starts only
    k1s, negid_s, pos_s = jax.lax.sort((k1, -s, iota_h), num_keys=2)
    # a query can hold at most H distinct candidate ids; when SD > H the
    # extra slots are necessarily invalid — pad them (the id-domain path
    # fills them with never-hit ids, equally invisible in the output)
    S = min(SD, H)
    pad = ((0, 0), (0, SD - S))
    cand_valid = jnp.pad(k1s[:, :S] < inf, pad)
    cand_ids = jnp.where(cand_valid, jnp.pad(-negid_s[:, :S], pad), N - 1)
    cand_raw = jnp.where(
        cand_valid,
        jnp.pad(jnp.take_along_axis(c_h, pos_s[:, :S], axis=1), pad), 0)
    rankmap = jnp.full((B, N), SD, jnp.int32)
    rankmap = rankmap.at[
        jnp.arange(B)[:, None],
        jnp.where(cand_valid, cand_ids, N)].set(      # N = OOB -> dropped
        jnp.broadcast_to(jnp.arange(SD, dtype=jnp.int32)[None, :], (B, SD)),
        mode="drop")
    id_safe = jnp.where(v_f, jnp.minimum(id_f, N - 1), 0)
    rank_f = jnp.where(v_f, rankmap[bidx, id_safe], SD)
    return cand_ids, cand_raw, cand_valid, rank_f


def _select_candidates_hits_sharded(id_f, v_f, bidx, hashesperid,
                                    mcfg: MatchConfig,
                                    sum_all: Callable,
                                    gather_all: Callable):
    """Hit-domain candidate selection under shard_map (VERDICT r2 #2).

    Kills the (B, n_ids_cap) 3-operand full sort of the id-domain path
    (measured 52 of 126 ms per B=128 batch at 100k tracks) on the
    multi-device path too.  A query hash's hits all live on the shard
    owning its bucket, so:

      1. psum-combine raw counts in the id domain (scatter only — cheap;
         the SORT was the cost)
      2. each shard ranks its LOCAL hit-domain run starts by the GLOBAL
         (wc desc, id desc) key and keeps its local top-SD
      3. all_gather the (B, SD) local candidates -> one (B, ndev*SD) sort
         + consecutive-duplicate drop -> global top-SD

    Exactness: a globally top-SD id has >= 1 hit on some shard; its local
    rank there under the global key is <= its global rank <= SD, so it
    survives step 2 on that shard; step 3's merge under the same total
    order (wc desc, id desc — distinct ids never tie) reproduces the
    global order exactly.  Bit-identical to the id-domain path
    (test_sharded: single-device equality pins it)."""
    B, H = id_f.shape
    SD = mcfg.search_depth
    N = mcfg.n_ids_cap
    inf = jnp.float32(jnp.inf)
    iota_h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))
    id_safe = jnp.where(v_f, jnp.minimum(id_f, N - 1), 0)
    raw = sum_all(jnp.zeros((B, N), jnp.int32)
                  .at[bidx, id_safe].add(v_f.astype(jnp.int32)))
    # local run starts over sorted local hit ids; invalid -> sentinel N
    key = jnp.where(v_f, jnp.minimum(id_f, N - 1), N)
    s = jax.lax.sort(key)
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1) & (s < N)
    hpi = jnp.maximum(1, hashesperid).astype(jnp.float32)
    s_safe = jnp.minimum(s, N - 1)
    wc_h = raw[bidx, s_safe].astype(jnp.float32) / hpi[s_safe]
    k1 = jnp.where(first & (raw[bidx, s_safe] > 0), -wc_h, inf)
    k1s, negid_s, _pos = jax.lax.sort((k1, -s, iota_h), num_keys=2)
    S = min(SD, H)
    pad = ((0, 0), (0, SD - S))
    loc_ok = jnp.pad(k1s[:, :S] < inf, pad)
    loc_ids = jnp.where(loc_ok, jnp.pad(-negid_s[:, :S], pad), N)
    loc_wc = jnp.where(loc_ok, jnp.pad(-k1s[:, :S], pad), -1.0)
    # merge shards: duplicates of an id carry IDENTICAL global (wc, id)
    # keys, so after one sort they are adjacent; drop non-first dupes and
    # compact with a second stable small sort over (B, ndev*SD)
    g_ids = gather_all(loc_ids)
    g_wc = gather_all(loc_wc)
    G = g_ids.shape[1]
    iota_g = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None], (B, G))
    _gk, gnegid, gpos = jax.lax.sort((-g_wc, -g_ids, iota_g), num_keys=2)
    ids_m = -gnegid
    wc_m = jnp.take_along_axis(g_wc, gpos, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), ids_m[:, 1:] == ids_m[:, :-1]], axis=1)
    dup |= ids_m >= N                       # padding slots drop too
    _dk, ids_c, wc_c = jax.lax.sort(
        (dup.astype(jnp.int32) * G + iota_g, ids_m, wc_m), num_keys=1)
    # key < G <=> the row was a kept (non-duplicate, non-padding) candidate
    cand_valid = (wc_c[:, :SD] > 0.0) & (_dk[:, :SD] < G)
    cand_ids = jnp.where(cand_valid, ids_c[:, :SD], N - 1)
    bidx_sd = jnp.broadcast_to(jnp.arange(B)[:, None], (B, SD))
    cand_raw = jnp.where(cand_valid, raw[bidx_sd, cand_ids], 0)
    rankmap = jnp.full((B, N), SD, jnp.int32)
    rankmap = rankmap.at[
        jnp.arange(B)[:, None],
        jnp.where(cand_valid, cand_ids, N)].set(      # N = OOB -> dropped
        jnp.broadcast_to(jnp.arange(SD, dtype=jnp.int32)[None, :], (B, SD)),
        mode="drop")
    rank_f = jnp.where(v_f, rankmap[bidx, id_safe], SD)
    return cand_ids, cand_raw, cand_valid, rank_f


def _select_candidates(id_f, v_f, bidx, hashesperid, mcfg: MatchConfig,
                       sum_all: Callable = _ident,
                       gather_all: Callable | None = None):
    """Raw counts per id (combined across shards) -> weighted top-SD
    candidates + per-hit candidate ranks.

    Ranking: raw count / hashesperid; ties id-DESC via two sort keys
    (-wc, -id) — the upstream np.argsort(wcounts)[::-1] tie rule (oracle
    best_count_ids).  Unsharded calls dispatch to the hit-domain
    formulation (_select_candidates_hits); sharded calls with a
    gather_all combiner use the per-shard hit-domain + merge formulation
    (_select_candidates_hits_sharded).  The id-domain scatter + full sort
    below is kept only as the equivalence reference (and for sharded
    callers that pass no gather).
    Returns (cand_ids, cand_raw, cand_valid (B, SD); rank_f (B, H) with
    SD = "not a candidate").
    """
    if sum_all is _ident:
        return _select_candidates_hits(id_f, v_f, bidx, hashesperid, mcfg)
    if gather_all is not None:
        return _select_candidates_hits_sharded(
            id_f, v_f, bidx, hashesperid, mcfg, sum_all, gather_all)
    B = id_f.shape[0]
    SD = mcfg.search_depth
    id_safe = jnp.where(v_f, jnp.minimum(id_f, mcfg.n_ids_cap - 1), 0)
    raw = sum_all(jnp.zeros((B, mcfg.n_ids_cap), jnp.int32)
                  .at[bidx, id_safe].add(v_f.astype(jnp.int32)))
    hpi = jnp.maximum(1, hashesperid).astype(jnp.float32)
    wc = jnp.where(raw > 0, raw.astype(jnp.float32) / hpi[None, :], -1.0)
    iota_ids = jnp.broadcast_to(
        jnp.arange(mcfg.n_ids_cap, dtype=jnp.int32)[None, :],
        (B, mcfg.n_ids_cap))
    negw_s, _negi, ids_s = jax.lax.sort((-wc, -iota_ids, iota_ids),
                                        num_keys=2)
    candw = -negw_s[:, :SD]
    cand_ids = ids_s[:, :SD]
    cand_valid = candw > 0.0
    cand_raw = jnp.take_along_axis(raw, cand_ids, axis=1)
    rankmap = jnp.full((B, mcfg.n_ids_cap), SD, jnp.int32)
    rankmap = rankmap.at[
        jnp.arange(B)[:, None], cand_ids].set(
        jnp.broadcast_to(jnp.arange(SD, dtype=jnp.int32)[None, :], (B, SD)))
    rank_f = jnp.where(v_f, rankmap[bidx, id_safe], SD)
    return cand_ids, cand_raw, cand_valid, rank_f


def match_core(table: jax.Array, counts: jax.Array, hashesperid: jax.Array,
               qtimes: jax.Array, qhashes: jax.Array, qvalid: jax.Array,
               tcfg: DT.TableConfig, mcfg: MatchConfig,
               bucket_lo: jax.Array | int = 0,
               sum_all: Callable = _ident,
               min_all: Callable = _ident,
               gather_all: Callable | None = None):
    """Voting over a (possibly shard-local) table.

    `sum_all`/`min_all` combine per-shard partials across the mesh
    axis (identity when unsharded); `gather_all` concatenates per-shard
    arrays along axis 1 (all_gather, tiled) and enables the sharded
    hit-domain candidate selection.  Returns dict of (B, max_returns)
    arrays: ids, filtcount, mode_dt, rawcount, min_t, max_t, rvalid; plus
    n_results.
    """
    B, Q = qhashes.shape
    SD = mcfg.search_depth
    W = mcfg.window
    nbins = tcfg.maxtime + mcfg.qt_cap

    ids3, dts3, hv3 = DT.get_hits_local(
        table, counts, qtimes, qhashes, qvalid, tcfg, bucket_lo)
    H = Q * tcfg.depth
    id_f = ids3.reshape(B, H)
    dt_f = dts3.reshape(B, H)
    v_f = hv3.reshape(B, H)
    qt_f = jnp.broadcast_to(qtimes[:, :, None],
                            (B, Q, tcfg.depth)).reshape(B, H)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, H))

    # 1+2. candidate selection + per-hit candidate ranks (shared helper)
    (cand_ids, cand_raw, cand_valid, rank_f) = _select_candidates(
        id_f, v_f, bidx, hashesperid, mcfg, sum_all, gather_all)

    # 3. per-candidate dt histogram (combined) + per-candidate mode bins.
    #    approx (default): one mode per candidate = masked argmax of the
    #      +/-W box-smeared histogram (oracle _smeared_hist), count = smear
    #      at mode.
    #    exact (--exact-count): Mc = modes_cap modes per candidate = local
    #      maxima of the RAW histogram within +/-W with count >=
    #      max(1, threshcount) (oracle find_modes), chosen by (exact count
    #      desc, bin asc); each mode becomes its own result row.
    dtbin_f = jnp.clip(dt_f + mcfg.qt_cap, 0, nbins - 1)
    # int16 histogram when counts provably fit (every bin count and every
    # windowed sum is bounded by H, the total hits per query): halves the
    # memory traffic of the dominant scatter-add and of the (B, SD, nbins)
    # smear reads.  int32 for very long queries (H >= 2^15) and under
    # shard_map (the psum combiner keeps the portable dtype).
    hdt = (jnp.int16 if H < (1 << 15) and sum_all is _ident
           else jnp.int32)
    hist = sum_all(jnp.zeros((B, SD + 1, nbins), hdt).at[
        bidx, rank_f, dtbin_f].add(v_f.astype(hdt))[:, :SD])
    binid = jnp.arange(nbins, dtype=jnp.int32)
    zpad = jnp.zeros((B, SD, W), hdt)
    histp = jnp.concatenate([zpad, hist, zpad], axis=-1)
    Mc = max(1, mcfg.modes_cap) if mcfg.exact_count else 1

    if mcfg.exact_count:
        wmax = histp[..., : nbins]
        for o in range(1, 2 * W + 1):
            wmax = jnp.maximum(wmax, histp[..., o: o + nbins])
        ismode = (hist == wmax) & (hist >= max(1, mcfg.threshcount))

        # Exact unique-row coverage U(m) = #distinct query rows with >= 1
        # hit in [m-W, m+W], for EVERY bin, via interval difference arrays:
        #   C(m) = sum over hits of window indicator  (multi-counts rows)
        #   D(m) = sum over CONSECUTIVE same-(qrow, candidate) sorted hit
        #          pairs of their window intersection indicator
        #   U = C - D   (the hits of a row covering m are contiguous in
        #               sorted order, so count-1[covered] telescopes into
        #               consecutive-pair overlaps — exact, not approximate)
        # Selecting per-candidate modes by U itself makes the returned rows
        # provably identical to the oracle's unbounded find_modes list
        # whenever modes_cap >= max_returns: every discarded mode is
        # dominated by all kept modes of its own candidate under the final
        # (count desc, cand rank, bin asc) order.
        depth = tcfg.depth
        EXT = nbins + 2 * W + 2          # buffer index = bin + W
        one = v_f.astype(hdt)            # |cell| and every cumsum <= H
        diff = jnp.zeros((B, SD + 1, EXT), hdt)
        diff = diff.at[bidx, rank_f, dtbin_f].add(one)
        diff = diff.at[bidx, rank_f, dtbin_f + 2 * W + 1].add(-one)
        # sort each query row's hits by (candidate rank, dt) to expose
        # consecutive same-candidate pairs; invalid hits (rank SD) sort last
        rank3 = rank_f.reshape(B, Q, depth)
        dtbin3 = dtbin_f.reshape(B, Q, depth)
        r_s, d_s = jax.lax.sort((rank3, dtbin3), num_keys=2)
        pair_ok = ((r_s[..., :-1] == r_s[..., 1:])
                   & (r_s[..., 1:] < SD)
                   & (d_s[..., 1:] - d_s[..., :-1] <= 2 * W))
        pone = pair_ok.astype(hdt)
        rank_p = jnp.where(pair_ok, r_s[..., 1:], SD)
        bidx3 = jnp.broadcast_to(
            jnp.arange(B)[:, None, None], (B, Q, depth - 1))
        diff = diff.at[bidx3, rank_p, d_s[..., 1:]].add(-pone)
        diff = diff.at[bidx3, rank_p, d_s[..., :-1] + 2 * W + 1].add(pone)
        uext = jnp.cumsum(sum_all(diff[:, :SD]), axis=-1)
        ucov = uext[..., W: W + nbins].astype(jnp.int32)  # (B, SD, nbins)

        mode_bins, mode_oks, mode_filts = [], [], []
        if mcfg.sort_by_time:
            # Time-sorted output truncates to the EARLIEST rows, so parity
            # for modes_cap >= max_returns needs the Mc earliest modes that
            # pass the keep filter (U >= threshcount) — count-desc selection
            # would drop an early low-count mode the oracle returns.
            selectable = ismode & (ucov >= mcfg.threshcount)
            sbin = jnp.where(selectable, binid[None, None, :], _I32MAX)
            for _s in range(Mc):
                mb = jnp.argmin(sbin, axis=-1).astype(jnp.int32)
                ok = jnp.take_along_axis(
                    sbin, mb[..., None], axis=-1)[..., 0] < _I32MAX
                mv = jnp.take_along_axis(
                    ucov, mb[..., None], axis=-1)[..., 0]
                mode_bins.append(mb)
                mode_oks.append(ok)
                mode_filts.append(jnp.where(ok, mv, -1))
                sbin = jnp.where(binid[None, None, :] == mb[..., None],
                                 _I32MAX, sbin)
        else:
            mscore = jnp.where(ismode, ucov, -1)
            for _s in range(Mc):
                mb = jnp.argmax(mscore, axis=-1).astype(
                    jnp.int32)                            # ties->low bin
                mv = jnp.take_along_axis(
                    mscore, mb[..., None], axis=-1)[..., 0]
                mode_bins.append(mb)
                mode_oks.append(mv > 0)
                mode_filts.append(mv)
                mscore = jnp.where(binid[None, None, :] == mb[..., None],
                                   -1, mscore)
        mode_bin = jnp.stack(mode_bins, axis=-1)          # (B, SD, Mc)
        mode_ok = jnp.stack(mode_oks, axis=-1)
        filt_exact = jnp.stack(mode_filts, axis=-1)
        filt_approx = None
    else:
        # +/-W box smear: direct (2W+1)-tap shifted sum — far cheaper than
        # a full cumsum over the bins axis for small W (exact integer math)
        smeared = histp[..., : nbins]
        for o in range(1, 2 * W + 1):
            smeared = smeared + histp[..., o: o + nbins]
        # smeared[d] == sum over hist[d-W .. d+W]; argmax over the
        # candidate's own dt domain (bins below its min dt masked)
        dtmin = min_all(jnp.full((B, SD + 1), _I32MAX, jnp.int32).at[
            bidx, rank_f].min(jnp.where(v_f, dtbin_f, _I32MAX))[:, :SD])
        sm = jnp.where(binid[None, None, :] >= dtmin[..., None], smeared, -1)
        mode_bin = jnp.argmax(sm, axis=-1).astype(jnp.int32)[..., None]
        mode_ok = jnp.ones((B, SD, 1), bool)
        filt_approx = jnp.max(sm, axis=-1).astype(jnp.int32)

    # 4+5. per (candidate, mode slot): filtered count (exact counts already
    #      computed bin-wise above) and optional qtime quantile range
    #      (per-shard partials combined)
    filts, min_ts, max_ts = [], [], []
    for s in range(Mc):
        mb_s = mode_bin[:, :, s]
        aligned = (v_f
                   & (jnp.abs(dtbin_f
                              - mb_s[bidx, jnp.minimum(rank_f, SD - 1)]) <= W)
                   & (rank_f < SD))
        if mcfg.exact_count:
            # exact count = U at the mode: #distinct query rows with an
            # aligned hit (rows are pre-deduped, so == #unique (qtime,
            # hash) — the oracle's _unique_match_hashes)
            filts.append(filt_exact[:, :, s])
        else:
            filts.append(filt_approx)
        if mcfg.find_time_range:
            # same int16 bound as the dt histogram: every count and every
            # cumsum value is <= H aligned hits
            qthist = sum_all(
                jnp.zeros((B, SD + 1, mcfg.qt_cap), hdt).at[
                    bidx, rank_f, jnp.clip(qt_f, 0, mcfg.qt_cap - 1)].add(
                    aligned.astype(hdt))[:, :SD])
            qcsum = jnp.cumsum(qthist, axis=-1).astype(jnp.int32)
            nq = qcsum[..., -1]
            k0 = (mcfg.time_quantile
                  * nq.astype(jnp.float32)).astype(jnp.int32)
            k1 = jnp.maximum(
                0, ((1.0 - mcfg.time_quantile) * nq.astype(jnp.float32))
                .astype(jnp.int32) - 1)
            mn = jnp.argmax(qcsum >= (k0 + 1)[..., None], axis=-1)
            mx = jnp.argmax(qcsum >= (k1 + 1)[..., None], axis=-1)
            min_ts.append(jnp.where(nq > 0, mn, 0).astype(jnp.int32))
            max_ts.append(jnp.where(nq > 0, mx, 0).astype(jnp.int32))
        else:
            min_ts.append(jnp.zeros((B, SD), jnp.int32))
            max_ts.append(jnp.zeros((B, SD), jnp.int32))
    filt = jnp.stack(filts, axis=-1)                      # (B, SD, Mc)
    min_t = jnp.stack(min_ts, axis=-1)
    max_t = jnp.stack(max_ts, axis=-1)

    # 6. rank rows over (candidate, mode) pairs (shared helper)
    return _rank_rows(cand_ids, cand_raw, cand_valid, mode_bin, mode_ok,
                      filt, min_t, max_t, mcfg)


def _rank_rows(cand_ids, cand_raw, cand_valid, mode_bin, mode_ok, filt,
               min_t, max_t, mcfg: MatchConfig):
    """Rank (candidate, mode) rows: count-desc, stable on (candidate rank,
    mode bin asc) — the oracle's append order — filter, optional
    sort-by-time, truncate to max_returns.  All inputs (B, SD, Mc)."""
    B, SD, Mc = filt.shape
    R = SD * Mc
    flat = lambda a: a.reshape(B, R)  # noqa: E731
    keep = flat(cand_valid[:, :, None] & mode_ok
                & (filt >= mcfg.threshcount))
    filt_r = flat(filt)
    mode_r = flat(mode_bin)
    min_r, max_r = flat(min_t), flat(max_t)
    ids_r = flat(jnp.broadcast_to(cand_ids[:, :, None], (B, SD, Mc)))
    raw_r = flat(jnp.broadcast_to(cand_raw[:, :, None], (B, SD, Mc)))
    rank_r = flat(jnp.broadcast_to(
        jnp.arange(SD, dtype=jnp.int32)[None, :, None], (B, SD, Mc)))
    iota_r = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[None, :], (B, R))
    k_first = jnp.where(keep, 0, 1).astype(jnp.int32)
    if mcfg.sort_by_time:
        keys = (k_first, jnp.where(keep, mode_r, _I32MAX), -filt_r,
                rank_r, mode_r, iota_r)
    else:
        keys = (k_first, -filt_r, rank_r, mode_r, iota_r)
    # sort only the keys (the last, unique key doubles as the permutation)
    # and gather the payloads — a much smaller comparator than a variadic
    # 10-operand sort (compile-size matters on this target)
    *_, perm = jax.lax.sort(keys, num_keys=len(keys))
    sel = perm[:, : mcfg.max_returns]
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)  # noqa: E731
    r_ids, r_filt, r_mode, r_raw, r_min, r_max, r_keep = (
        take(ids_r), take(filt_r), take(mode_r), take(raw_r),
        take(min_r), take(max_r), take(keep.astype(jnp.int32)))
    # rows past n_results are don't-cares; zero them so every core
    # (hist / sorted / sharded) returns bit-identical arrays
    kb = r_keep.astype(bool)
    z = lambda a: jnp.where(kb, a, 0)  # noqa: E731
    return {
        "ids": z(r_ids),
        "filtcount": z(r_filt),
        "mode_dt": z(r_mode - mcfg.qt_cap),
        "rawcount": z(r_raw),
        "min_t": z(r_min),
        "max_t": z(r_max),
        "rvalid": kb,
        "n_results": jnp.minimum(jnp.sum(keep, axis=1), mcfg.max_returns),
    }


def _vss(sorted2d: jax.Array, q2d: jax.Array, side: str) -> jax.Array:
    """Row-wise searchsorted: (B, N) sorted rows x (B, M) queries."""
    return jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side=side, method="sort")
    )(sorted2d, q2d)


class _Runs(NamedTuple):
    """Run structure of a sorted (B, H) key array: for every position, the
    index of its run's first element (`start`) and one past its run's last
    element (`end`).  Runs = maximal blocks of equal keys.  Built with two
    scans — no searchsorted (each `_vss` call hides a (B, 2H) sort, and on
    TPU wide sorts are compute-bound at ~5x their bandwidth estimate)."""
    start: jax.Array
    end: jax.Array

    @classmethod
    def of(cls, keys_sorted: jax.Array) -> "_Runs":
        B, H = keys_sorted.shape
        iota = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.int32)[None], (B, H))
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             keys_sorted[:, 1:] != keys_sorted[:, :-1]], axis=1)
        a = jnp.where(first, iota, H)
        nxt_incl = jnp.flip(jax.lax.cummin(jnp.flip(a, 1), axis=1), 1)
        end = jnp.concatenate(
            [nxt_incl[:, 1:], jnp.full((B, 1), H, jnp.int32)], axis=1)
        start = jax.lax.cummax(jnp.where(first, iota, 0), axis=1)
        return cls(start=start, end=end)


def _shifted(a: jax.Array, o: int, fill) -> jax.Array:
    """s[:, i] = a[:, i + o] with `fill` outside — static-offset neighbor
    view (two concat slices; no gather, no roll wraparound)."""
    if o == 0:
        return a
    B = a.shape[0]
    pad = jnp.full((B, abs(o)), fill, a.dtype)
    if o > 0:
        return jnp.concatenate([a[:, o:], pad], axis=1)
    return jnp.concatenate([pad, a[:, :o]], axis=1)


def match_core_sorted(table: jax.Array, counts: jax.Array,
                      hashesperid: jax.Array, qtimes: jax.Array,
                      qhashes: jax.Array, qvalid: jax.Array,
                      tcfg: DT.TableConfig, mcfg: MatchConfig):
    """Single-device voting with NO histogram-sized buffers: the
    compacted run-length (RLE) core.

    The hist-based match_core materializes (B, SD, maxtime + qt_cap)
    integer buffers and builds them with a scatter-add that serializes on
    conflicting indices — measured as the single largest op of a config-5
    match batch (docs/DESIGN.md "What bounds matching").  This core never
    leaves the hit domain.  After the (rank, bin) key sort, one more
    2-operand sort COMPACTS the distinct (rank, bin) runs to the front of
    the row (run starts carry ascending distinct keys; non-starts become
    inert sentinels).  On the compacted array, bins within a rank are
    strictly increasing, so every ±W bin window spans at most W array
    positions per side — all windowed quantities become static shifted
    adds/maxes (pure VPU work, no scatter, no gather):

      * windowed-sum mode (approx): the +/-W smeared histogram is
        piecewise constant between event points, and its first masked
        argmax is always at p = max(dtmin, d - W) for some run bin d — so
        evaluating Σ counts over runs within [p-W, p+W] (offsets
        -2W..+W) at every run finds the exact oracle mode (tie ->
        smallest p).
      * raw-histogram local maxima (exact): a run is a mode candidate iff
        its count >= every neighbor run count within ±W bins (offsets
        -W..+W) and >= threshcount — the oracle find_modes.
      * exact unique-row count U(d) = C(d) - D(d): C = windowed run-count
        sum (shifts again); D = #consecutive same-(query-row, candidate)
        sorted hit pairs whose windows both cover d (coverage-interval
        telescoping identity; see match_core), counted by searchsorted
        over the sorted pair-interval endpoints.

    Per-candidate winners come from a segmented running max over the
    rank-contiguous compacted rows (associative_scan; packed (score, pos)
    int32 keys) — no (B, H) -> (B, SD) scatter anywhere.

    Everything is O(B*H log H) with H = Q * depth, independent of maxtime
    and query length.  Bit-identical to match_core / the oracle (shared
    tests); match_batch dispatches here for single-device matching, while
    the sharded path keeps the psum-combinable hist core.
    """
    B, Q = qhashes.shape
    SD = mcfg.search_depth
    W = mcfg.window
    Mc = max(1, mcfg.modes_cap) if mcfg.exact_count else 1
    nbins = tcfg.maxtime + mcfg.qt_cap
    # widest combined keys: pair intervals use span = nbins + 2W + 2 and
    # qtime keys use qspan = qt_cap + 1 <= span, both scaled by rank <= SD+1
    assert (SD + 2) * (nbins + 2 * W + 2) < 2**31, \
        "rank/bin key exceeds int32 (reduce search_depth or query length)"

    ids3, dts3, hv3 = DT.get_hits_local(
        table, counts, qtimes, qhashes, qvalid, tcfg, 0)
    H = Q * tcfg.depth
    id_f = ids3.reshape(B, H)
    dt_f = dts3.reshape(B, H)
    v_f = hv3.reshape(B, H)
    qt_f = jnp.broadcast_to(qtimes[:, :, None],
                            (B, Q, tcfg.depth)).reshape(B, H)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, H))

    (cand_ids, cand_raw, cand_valid, rank_f) = _select_candidates(
        id_f, v_f, bidx, hashesperid, mcfg)

    dtbin_f = jnp.clip(dt_f + mcfg.qt_cap, 0, nbins - 1)
    # one combined (rank, bin) key; invalid hits (rank SD) sort last
    k_s = jax.lax.sort(rank_f * nbins + dtbin_f)
    iota_h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))
    runs = _Runs.of(k_s)
    first = iota_h == runs.start
    c_run = (runs.end - runs.start).astype(jnp.int32)

    # compaction: run starts carry distinct ascending keys, so one
    # 2-operand sort moves (key, count) of every run to the front of the
    # row in key order; non-starts become inert sentinel entries
    SENT = (SD + 1) * nbins
    ks_c, cnt_c = jax.lax.sort(
        (jnp.where(first, k_s, SENT), jnp.where(first, c_run, 0)),
        num_keys=1)
    rk_c = ks_c // nbins                      # SD+1 on the sentinel tail
    db_c = ks_c % nbins
    val_c = rk_c < SD
    rk_g = jnp.minimum(rk_c, SD)              # safe gather index

    # per-run dtmin of its candidate: bins ascend within a rank segment,
    # so dtmin = db at the segment's first run, propagated by cummax
    rfirst = jnp.concatenate(
        [jnp.ones((B, 1), bool), rk_c[:, 1:] != rk_c[:, :-1]], axis=1)
    start_idx = jax.lax.cummax(jnp.where(rfirst, iota_h, 0), axis=1)
    dtmin_c = jnp.take_along_axis(db_c, start_idx, axis=1)

    # static shifted neighbor views (shared by every windowed quantity)
    _offsets = range(-2 * W, W + 1) if not mcfg.exact_count \
        else range(-W, W + 1)
    _nb = {o: (_shifted(rk_c, o, SD + 1), _shifted(db_c, o, -nbins),
               _shifted(cnt_c, o, 0)) for o in _offsets if o != 0}

    def window_sum(center):
        """Σ run counts with same rank and |bin - center| <= W, per run.
        `center` ∈ [db - 2W_left, db + W_right] per the offset range."""
        s = jnp.where((db_c >= center - W) & (db_c <= center + W),
                      cnt_c, 0)
        for o, (rk_o, db_o, cn_o) in _nb.items():
            m = (rk_o == rk_c) & (db_o >= center - W) & (db_o <= center + W)
            s = s + jnp.where(m, cn_o, 0)
        return s

    # Per-candidate (max score, then min pos among maxima) reductions.
    # A scatter formulation would issue (B, H) updates into (B, SD+1)
    # slots — extreme index conflicts, which TPU scatter serializes on.
    # Rank segments are contiguous on the compacted row: a segmented
    # running max (associative_scan with boundary resets) + one gather at
    # each segment's end computes the same reduction scatter-free.  The
    # (score, pos) pair packs into one int32 key when score < 2^16 and
    # pos < 2^15 (score·2^15 + (2^15−1−pos): max key ⇔ max score then min
    # pos) — guaranteed for ordinary shapes (score ≤ H hits, pos < nbins);
    # otherwise fall back to the scatter form.
    _PACK_OK = H < (1 << 16) and nbins <= (1 << 15)
    if _PACK_OK:
        # segment-end position per rank (shared by every reduction):
        # end(r) = (#runs with rank <= r) - 1, via one searchsorted
        ranks_q = jnp.broadcast_to(
            jnp.arange(SD + 1, dtype=jnp.int32)[None], (B, SD + 1))
        seg_end = _vss(rk_c, ranks_q, "right") - 1
        seg_ok = (seg_end >= 0) & (jnp.take_along_axis(
            rk_c, jnp.maximum(seg_end, 0), axis=1) == ranks_q)

        def _seg_combine(x, y):
            f1, v1 = x
            f2, v2 = y
            return f2 | f1, jnp.where(f2, v2, jnp.maximum(v1, v2))

    def per_rank_best(score, pos, valid):
        """Per candidate: max score, then min pos among the maxima.
        Returns (best_score (B, SD+1), best_pos (B, SD+1))."""
        if _PACK_OK:
            key = jnp.where(valid,
                            score * (1 << 15) + ((1 << 15) - 1 - pos), -1)
            _f, run = jax.lax.associative_scan(
                _seg_combine, (rfirst, key), axis=1)
            kend = jnp.where(seg_ok, jnp.take_along_axis(
                run, jnp.maximum(seg_end, 0), axis=1), -1)
            best = jnp.where(kend >= 0, kend >> 15, -1)
            bpos = jnp.where(kend >= 0,
                             (1 << 15) - 1 - (kend & ((1 << 15) - 1)),
                             _I32MAX)
            return best, bpos
        s_safe = jnp.where(valid, score, -1)
        best2 = jnp.full((B, SD + 2), -1, jnp.int32).at[
            bidx, rk_g].max(jnp.where(val_c | ~valid, s_safe, -1))
        best = best2[:, : SD + 1]
        is_best = valid & (s_safe == best2[bidx, rk_g])
        bpos = jnp.full((B, SD + 2), _I32MAX, jnp.int32).at[
            bidx, rk_g].min(jnp.where(is_best, pos, _I32MAX))[:, : SD + 1]
        return best, bpos

    if not mcfg.exact_count:
        # approx: evaluate the smear at every event point p = max(dtmin,
        # d - W); winner per candidate = (max count, then smallest p).
        # p ∈ [d - W, d], so runs in [p - W, p + W] lie within 2W
        # positions left / W right of the run — covered by _offsets
        p_c = jnp.maximum(dtmin_c, db_c - W)
        s_c = window_sum(p_c)
        best, bpos = per_rank_best(s_c, p_c, val_c)
        filt = best[:, :SD, None]
        mode_bin = bpos[:, :SD, None]
        mode_ok = jnp.ones((B, SD, 1), bool)
    else:
        # a run is a mode candidate iff count >= every same-rank neighbor
        # run count within ±W bins (at most W distinct bins per side =
        # at most W positions per side on the compacted row)
        nb_max = jnp.zeros((B, H), jnp.int32)
        c_cov = cnt_c
        for o, (rk_o, db_o, cn_o) in _nb.items():
            m = (rk_o == rk_c) & (jnp.abs(db_o - db_c) <= W)
            nb_max = jnp.maximum(nb_max, jnp.where(m, cn_o, 0))
            c_cov = c_cov + jnp.where(m, cn_o, 0)
        ismode = (val_c & (cnt_c >= max(1, mcfg.threshcount))
                  & (cnt_c >= nb_max))

        # U(d) = C(d) - D(d) at each mode candidate (see docstring):
        # C = windowed hit count at d (c_cov above); D = #consecutive
        # same-(query-row, candidate) pairs from the per-row sort (a query
        # hash's hits are contiguous rows of the (B, Q, depth) layout)
        # whose ±W windows both cover d
        rank3 = rank_f.reshape(B, Q, tcfg.depth)
        dtbin3 = dtbin_f.reshape(B, Q, tcfg.depth)
        r3s, d3s = jax.lax.sort((rank3, dtbin3), num_keys=2)
        pair_ok = ((r3s[..., :-1] == r3s[..., 1:])
                   & (r3s[..., 1:] < SD)
                   & (d3s[..., 1:] - d3s[..., :-1] <= 2 * W))
        NP = Q * (tcfg.depth - 1)
        span = nbins + 2 * W + 2
        pr = jnp.where(pair_ok, r3s[..., 1:], SD).reshape(B, NP)
        # intersection interval in bin space, +W offset so starts >= 0
        pstart = (pr * span
                  + jnp.where(pair_ok, d3s[..., 1:] - W,
                              0).reshape(B, NP) + W)
        pend = (pr * span
                + jnp.where(pair_ok, d3s[..., :-1] + W,
                            0).reshape(B, NP) + W)
        ps_sorted = jax.lax.sort(pstart)
        pe_sorted = jax.lax.sort(pend)
        mq = rk_g * span + db_c + W
        d_cov = (_vss(ps_sorted, mq, "right")
                 - _vss(pe_sorted, mq - 1, "right")).astype(jnp.int32)
        u_c = c_cov - d_cov

        mode_bins, mode_oks, mode_filts = [], [], []
        if mcfg.sort_by_time:
            # earliest valid modes, mirroring match_core (see comment there)
            avail = ismode & (u_c >= mcfg.threshcount)
            for _s in range(Mc):
                tscore = jnp.where(avail, nbins - 1 - db_c, -1)
                best, bpos = per_rank_best(tscore, db_c, avail)
                chosen = avail & (db_c == bpos[bidx, rk_g])
                # the chosen run is unique per rank — the same segmented
                # reduction recovers its U value scatter-free
                uval, _ = per_rank_best(u_c, db_c, chosen)
                mode_bins.append(bpos[:, :SD])
                mode_oks.append(best[:, :SD] >= 0)
                mode_filts.append(uval[:, :SD])
                avail = avail & ~chosen
        else:
            score = jnp.where(ismode, u_c, -1)
            for _s in range(Mc):
                best, bpos = per_rank_best(score, db_c, score >= 0)
                mode_bins.append(bpos[:, :SD])
                mode_oks.append(best[:, :SD] > 0)
                mode_filts.append(best[:, :SD])
                chosen = (score >= 0) & (score == best[bidx, rk_g]) \
                    & (db_c == bpos[bidx, rk_g])
                score = jnp.where(chosen, -1, score)
        mode_bin = jnp.stack(mode_bins, axis=-1)
        mode_ok = jnp.stack(mode_oks, axis=-1)
        filt = jnp.stack(mode_filts, axis=-1)

    # optional time range per (candidate, mode slot): quantiles of aligned
    # query times via one sort per slot (no (B, SD, qt_cap) scatter)
    if mcfg.find_time_range:
        min_ts, max_ts = [], []
        qspan = mcfg.qt_cap + 1
        ranks_sd = jnp.broadcast_to(
            jnp.arange(SD, dtype=jnp.int32)[None, :], (B, SD))
        for s in range(Mc):
            mb_s = mode_bin[:, :, s]
            aligned = (v_f & (rank_f < SD)
                       & (jnp.abs(dtbin_f - mb_s[
                           bidx, jnp.minimum(rank_f, SD - 1)]) <= W))
            qkey = jnp.where(
                aligned, rank_f * qspan + jnp.clip(qt_f, 0, mcfg.qt_cap - 1),
                (SD + 1) * qspan)
            qk_sorted = jax.lax.sort(qkey)
            lo = _vss(qk_sorted, ranks_sd * qspan, "left")
            hi = _vss(qk_sorted, ranks_sd * qspan + qspan - 1, "right")
            nq = (hi - lo).astype(jnp.int32)
            k0 = (mcfg.time_quantile
                  * nq.astype(jnp.float32)).astype(jnp.int32)
            k1 = jnp.maximum(
                0, ((1.0 - mcfg.time_quantile) * nq.astype(jnp.float32))
                .astype(jnp.int32) - 1)
            gmin = jnp.take_along_axis(
                qk_sorted, jnp.minimum(lo + k0, H - 1), axis=1)
            gmax = jnp.take_along_axis(
                qk_sorted, jnp.minimum(lo + k1, H - 1), axis=1)
            min_ts.append(jnp.where(nq > 0, gmin - ranks_sd * qspan,
                                    0).astype(jnp.int32))
            max_ts.append(jnp.where(nq > 0, gmax - ranks_sd * qspan,
                                    0).astype(jnp.int32))
        min_t = jnp.stack(min_ts, axis=-1)
        max_t = jnp.stack(max_ts, axis=-1)
    else:
        min_t = jnp.zeros((B, SD, Mc), jnp.int32)
        max_t = jnp.zeros((B, SD, Mc), jnp.int32)

    return _rank_rows(cand_ids, cand_raw, cand_valid, mode_bin, mode_ok,
                      filt, min_t, max_t, mcfg)


@functools.partial(jax.jit, static_argnames=("tcfg", "mcfg"))
def match_batch_sorted(table: jax.Array, counts: jax.Array,
                       hashesperid: jax.Array, qtimes: jax.Array,
                       qhashes: jax.Array, qvalid: jax.Array,
                       tcfg: DT.TableConfig, mcfg: MatchConfig):
    """Single-device matching via the compacted-RLE core — O(B*H) memory
    independent of maxtime and query length, and the FAST single-device
    path since the round-4 rewrite (same-session A/B on the v5e chip,
    B=128 approx: 1343 vs 629 q/s at 1k tracks, 1287 vs 1172 at 100k —
    the hist core's scatter-add wall is gone).  Bit-identical to
    match_batch_hist across the full option matrix (test_multimode); the
    shard_map path keeps the psum-combinable hist core."""
    return match_core_sorted(table, counts, hashesperid, qtimes, qhashes,
                             qvalid, tcfg, mcfg)


@functools.partial(jax.jit, static_argnames=("tcfg", "mcfg"))
def match_batch_hist(table: jax.Array, counts: jax.Array,
                     hashesperid: jax.Array, qtimes: jax.Array,
                     qhashes: jax.Array, qvalid: jax.Array,
                     tcfg: DT.TableConfig, mcfg: MatchConfig):
    """Single-device matching via the histogram core (same computation the
    shard_map path runs; the fast path at ordinary shapes)."""
    return match_core(table, counts, hashesperid, qtimes, qhashes, qvalid,
                      tcfg, mcfg)


@functools.partial(jax.jit, static_argnames=("tcfg", "mcfg", "core"))
def match_batch_packed(table: jax.Array, counts: jax.Array,
                       hashesperid: jax.Array, qtimes: jax.Array,
                       qhashes: jax.Array, qvalid: jax.Array,
                       tcfg: DT.TableConfig, mcfg: MatchConfig,
                       core: str = "hist"):
    """Matching with the result dict packed into ONE (B, max_returns, 7)
    int32 array: [id, filtcount, mode_dt, rawcount, min_t, max_t, rvalid].

    One device buffer = one host fetch.  The dict form costs 8 separate
    D2H transfers; on a directly-attached chip that is sub-ms, but through
    a relay each fetch pays a round-trip, and the fetches — not the voting
    — dominated the measured per-batch latency.  n_results is recoverable
    client-side as rvalid.sum() (invalid rows sort last and are zeroed)."""
    fn = match_core_sorted if core == "sorted" else match_core
    out = fn(table, counts, hashesperid, qtimes, qhashes, qvalid,
             tcfg, mcfg)
    return jnp.stack(
        [out["ids"], out["filtcount"], out["mode_dt"], out["rawcount"],
         out["min_t"], out["max_t"], out["rvalid"].astype(jnp.int32)],
        axis=-1)


# default single-device entry: the compacted-RLE core (fastest at every
# measured scale since round 4, and maxtime-independent in memory); the
# sharded path keeps the psum-combinable hist core
match_batch = match_batch_sorted
