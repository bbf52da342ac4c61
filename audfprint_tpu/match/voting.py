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
                   # oracle parity requires exactly modes_cap >= max_returns
                   # (see match_core: every mode discarded by the per-
                   # candidate cap is dominated by >= modes_cap kept rows of
                   # its own candidate under the final global order, so it
                   # can never place in the top max_returns); deriving the
                   # minimum keeps the exact-count Mc loop as short as the
                   # requested output allows (round 4: Mc 4 -> 1 at default
                   # -x 1 — the loop is a measured chunk of the exact tail)
                   modes_cap=max(1, mp.max_returns))


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


class _Runs(NamedTuple):
    """Run structure of a sorted (B, H) key array: for every position, the
    index of its run's first element (`start`) and one past its run's last
    element (`end`).  Runs = maximal blocks of equal keys.  Built with two
    scans — no searchsorted (a row-wise searchsorted hides a (B, 2H) sort,
    and on TPU wide sorts are compute-bound at ~5x their bandwidth
    estimate)."""
    start: jax.Array
    end: jax.Array

    @classmethod
    def of(cls, keys_sorted: jax.Array) -> "_Runs":
        B = keys_sorted.shape[0]
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             keys_sorted[:, 1:] != keys_sorted[:, :-1]], axis=1)
        return cls.from_first(first)

    @classmethod
    def from_first(cls, first: jax.Array) -> "_Runs":
        B, H = first.shape
        iota = jnp.broadcast_to(
            jnp.arange(H, dtype=jnp.int32)[None], (B, H))
        a = jnp.where(first, iota, H)
        nxt_incl = jnp.flip(jax.lax.cummin(jnp.flip(a, 1), axis=1), 1)
        end = jnp.concatenate(
            [nxt_incl[:, 1:], jnp.full((B, 1), H, jnp.int32)], axis=1)
        start = jax.lax.cummax(jnp.where(first, iota, 0), axis=1)
        return cls(start=start, end=end)


def _seg_spread(first: jax.Array, *vals: jax.Array) -> tuple:
    """Segmented forward propagation: out_i = vals_i where first_i else
    out_{i-1} — i.e. every position receives its segment's FIRST value.
    One associative scan; associative by the standard last-reset-wins
    combine.  The scatter/gather-free primitive behind dtmin, per-hit
    candidate metadata, and segment-final broadcasts."""

    def comb(x, y):
        fx, *vx = x
        fy, *vy = y
        return (fx | fy, *[jnp.where(fy, b, a) for a, b in zip(vx, vy)])

    out = jax.lax.associative_scan(comb, (first, *vals), axis=1)
    return tuple(out[1:])


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
                      tcfg: DT.TableConfig, mcfg: MatchConfig,
                      hpi_plane: jax.Array | None = None):
    """Single-device voting: the FUSED compacted run-length (RLE) core.

    The hist-based match_core materializes (B, SD, maxtime + qt_cap)
    integer buffers and builds them with a scatter-add that serializes on
    conflicting indices — measured as the single largest op of a config-5
    match batch (docs/DESIGN.md "What bounds matching").  This core never
    leaves the hit domain, and since the round-4 fusion pass it runs the
    WHOLE match on two wide sorts (TPU sorts are the cost unit here —
    each (B, H) sort measured ~12 ms at config-5 shapes through the
    relay, and the pre-fusion core issued five):

      F1  one (id, bin) 2-key sort of all hits.  Its id-run structure
          drives candidate selection (raw counts = run lengths); its
          (id, bin)-run structure drives the voting.
      F2  one (wc desc, id desc) 3-operand sort over the id-run STARTS —
          upstream's np.argsort(wcounts)[::-1] candidate rule
          (audfprint_match.py:~180 _best_count_ids).  Each candidate
          carries its F1 hit-segment [start, start+raw) out of this sort,
          so NO (B, n_ids_cap) rankmap is ever built — at 1M tracks the
          rankmap alone was a 537 MB buffer and the measured reason the
          1M-track rate trailed the 100k rate.

    (id, bin) runs are then COMPACTED to the front of the row by a
    unique-index scatter (each run start's target slot = its run index —
    no conflicts, no extra sort).  On the compacted array, bins within an
    id segment are strictly increasing, so every ±W bin window spans at
    most W array positions per side — all windowed quantities become
    static shifted adds/maxes (pure VPU work):

      * windowed-sum mode (approx): the +/-W smeared histogram is
        piecewise constant between event points, and its first masked
        argmax is always at p = max(dtmin, d - W) for some run bin d — so
        evaluating Σ counts over runs within [p-W, p+W] (offsets
        -2W..+W) at every run finds the exact oracle mode (tie ->
        smallest p).
      * raw-histogram local maxima (exact): a run is a mode candidate iff
        its count >= every neighbor run count within ±W bins (offsets
        -W..+W) and >= threshcount — the oracle find_modes
        (audfprint_match.py:~120).
      * exact unique-row count U(d) = C(d) - D(d): C = windowed run-count
        sum (shifts again); D = #consecutive same-(query-row, id) sorted
        hit pairs whose windows both cover d (coverage-interval
        telescoping identity; see match_core), counted by ONE merged
        event/run 3-key sort: +1 events at (id, dhi-W), -1 events at
        (id, dlo+W+1), runs tagged to sort after same-bin events; a
        cumsum of the merged weights read back at the run positions IS
        D at every run.  (Replaces two pair-endpoint sorts plus two
        hidden searchsorted sorts of the pre-fusion core.)

    Per-id winners come from a segmented lexicographic-max running scan
    ((score desc, bin asc) with segment-boundary resets) read at each
    candidate's segment end — no (B, H) -> (B, SD) scatter, no packing
    range limits.  Everything is O(B*H log H) with H = Q * depth,
    independent of maxtime, query length, AND track count.  Bit-identical
    to match_core / the oracle (shared tests); match_batch dispatches
    here for single-device matching, and the sharded path reuses the
    same vote via an all_to_all hit exchange (sharded._vote_rle callers).
    """
    B, Q = qhashes.shape
    N = mcfg.n_ids_cap
    nbins = tcfg.maxtime + mcfg.qt_cap

    ids3, dts3, hv3 = DT.get_hits_local(
        table, counts, qtimes, qhashes, qvalid, tcfg, 0)
    H = Q * tcfg.depth
    id_f = ids3.reshape(B, H)
    dt_f = dts3.reshape(B, H)
    v_f = hv3.reshape(B, H)

    dtbin_f = jnp.clip(dt_f + mcfg.qt_cap, 0, nbins - 1)
    idk = jnp.where(v_f, jnp.minimum(id_f, N - 1), N)   # invalid sorts last
    qt_f = None
    if mcfg.find_time_range:
        qt_f = jnp.clip(
            jnp.broadcast_to(qtimes[:, :, None],
                             (B, Q, tcfg.depth)).reshape(B, H),
            0, mcfg.qt_cap - 1)
    hpi_f = None
    if hpi_plane is not None:
        hpi_f = DT.gather_plane(hpi_plane, qhashes, tcfg, 0).reshape(B, H)
    return _vote_rle(idk, dtbin_f, qt_f, hpi_f, hashesperid,
                     Q, tcfg, mcfg)


def _vote_rle(idk: jax.Array, dtbin_f: jax.Array,
              qt_f: jax.Array | None, hpi_f: jax.Array | None,
              hashesperid: jax.Array | None, qrows: int,
              tcfg: DT.TableConfig, mcfg: MatchConfig):
    """The compacted-RLE vote on flat hit arrays (see match_core_sorted's
    docstring for the algorithm).  Split out so the sharded path can run
    the IDENTICAL vote after an all_to_all hit exchange (each device votes
    its own query slice over the union of every shard's hits —
    parallel.sharded.sharded_match_rle; bit-identity argument there).

    idk:     (B, H) hit track ids, invalid slots = n_ids_cap (sorts last)
    dtbin_f: (B, H) hit dt bins (dt + qt_cap, clipped to [0, nbins))
    qt_f:    (B, H) hit query frame (clipped to qt_cap) — required iff
             mcfg.find_time_range
    hpi_f:   (B, H) per-hit hashesperid payload (DT.build_hpi_plane), or
             None to gather from the `hashesperid` id-domain vector
    qrows:   number of query-hash rows: H == qrows * depth, and each row's
             depth hits are contiguous (the exact-count consecutive-pair
             structure) — Q single-device, ndev*Q after the exchange

    Results are invariant to the ORDER of hits within a (B-row, id, bin)
    group: counts are multiset quantities, same-id hpi payloads are equal
    by construction, aligned qtimes are re-sorted ascending before the
    quantile reads, and every sort here is stable with deterministic
    tie keys — which is what makes the exchanged layout bit-identical to
    the single-device layout (test_sharded pins it)."""
    B, H = idk.shape
    SD = mcfg.search_depth
    W = mcfg.window
    Mc = max(1, mcfg.modes_cap) if mcfg.exact_count else 1
    N = mcfg.n_ids_cap
    nbins = tcfg.maxtime + mcfg.qt_cap
    assert qrows * tcfg.depth == H
    iota_h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))

    # F1: all hits sorted by (id, bin); qtime rides along only when the
    # time-range path will need it.  When the caller staged a per-entry
    # hpi plane (DT.build_hpi_plane), each hit's hashesperid rides the
    # sort as one more payload operand — replacing the (B, H) random
    # word-gather hpi[s_id] that measured ~10 ms of a ~27 ms device-side
    # config-5 batch (the single largest op; benchmarks/topk_probe.py
    # --stages) with a ~2 ms contiguous row-gather + a cheap extra
    # payload.  Identical values either way (a track's hpi is fixed at
    # store time), so results stay bit-identical.
    ops = [idk, dtbin_f]
    if mcfg.find_time_range:
        ops.append(qt_f)
    if hpi_f is not None:
        ops.append(hpi_f)
    srt = jax.lax.sort(tuple(ops), num_keys=2)
    s_id, s_db = srt[0], srt[1]
    s_qt = srt[2] if mcfg.find_time_range else None
    s_hpi = srt[-1] if hpi_f is not None else None

    # --- candidate selection on the id-run starts (same keys and tie
    # rule as _select_candidates_hits; bit-identical outputs) ---
    idruns = _Runs.of(s_id)
    c_h = (idruns.end - idruns.start).astype(jnp.int32)  # raw count per hit
    id_first = iota_h == idruns.start
    if s_hpi is not None:
        hpi_h = jnp.maximum(1, s_hpi).astype(jnp.float32)
    else:
        hpi = jnp.maximum(1, hashesperid).astype(jnp.float32)
        hpi_h = hpi[jnp.minimum(s_id, N - 1)]
    wc = c_h.astype(jnp.float32) / hpi_h
    inf = jnp.float32(jnp.inf)
    k1 = jnp.where(id_first & (s_id < N), -wc, inf)
    k1s, negid_s, pos_s = jax.lax.sort((k1, -s_id, iota_h), num_keys=2)
    S = min(SD, H)
    pad = ((0, 0), (0, SD - S))
    cand_valid = jnp.pad(k1s[:, :S] < inf, pad)
    cand_ids = jnp.where(cand_valid, jnp.pad(-negid_s[:, :S], pad), N - 1)
    cand_start = jnp.where(cand_valid, jnp.pad(pos_s[:, :S], pad), 0)
    cand_raw = jnp.where(
        cand_valid, jnp.take_along_axis(c_h, cand_start, axis=1), 0)
    cand_last = jnp.maximum(cand_start + cand_raw - 1, 0)

    # --- compact (id, bin) runs to the row front.  Run starts keep their
    # (ascending) positions as 1-key sort keys, everything else gets a
    # distinct past-the-end key — measured on-chip, a 4-operand 1-key
    # (B, H) sort is ~free while a (B, H, 3) scatter-set costs ~63 ms at
    # config-5 shapes (benchmarks/tail_probe.py); TPU scatters issue
    # element-at-a-time, sorts stream on the VPU. ---
    run_first = jnp.concatenate(
        [jnp.ones((B, 1), bool),
         (s_id[:, 1:] != s_id[:, :-1]) | (s_db[:, 1:] != s_db[:, :-1])],
        axis=1)
    rruns = _Runs.from_first(run_first)
    c_run = (rruns.end - rruns.start).astype(jnp.int32)
    run_idx = jnp.cumsum(run_first.astype(jnp.int32), axis=1) - 1
    FILL_ID = N + 1
    keep_r = run_first & (s_id < N)
    _ck, cid_c, db_c, cnt_c = jax.lax.sort(
        (jnp.where(keep_r, iota_h, H + iota_h),
         jnp.where(keep_r, s_id, FILL_ID),
         jnp.where(keep_r, s_db, -(1 << 28)),
         jnp.where(keep_r, c_run, 0)), num_keys=1)
    val_c = cid_c < N

    # id-segment structure on the compacted row.  Per-position segment
    # values come from segmented copy scans, never (B, H) gathers (each
    # take_along_axis at this shape measured ~14 ms — same probe).
    seg_first = jnp.concatenate(
        [jnp.ones((B, 1), bool), cid_c[:, 1:] != cid_c[:, :-1]], axis=1)
    seg_last = jnp.concatenate(
        [seg_first[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    (dtmin_c,) = _seg_spread(seg_first, db_c)
    # compacted index of each candidate's LAST run = run_idx at its last
    # hit — the read point for every per-segment reduction below
    cend_c = jnp.take_along_axis(run_idx, cand_last, axis=1)

    # static shifted neighbor views (shared by every windowed quantity)
    _offsets = range(-2 * W, W + 1) if not mcfg.exact_count \
        else range(-W, W + 1)
    _nb = {o: (_shifted(cid_c, o, -1), _shifted(db_c, o, -(1 << 28)),
               _shifted(cnt_c, o, 0)) for o in _offsets if o != 0}

    def seg_best(score, pos, valid):
        """Segmented running lexicographic max of (score, then min pos):
        value at a segment's end = the segment's best.  Pure VPU scan —
        no scatter, no packing range limits."""
        sc = jnp.where(valid, score, jnp.int32(-(1 << 30)))
        ps = jnp.where(valid, pos, _I32MAX)

        def comb(x, y):
            f1, s1, p1 = x
            f2, s2, p2 = y
            take = f2 | (s2 > s1) | ((s2 == s1) & (p2 < p1))
            return (f1 | f2, jnp.where(take, s2, s1),
                    jnp.where(take, p2, p1))

        _f, bs, bp = jax.lax.associative_scan(
            comb, (seg_first, sc, ps), axis=1)
        return bs, bp

    def seg_final(*vals):
        """Broadcast each segment's LAST value to every position of the
        segment (reverse copy scan — replaces a (B, H) gather)."""
        rf = jnp.flip(seg_last, 1)
        out = _seg_spread(rf, *[jnp.flip(v, 1) for v in vals])
        return tuple(jnp.flip(o, 1) for o in out)

    def at_cands(a, fill):
        return jnp.where(cand_valid,
                         jnp.take_along_axis(a, cend_c, axis=1), fill)

    if not mcfg.exact_count:
        # approx: evaluate the smear at every event point p = max(dtmin,
        # d - W); winner per id = (max count, then smallest p).  p ∈
        # [d - W, d], so runs in [p - W, p + W] lie within 2W positions
        # left / W right of the run — covered by _offsets
        p_c = jnp.maximum(dtmin_c, db_c - W)
        s_c = cnt_c                               # own run always in range
        for o, (cid_o, db_o, cn_o) in _nb.items():
            m = ((cid_o == cid_c) & (db_o >= p_c - W) & (db_o <= p_c + W))
            s_c = s_c + jnp.where(m, cn_o, 0)
        bs, bp = seg_best(s_c, p_c, val_c)
        filt = at_cands(bs, -1)[:, :, None]
        mode_bin = at_cands(bp, 0)[:, :, None]
        mode_ok = jnp.ones((B, SD, 1), bool)
    else:
        # a run is a mode candidate iff count >= every same-id neighbor
        # run count within ±W bins (at most W distinct bins per side =
        # at most W positions per side on the compacted row)
        nb_max = jnp.zeros((B, H), jnp.int32)
        c_cov = cnt_c
        for o, (cid_o, db_o, cn_o) in _nb.items():
            m = (cid_o == cid_c) & (jnp.abs(db_o - db_c) <= W)
            nb_max = jnp.maximum(nb_max, jnp.where(m, cn_o, 0))
            c_cov = c_cov + jnp.where(m, cn_o, 0)
        ismode = (val_c & (cnt_c >= max(1, mcfg.threshcount))
                  & (cnt_c >= nb_max))

        # D via ONE merged event/run sort (see docstring).  Pairs come
        # from a per-query-row (id, bin) sort along the depth axis (a
        # query hash's hits are contiguous rows of the (B, Q, depth)
        # layout), exactly the oracle's consecutive-hit structure.
        id3 = idk.reshape(B, qrows, tcfg.depth)
        d3 = dtbin_f.reshape(B, qrows, tcfg.depth)
        i3s, d3s = jax.lax.sort((id3, d3), num_keys=2)
        pair_ok = ((i3s[..., :-1] == i3s[..., 1:])
                   & (i3s[..., 1:] < N)
                   & (d3s[..., 1:] - d3s[..., :-1] <= 2 * W))
        Dm1 = tcfg.depth - 1
        NP = qrows * Dm1

        def merged_cov(pid, dlo, dhi, wplus, NPx: int):
            """Open-interval coverage of every compacted run bin by the
            (B, NPx) pair events -> d_cov (B, H).  One merged event/run
            sort + a 1-key prefix-sum readback sort (round 4)."""
            M = 2 * NPx + H
            ids_m = jnp.concatenate([pid, pid, cid_c], axis=1)
            # sort-operand count is the cost knob on TPU wide sorts, so
            # the (bin, tag) key pair packs into ONE int32 (bins stay
            # < 2^16 incl. the +/-W event offsets; tag = events-before-
            # runs at equal bin) and (position, weight) into another
            # ((pos << 2) | (w + 1)): a 3-operand 2-key sort replaces
            # the 5-operand 3-key original (round 4; on-chip
            # voting_probe), with an unpacked fallback past int32 range
            # (ADVICE r4)
            bins_m = jnp.concatenate(
                [(dhi - W) * 2, (dlo + W + 1) * 2, db_c * 2 + 1], axis=1)
            if (M << 2) < (1 << 31):
                posw_m = jnp.concatenate(
                    [((jnp.arange(2 * NPx, dtype=jnp.int32)[None] + H)
                      << 2)
                     + jnp.concatenate([wplus + 1, 1 - wplus], axis=1),
                     jnp.broadcast_to(
                         (jnp.arange(H, dtype=jnp.int32)[None] << 2) + 1,
                         (B, H))],
                    axis=1)
                _im, _bm, posw_s = jax.lax.sort(
                    (ids_m, bins_m, posw_m), num_keys=2)
                csum = jnp.cumsum((posw_s & 3) - 1, axis=1)
                pos_srt = posw_s >> 2
            else:
                pos_m = jnp.concatenate(
                    [jnp.broadcast_to(
                        jnp.arange(2 * NPx, dtype=jnp.int32)[None] + H,
                        (B, 2 * NPx)),
                     jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None],
                                      (B, H))], axis=1)
                w_m = jnp.concatenate(
                    [wplus + 1, 1 - wplus,
                     jnp.ones((B, H), jnp.int32)], axis=1)
                _im, _bm, pos_srt, w_s = jax.lax.sort(
                    (ids_m, bins_m, pos_m, w_m), num_keys=2)
                csum = jnp.cumsum(w_s - 1, axis=1)
            # read the prefix sums back at the run positions with one
            # more 1-key sort (runs carry pos < H, events H + i): the
            # first H sorted slots are exactly the runs in compacted
            # order — a (B, M) scatter would cost ~3x the whole vote
            # tail (tail_probe).  csum is a non-negative open-interval
            # count <= NP, so when (pos, csum) packs into int32 the
            # readback is a 1-operand sort.
            cbits = max(1, NP.bit_length())
            if (M << cbits) < (1 << 31):
                packed = (pos_srt << cbits) | csum
                return jax.lax.sort(packed)[:, :H] & ((1 << cbits) - 1)
            _pp, d_sorted = jax.lax.sort((pos_srt, csum), num_keys=1)
            return d_sorted[:, :H]

        # Event compaction (round 5, VERDICT r4 #8): real duplicate
        # pairs — the same query hash hitting the same track twice
        # within 2W bins — are RARE, yet the merged sort paid for all
        # 2*NP event slots (~2/3 of its 3H width was sentinels).  A
        # cheap sort along the depth-1 axis (small-axis sorts are ~5x
        # cheaper per element than row-wide ones) compacts each query
        # row's ok pairs to the front; E_r slots per row ride the
        # merged sort (width 2*qrows*E_r + H ~ 1.16H instead of 3H).
        # Rows can hold up to depth-1 ok pairs, so a lax.cond falls
        # back to the FULL-width path whenever any row overflows E_r —
        # results are bit-identical either way (non-ok fillers carry
        # weight 0 under id N; the ok-pair event multiset is exact).
        E_r = min(Dm1, max(4, 2 * W + 4))
        if E_r >= Dm1:
            pid = jnp.where(pair_ok, i3s[..., 1:], N).reshape(B, NP)
            dlo = d3s[..., :-1].reshape(B, NP)
            dhi = d3s[..., 1:].reshape(B, NP)
            wplus = pair_ok.reshape(B, NP).astype(jnp.int32)
            d_cov = merged_cov(pid, dlo, dhi, wplus, NP)
        else:
            pid3 = jnp.where(pair_ok, i3s[..., 1:], N)
            dlo3 = d3s[..., :-1]
            dhi3 = d3s[..., 1:]
            iota_d = jnp.arange(Dm1, dtype=jnp.int32)
            okkey = jnp.where(pair_ok, iota_d, Dm1)
            kb = (tcfg.maxtime + mcfg.qt_cap).bit_length()
            if 2 * kb < 31:       # pack (dlo, dhi): one payload operand
                dpk3 = (dlo3 << kb) | dhi3
                ks, pid_s, dpk_s = jax.lax.sort(
                    (okkey, pid3, dpk3), num_keys=1)
                dlo_s = dpk_s >> kb
                dhi_s = dpk_s & ((1 << kb) - 1)
            else:
                ks, pid_s, dlo_s, dhi_s = jax.lax.sort(
                    (okkey, pid3, dlo3, dhi3), num_keys=1)
            over = jnp.any(ks[..., E_r] < Dm1) if E_r < Dm1 else False
            NPc = qrows * E_r

            def compact_cov(_):
                wp = (ks[..., :E_r] < Dm1).astype(jnp.int32)
                return merged_cov(
                    pid_s[..., :E_r].reshape(B, NPc),
                    dlo_s[..., :E_r].reshape(B, NPc),
                    dhi_s[..., :E_r].reshape(B, NPc),
                    wp.reshape(B, NPc), NPc)

            def full_cov(_):
                return merged_cov(
                    pid3.reshape(B, NP), dlo3.reshape(B, NP),
                    dhi3.reshape(B, NP),
                    pair_ok.reshape(B, NP).astype(jnp.int32), NP)

            d_cov = jax.lax.cond(over, full_cov, compact_cov, None)
        u_c = c_cov - d_cov

        mode_bins, mode_oks, mode_filts = [], [], []
        if mcfg.sort_by_time:
            # earliest valid modes, mirroring match_core (see comment
            # there): time-sorted output truncates to the EARLIEST rows
            avail = ismode & (u_c >= mcfg.threshcount)
            for _s in range(Mc):
                tscore = jnp.where(avail, nbins - 1 - db_c, -1)
                bs, bp = seg_best(tscore, db_c, avail)
                (bp_full,) = seg_final(bp)
                chosen = avail & (db_c == bp_full)
                # the chosen run is unique per segment — one more scan
                # recovers its U value scatter-free
                us, _up = seg_best(jnp.where(chosen, u_c, -1), db_c, chosen)
                mode_bins.append(at_cands(bp, 0))
                mode_oks.append(at_cands(bs, -1) >= 0)
                mode_filts.append(at_cands(us, -1))
                avail = avail & ~chosen
        else:
            score = jnp.where(ismode, u_c, -1)
            for _s in range(Mc):
                bs, bp = seg_best(score, db_c, score >= 0)
                mode_bins.append(at_cands(bp, 0))
                bv = at_cands(bs, -1)
                mode_oks.append(bv > 0)
                mode_filts.append(bv)
                bs_full, bp_full = seg_final(bs, bp)
                chosen = ((score >= 0) & (score == bs_full)
                          & (db_c == bp_full))
                score = jnp.where(chosen, -1, score)
        mode_bin = jnp.stack(mode_bins, axis=-1)
        mode_ok = jnp.stack(mode_oks, axis=-1)
        filt = jnp.stack(mode_filts, axis=-1)

    # optional time range per (candidate, mode slot): ONE (id, qtime)
    # 2-key re-sort of the F1 row per slot puts each id segment's ALIGNED
    # qtimes ascending at the segment front, so the quantile elements are
    # direct gathers at cand_start + k — no per-rank keys, no searchsorted
    if mcfg.find_time_range:
        ranks_sd = jnp.arange(SD, dtype=jnp.int32)
        s_valid = s_id < N
        QBIG = jnp.int32(1 << 29)
        MBFILL = jnp.int32(-(1 << 28))      # never within W of a real bin
        id_first_f1 = jnp.concatenate(
            [jnp.ones((B, 1), bool), s_id[:, 1:] != s_id[:, :-1]], axis=1)
        min_ts, max_ts = [], []
        for s in range(Mc):
            # per-hit mode bin of its own candidate: seed the SD segment
            # starts (a small unique scatter), spread by segment —
            # non-candidate segments keep MBFILL and never align
            mb_seed = jnp.full((B, H), MBFILL, jnp.int32).at[
                jnp.arange(B)[:, None],
                jnp.where(cand_valid, cand_start, H + ranks_sd[None])].set(
                mode_bin[:, :, s], mode="drop", unique_indices=True)
            (mb_h,) = _seg_spread(id_first_f1, mb_seed)
            aligned = s_valid & (jnp.abs(s_db - mb_h) <= W)
            _ids2, q_sorted = jax.lax.sort(
                (s_id, jnp.where(aligned, s_qt, QBIG)), num_keys=2)
            ca = jnp.cumsum(aligned.astype(jnp.int32), axis=1)
            hi = jnp.take_along_axis(ca, cand_last, axis=1)
            lo = jnp.where(
                cand_start > 0,
                jnp.take_along_axis(ca, jnp.maximum(cand_start - 1, 0),
                                    axis=1), 0)
            nq = jnp.where(cand_valid, hi - lo, 0)
            k0 = (mcfg.time_quantile
                  * nq.astype(jnp.float32)).astype(jnp.int32)
            k1 = jnp.maximum(
                0, ((1.0 - mcfg.time_quantile) * nq.astype(jnp.float32))
                .astype(jnp.int32) - 1)
            gmin = jnp.take_along_axis(
                q_sorted, jnp.minimum(cand_start + k0, H - 1), axis=1)
            gmax = jnp.take_along_axis(
                q_sorted, jnp.minimum(cand_start + k1, H - 1), axis=1)
            min_ts.append(jnp.where(nq > 0, gmin, 0).astype(jnp.int32))
            max_ts.append(jnp.where(nq > 0, gmax, 0).astype(jnp.int32))
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
                       tcfg: DT.TableConfig, mcfg: MatchConfig,
                       hpi_plane: jax.Array | None = None):
    """Single-device matching via the compacted-RLE core — O(B*H) memory
    independent of maxtime and query length, and the FAST single-device
    path since the round-4 rewrite (same-session A/B on the v5e chip,
    B=128 approx: 1343 vs 629 q/s at 1k tracks, 1287 vs 1172 at 100k —
    the hist core's scatter-add wall is gone).  Bit-identical to
    match_batch_hist across the full option matrix (test_multimode); the
    shard_map path keeps the psum-combinable hist core.  hpi_plane: see
    match_core_sorted / DT.build_hpi_plane."""
    return match_core_sorted(table, counts, hashesperid, qtimes, qhashes,
                             qvalid, tcfg, mcfg, hpi_plane)


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
                       core: str = "hist",
                       hpi_plane: jax.Array | None = None):
    """Matching with the result dict packed into ONE (B, max_returns, 7)
    int32 array: [id, filtcount, mode_dt, rawcount, min_t, max_t, rvalid].

    One device buffer = one host fetch.  The dict form costs 8 separate
    D2H transfers; on a directly-attached chip that is sub-ms, but through
    a relay each fetch pays a round-trip, and the fetches — not the voting
    — dominated the measured per-batch latency.  n_results is recoverable
    client-side as rvalid.sum() (invalid rows sort last and are zeroed)."""
    if core == "sorted":
        out = match_core_sorted(table, counts, hashesperid, qtimes, qhashes,
                                qvalid, tcfg, mcfg, hpi_plane)
    else:
        out = match_core(table, counts, hashesperid, qtimes, qhashes,
                         qvalid, tcfg, mcfg)
    return jnp.stack(
        [out["ids"], out["filtcount"], out["mode_dt"], out["rawcount"],
         out["min_t"], out["max_t"], out["rvalid"].astype(jnp.int32)],
        axis=-1)


# default single-device entry: the compacted-RLE core (fastest at every
# measured scale since round 4, and maxtime-independent in memory); the
# sharded path keeps the psum-combinable hist core
match_batch = match_batch_sorted
