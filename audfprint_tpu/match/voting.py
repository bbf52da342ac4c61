"""Batched on-device time-offset histogram voting (the Matcher core).

TPU-native reformulation of the reference's per-candidate Python loop
(audfprint_match.py match_hashes/_approx_match_counts/_exact_match_counts,
SURVEY §2.3.5 / §3.2): all queries in a batch and all `search_depth`
candidates are processed together as scatter-adds into a
(batch, candidate, dt-bin) histogram, a cumulative-sum window smear, and
masked argmax reductions — no data-dependent shapes anywhere.

Bit-compat contract vs audfprint_tpu.oracle.match.match_hashes:
  * candidate ranking: raw count / hashesperid, ties -> lower id (top_k)
  * mode: first argmax of the +/-window-smeared dt histogram over the
    candidate's own dt domain (bins below the candidate's min dt masked,
    matching the oracle's bincount starting at dtmin)
  * approx count: smeared value at mode; exact count: #distinct query rows
    with an aligned hit (query rows are pre-deduped, so distinct row ==
    distinct (qtime, hash) — the oracle's _unique_match_hashes)
  * time range: integer-index quantiles over the aligned-hit qtime multiset

The core is written against *combiner* callables so the identical code runs
single-device (identity combiners) and table-sharded under shard_map (psum /
pmin / pmax over the mesh axis; see audfprint_tpu.parallel.sharded) with
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

    @classmethod
    def from_params(cls, mp: P.MatcherParams, qt_cap: int = 2048,
                    n_ids_cap: int = 4096) -> "MatchConfig":
        return cls(window=mp.window, threshcount=mp.threshcount,
                   max_returns=mp.max_returns, search_depth=mp.search_depth,
                   exact_count=mp.exact_count,
                   find_time_range=mp.find_time_range,
                   time_quantile=mp.time_quantile,
                   sort_by_time=mp.sort_by_time,
                   qt_cap=qt_cap, n_ids_cap=n_ids_cap)


def match_core(table: jax.Array, counts: jax.Array, hashesperid: jax.Array,
               qtimes: jax.Array, qhashes: jax.Array, qvalid: jax.Array,
               tcfg: DT.TableConfig, mcfg: MatchConfig,
               bucket_lo: jax.Array | int = 0,
               sum_all: Callable = _ident,
               min_all: Callable = _ident,
               max_all: Callable = _ident):
    """Voting over a (possibly shard-local) table.

    `sum_all`/`min_all`/`max_all` combine per-shard partials across the mesh
    axis (identity when unsharded).  Returns dict of (B, max_returns) arrays:
    ids, filtcount, mode_dt, rawcount, min_t, max_t, rvalid; plus n_results.
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
    qi_f = jnp.broadcast_to(
        jnp.arange(Q, dtype=jnp.int32)[None, :, None],
        (B, Q, tcfg.depth)).reshape(B, H)
    qt_f = jnp.broadcast_to(qtimes[:, :, None],
                            (B, Q, tcfg.depth)).reshape(B, H)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, H))

    # 1. raw counts per id (combined across shards), weighted top-SD
    id_safe = jnp.where(v_f, jnp.minimum(id_f, mcfg.n_ids_cap - 1), 0)
    raw = sum_all(jnp.zeros((B, mcfg.n_ids_cap), jnp.int32)
                  .at[bidx, id_safe].add(v_f.astype(jnp.int32)))
    hpi = jnp.maximum(1, hashesperid).astype(jnp.float32)
    wc = jnp.where(raw > 0, raw.astype(jnp.float32) / hpi[None, :], -1.0)
    # top-SD via one stable sort (lax.top_k's k=100 partial-sort lowering
    # measured slower); stable ascending sort of -wc keeps ties id-asc,
    # exactly top_k's tie rule
    iota_ids = jnp.broadcast_to(
        jnp.arange(mcfg.n_ids_cap, dtype=jnp.int32)[None, :],
        (B, mcfg.n_ids_cap))
    negw_s, ids_s = jax.lax.sort((-wc, iota_ids), num_keys=1,
                                 is_stable=True)
    candw = -negw_s[:, :SD]
    cand_ids = ids_s[:, :SD]
    cand_valid = candw > 0.0
    cand_raw = jnp.take_along_axis(raw, cand_ids, axis=1)

    # 2. hit -> candidate rank (SD = "not a candidate" bucket)
    rankmap = jnp.full((B, mcfg.n_ids_cap), SD, jnp.int32)
    rankmap = rankmap.at[
        jnp.arange(B)[:, None], cand_ids].set(
        jnp.broadcast_to(jnp.arange(SD, dtype=jnp.int32)[None, :], (B, SD)))
    rank_f = jnp.where(v_f, rankmap[bidx, id_safe], SD)

    # 3. per-candidate dt histogram (combined) + smear + masked argmax
    dtbin_f = jnp.clip(dt_f + mcfg.qt_cap, 0, nbins - 1)
    hist = sum_all(jnp.zeros((B, SD + 1, nbins), jnp.int32).at[
        bidx, rank_f, dtbin_f].add(v_f.astype(jnp.int32))[:, :SD])
    # +/-W box smear: direct (2W+1)-tap shifted sum — far cheaper than a
    # full cumsum over the bins axis for small W (exact integer math)
    zpad = jnp.zeros((B, SD, W), jnp.int32)
    histp = jnp.concatenate([zpad, hist, zpad], axis=-1)
    smeared = histp[..., : nbins]
    for o in range(1, 2 * W + 1):
        smeared = smeared + histp[..., o: o + nbins]
    # smeared[d] == sum over hist[d-W .. d+W]
    dtmin = min_all(jnp.full((B, SD + 1), _I32MAX, jnp.int32).at[
        bidx, rank_f].min(jnp.where(v_f, dtbin_f, _I32MAX))[:, :SD])
    binid = jnp.arange(nbins, dtype=jnp.int32)
    sm = jnp.where(binid[None, None, :] >= dtmin[..., None], smeared, -1)
    mode_bin = jnp.argmax(sm, axis=-1).astype(jnp.int32)    # first max
    filt_approx = jnp.max(sm, axis=-1)

    # 4. aligned hits and counts (per-shard stats combined after the fact)
    aligned = (v_f
               & (jnp.abs(dtbin_f
                          - mode_bin[bidx, jnp.minimum(rank_f, SD - 1)]) <= W)
               & (rank_f < SD))
    if mcfg.exact_count:
        anyq = max_all(jnp.zeros((B, SD + 1, Q), jnp.int32).at[
            bidx, rank_f, qi_f].max(aligned.astype(jnp.int32))[:, :SD])
        filt = jnp.sum(anyq, axis=-1)
    else:
        filt = filt_approx

    # 5. aligned-qtime quantile range
    if mcfg.find_time_range:
        qthist = sum_all(jnp.zeros((B, SD + 1, mcfg.qt_cap), jnp.int32).at[
            bidx, rank_f, jnp.clip(qt_f, 0, mcfg.qt_cap - 1)].add(
            aligned.astype(jnp.int32))[:, :SD])
        qcsum = jnp.cumsum(qthist, axis=-1)
        nq = qcsum[..., -1]
        k0 = (mcfg.time_quantile * nq.astype(jnp.float32)).astype(jnp.int32)
        k1 = jnp.maximum(
            0, ((1.0 - mcfg.time_quantile) * nq.astype(jnp.float32))
            .astype(jnp.int32) - 1)
        min_t = jnp.argmax(qcsum >= (k0 + 1)[..., None], axis=-1)
        max_t = jnp.argmax(qcsum >= (k1 + 1)[..., None], axis=-1)
        min_t = jnp.where(nq > 0, min_t, 0).astype(jnp.int32)
        max_t = jnp.where(nq > 0, max_t, 0).astype(jnp.int32)
    else:
        min_t = jnp.zeros((B, SD), jnp.int32)
        max_t = jnp.zeros((B, SD), jnp.int32)

    # 6. rank rows: count-desc (stable on candidate rank), filter, optional
    #    sort-by-time, truncate to max_returns
    keep = cand_valid & (filt >= mcfg.threshcount)
    rank_iota = jnp.broadcast_to(
        jnp.arange(SD, dtype=jnp.int32)[None, :], (B, SD))
    k_first = jnp.where(keep, 0, 1).astype(jnp.int32)
    if mcfg.sort_by_time:
        keys = (k_first, jnp.where(keep, mode_bin, _I32MAX), -filt, rank_iota)
    else:
        keys = (k_first, -filt, rank_iota)
    # sort only the keys (the last, unique key doubles as the permutation)
    # and gather the payloads — a much smaller comparator than a variadic
    # 10-operand sort (compile-size matters on this target)
    *_, perm = jax.lax.sort(keys, num_keys=len(keys))
    sel = perm[:, : mcfg.max_returns]
    take = lambda a: jnp.take_along_axis(a, sel, axis=1)  # noqa: E731
    r_ids, r_filt, r_mode, r_raw, r_min, r_max, r_keep = (
        take(cand_ids), take(filt), take(mode_bin), take(cand_raw),
        take(min_t), take(max_t), take(keep.astype(jnp.int32)))
    return {
        "ids": r_ids,
        "filtcount": r_filt,
        "mode_dt": r_mode - mcfg.qt_cap,
        "rawcount": r_raw,
        "min_t": r_min,
        "max_t": r_max,
        "rvalid": r_keep.astype(bool),
        "n_results": jnp.minimum(jnp.sum(keep, axis=1), mcfg.max_returns),
    }


@functools.partial(jax.jit, static_argnames=("tcfg", "mcfg"))
def match_batch(table: jax.Array, counts: jax.Array, hashesperid: jax.Array,
                qtimes: jax.Array, qhashes: jax.Array, qvalid: jax.Array,
                tcfg: DT.TableConfig, mcfg: MatchConfig):
    """Single-device matching over the full table (see match_core)."""
    return match_core(table, counts, hashesperid, qtimes, qhashes, qvalid,
                      tcfg, mcfg)
