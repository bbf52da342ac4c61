"""Multi-chip scaling: bucket-sharded table + data-parallel analysis.

SURVEY §2.2 / §5 "Distributed communication backend": the (2^hashbits, depth)
inverted index is sharded by bucket range across the mesh axis 'd' (bucket h
lives on device h >> (hashbits - log2 ndev)) — the EP-style "route to the
owning shard" pattern.  Queries are replicated (they are tiny: ~1k hashes);
each shard gathers hits from its own bucket range and the per-candidate
partials are combined with XLA collectives (psum/pmin/pmax over ICI):

  store: replicated hash streams -> each shard masks to its range and runs
         the same deterministic-reservoir scatter (device_table.store_batch_
         local) -> no collectives at all.
  match: local raw-count partials -> psum -> identical candidate set on all
         shards -> local dt-histogram / coverage-diff partials -> psum ->
         identical voting everywhere -> replicated results.  Bit-identical
         to single-device (a query hash's hits all live on the shard owning
         its bucket, so the exact-count consecutive-pair correction is
         shard-local by construction).

Analysis (fingerprinting) is pure data parallelism over the batch axis
(SURVEY §2.2 row 1): jit with a P('d', None) input sharding; no collectives.

The reference's `merge` (shard-then-combine, its only distribution story)
becomes `sharded_store` of the other table's entry streams = resharding.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as PS

try:  # jax >= 0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from audfprint_tpu.index import device_table as DT
from audfprint_tpu.match import voting


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("d",))


def shard_table(mesh: Mesh, table, counts):
    """Place a (n_buckets, depth[, 2]) table bucket-sharded over the mesh
    (trailing axes replicate — wide tables' plane axis included)."""
    ts = NamedSharding(mesh, PS("d", None))
    cs = NamedSharding(mesh, PS("d"))
    return jax.device_put(table, ts), jax.device_put(counts, cs)


def upload_sharded(ht, mesh: Mesh):
    """Host HashTable -> bucket-sharded device (table, counts, cfg) —
    the one place that knows wide tables split into uint32 planes before
    sharding (shared by ShardedStore and the Matcher)."""
    cfg = DT.config_for(ht)
    if cfg.n_buckets % mesh.devices.size != 0:
        raise ValueError(
            f"hashbits={ht.hashbits} table not divisible over "
            f"{mesh.devices.size} devices")
    host = DT.split_wide(ht.table) if cfg.wide else ht.table
    table, counts = shard_table(mesh, host, ht.counts)
    return table, counts, cfg


def empty_sharded_table(mesh: Mesh, cfg: DT.TableConfig):
    table, counts = DT.empty_table(cfg)
    return shard_table(mesh, table, counts)


def sharded_store_fn(mesh: Mesh, cfg: DT.TableConfig):
    """Returns jitted (table, counts, times, hashes, valid, ids) -> updated
    sharded (table, counts).  Inputs times/hashes/valid/ids replicated."""
    ndev = mesh.devices.size
    assert cfg.n_buckets % ndev == 0
    n_local = cfg.n_buckets // ndev

    def _local(table, counts, t, h, v, ids):
        lo = jax.lax.axis_index("d") * n_local
        return DT.store_batch_local(table, counts, t, h, v, ids, cfg, lo)

    f = shard_map(_local, mesh=mesh,
                  in_specs=(PS("d", None), PS("d"), PS(), PS(), PS(), PS()),
                  out_specs=(PS("d", None), PS("d")))
    return jax.jit(f, donate_argnums=(0, 1))


def sharded_match_fn(mesh: Mesh, tcfg: DT.TableConfig,
                     mcfg: voting.MatchConfig):
    """Returns jitted (table, counts, hashesperid, qt, qh, qv) -> result dict
    (replicated).  Bit-identical to voting.match_batch on the merged table."""
    ndev = mesh.devices.size
    assert tcfg.n_buckets % ndev == 0
    n_local = tcfg.n_buckets // ndev

    def _local(table, counts, hpi, qt, qh, qv):
        lo = jax.lax.axis_index("d") * n_local
        return voting.match_core(
            table, counts, hpi, qt, qh, qv, tcfg, mcfg, bucket_lo=lo,
            **_combiners(ndev))

    f = shard_map(_local, mesh=mesh,
                  in_specs=(PS("d", None), PS("d"), PS(), PS(), PS(), PS()),
                  out_specs=PS(),
                  check_vma=False)
    return jax.jit(f)


def _combiners(ndev: int) -> dict:
    """Collective combiners for voting.match_core under shard_map.  A
    1-device mesh has nothing to combine: identity combiners let
    match_core take its hit-domain candidate-selection fast path
    (bit-identical either way).  gather_all enables the sharded
    hit-domain selection (VERDICT r2 #2) — per-shard local top-SD merged
    with one tiny (B, ndev*SD) sort instead of the full id-domain sort."""
    if ndev == 1:
        return dict(sum_all=voting._ident, min_all=voting._ident)
    return dict(
        sum_all=functools.partial(jax.lax.psum, axis_name="d"),
        min_all=functools.partial(jax.lax.pmin, axis_name="d"),
        gather_all=functools.partial(jax.lax.all_gather, axis_name="d",
                                     axis=1, tiled=True))


def _rle_exchange_core(table, counts, hpi, plane, qt, qh, qv,
                       tcfg: DT.TableConfig, mcfg: "voting.MatchConfig",
                       ndev: int, n_local: int, with_plane: bool):
    """Per-device body of the RLE all_to_all mesh match (see
    sharded_match_rle_packed_cached's docstring): local bucket-range hit
    gather for ALL queries -> ONE all_to_all (split batch, concat hits)
    -> single-device _vote_rle on the local B/ndev query slice ->
    all_gather of the packed (B, max_returns, 7) results.  Shared by the
    two-stage mesh matcher and the fused fingerprint+match serving graph
    (VERDICT r4 #3)."""
    import jax.numpy as jnp

    N = mcfg.n_ids_cap
    nbins = tcfg.maxtime + mcfg.qt_cap
    lo = jax.lax.axis_index("d") * n_local
    ids3, dts3, hv3 = DT.get_hits_local(
        table, counts, qt, qh, qv, tcfg, lo)
    B, Q = qh.shape
    H = Q * tcfg.depth
    id_f = ids3.reshape(B, H)
    v_f = hv3.reshape(B, H)
    idk = jnp.where(v_f, jnp.minimum(id_f, N - 1), N)
    dtb = jnp.clip(dts3.reshape(B, H) + mcfg.qt_cap, 0, nbins - 1)
    ops = [idk, dtb]
    if mcfg.find_time_range:
        ops.append(jnp.clip(
            jnp.broadcast_to(qt[:, :, None],
                             (B, Q, tcfg.depth)).reshape(B, H),
            0, mcfg.qt_cap - 1))
    if with_plane:
        ops.append(DT.gather_plane(plane, qh, tcfg, lo).reshape(B, H))
    if ndev > 1:
        ops = [jax.lax.all_to_all(o, "d", split_axis=0, concat_axis=1,
                                  tiled=True) for o in ops]
    qt_x = ops[2] if mcfg.find_time_range else None
    hpi_x = ops[-1] if with_plane else None
    out = voting._vote_rle(ops[0], ops[1], qt_x, hpi_x, hpi,
                           ndev * Q, tcfg, mcfg)
    packed = jnp.stack(
        [out["ids"], out["filtcount"], out["mode_dt"], out["rawcount"],
         out["min_t"], out["max_t"], out["rvalid"].astype(jnp.int32)],
        axis=-1)
    if ndev > 1:
        packed = jax.lax.all_gather(packed, "d", axis=0, tiled=True)
    return packed


@functools.lru_cache(maxsize=64)
def sharded_match_rle_packed_cached(mesh: Mesh, tcfg: DT.TableConfig,
                                    mcfg: "voting.MatchConfig",
                                    with_plane: bool = False):
    """Sharded matching via the compacted-RLE core (the round-4 default
    single-device vote) — an all_to_all hit exchange instead of the hist
    core's bin-domain psum.

    The psum path combines per-shard partials as (B, SD+1,
    maxtime + qt_cap) histograms — at config-5 shapes that is a ~1 GB
    collective per batch (int32, B=128, SD=100, nbins=18k), plus the
    scatter-add wall the RLE core was built to remove.  But the hits
    themselves are tiny: a query hash's hits all live on the shard owning
    its bucket, so the union of all shards' (B, H) hit arrays IS the
    single-device hit multiset.  So instead of voting in the bin domain
    and summing, exchange the hits and vote once:

      1. each shard row-gathers its local hits for ALL queries (EP-style:
         zero communication — the table rows never move)
      2. ONE all_to_all (split the batch axis, concatenate the hit axis):
         each device now holds ALL shards' hits for ITS B/ndev query
         slice — comm is O(B * H * ops) int32 words (a few MB), replacing
         the O(B * SD * nbins) psum
      3. each device runs voting._vote_rle on its (B/ndev, ndev*H) slice —
         per-device sort volume B*H elements, the SAME as the
         single-device core at equal B, with none of the hist buffers
      4. all_gather the packed (B/ndev, max_returns, 7) results (KBs)

    Bit-identity to the single-device core: the exchanged rows hold the
    same hit multiset per query (plus ndev-1 rows' worth of invalid
    padding, which sorts last and is masked everywhere), and _vote_rle's
    results are invariant to hit order within a (row, id, bin) group —
    see its docstring.  The exact-count consecutive-pair structure is
    also preserved: each (shard, query-hash) block of `depth` slots
    arrives contiguous, and a hash's real hits all sit in exactly one
    shard's block (its bucket owner), so the per-row pair sort sees the
    identical hit set (reference semantics: audfprint_match.py:~200
    _exact_match_counts).  B must be a multiple of ndev (the Matcher pads
    the tail rows with empty queries).

    with_plane adds the per-entry hashesperid plane (DT.build_hpi_plane,
    sharded like the table) as one more exchanged payload operand.
    """
    ndev = mesh.devices.size
    assert tcfg.n_buckets % ndev == 0
    n_local = tcfg.n_buckets // ndev

    def _body(table, counts, hpi, plane, qt, qh, qv):
        return _rle_exchange_core(table, counts, hpi, plane, qt, qh, qv,
                                  tcfg, mcfg, ndev, n_local, with_plane)

    if with_plane:
        _local = _body
        extra = (PS("d", None),)
    else:
        def _local(table, counts, hpi, qt, qh, qv):
            return _body(table, counts, hpi, None, qt, qh, qv)
        extra = ()

    f = shard_map(_local, mesh=mesh,
                  in_specs=(PS("d", None), PS("d"), PS()) + extra
                  + (PS(), PS(), PS()),
                  out_specs=PS(),
                  check_vma=False)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def sharded_fused_match_cached(mesh: Mesh, pcfg, tcfg: DT.TableConfig,
                               mcfg: "voting.MatchConfig", qcap: int,
                               with_plane: bool = False):
    """ONE shard_map jit from raw audio to packed match results on a
    mesh (VERDICT r4 #3) — the multi-device analog of
    matcher._fused_match_graph:

      DP fingerprint of the local batch slice -> all_gather the (tiny)
      query hashes -> the RLE all_to_all hit exchange + local vote
      (_rle_exchange_core) -> packed results, replicated.

    Returns jitted (table, counts, hpi[, plane], audio, lengths) ->
    (B, max_returns + 1, 7) int32 with the same row[-1] host-eligibility
    readback protocol as _fused_match_graph ([n_unique_hashes,
    max_frame, effective_qcap, 0...]) so match_fused_resolve re-routes
    over-cap rows through the two-stage path unchanged.  B must be a
    multiple of ndev (the Matcher pads with empty rows)."""
    import jax.numpy as jnp

    from audfprint_tpu.ops import pipeline as pipe

    ndev = mesh.devices.size
    assert tcfg.n_buckets % ndev == 0
    n_local = tcfg.n_buckets // ndev

    def _body(table, counts, hpi, plane, audio, lengths):
        th, cnt = pipe.fingerprint_batch_compact(audio, lengths, pcfg)
        qce = min(qcap, th.shape[1])
        qt_l = th[:, :qce, 0]
        qh_l = th[:, :qce, 1]
        iota = jnp.arange(qce, dtype=jnp.int32)[None]
        qv_l = iota < jnp.minimum(cnt, qce)[:, None]
        maxt_l = jnp.max(jnp.where(qv_l, qt_l, 0), axis=1)
        if ndev > 1:
            ag = functools.partial(jax.lax.all_gather, axis_name="d",
                                   axis=0, tiled=True)
            qt, qh, qv = ag(qt_l), ag(qh_l), ag(qv_l)
            cnt_g, maxt = ag(cnt), ag(maxt_l)
        else:
            qt, qh, qv, cnt_g, maxt = qt_l, qh_l, qv_l, cnt, maxt_l
        packed = _rle_exchange_core(table, counts, hpi, plane, qt, qh, qv,
                                    tcfg, mcfg, ndev, n_local, with_plane)
        zero = jnp.zeros_like(cnt_g)
        extra = jnp.stack([cnt_g, maxt, jnp.full_like(cnt_g, qce),
                           zero, zero, zero, zero], axis=-1)
        return jnp.concatenate([packed, extra[:, None, :]], axis=1)

    if with_plane:
        _local = _body
        extra_spec = (PS("d", None),)
    else:
        def _local(table, counts, hpi, audio, lengths):
            return _body(table, counts, hpi, None, audio, lengths)
        extra_spec = ()

    f = shard_map(_local, mesh=mesh,
                  in_specs=(PS("d", None), PS("d"), PS()) + extra_spec
                  + (PS("d", None), PS("d")),
                  out_specs=PS(),
                  check_vma=False)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def sharded_match_packed_cached(mesh: Mesh, tcfg: DT.TableConfig,
                                mcfg: "voting.MatchConfig"):
    """Like sharded_match_fn but returns the single packed
    (B, max_returns, 7) int32 result buffer (one D2H fetch — the Matcher's
    transfer format, voting.match_batch_packed) and caches the jitted
    callable per (mesh, tcfg, mcfg) so repeated Matcher calls against the
    same shapes never recompile."""
    import jax.numpy as jnp

    ndev = mesh.devices.size
    assert tcfg.n_buckets % ndev == 0
    n_local = tcfg.n_buckets // ndev

    def _local(table, counts, hpi, qt, qh, qv):
        lo = jax.lax.axis_index("d") * n_local
        out = voting.match_core(
            table, counts, hpi, qt, qh, qv, tcfg, mcfg, bucket_lo=lo,
            **_combiners(ndev))
        return jnp.stack(
            [out["ids"], out["filtcount"], out["mode_dt"], out["rawcount"],
             out["min_t"], out["max_t"], out["rvalid"].astype(jnp.int32)],
            axis=-1)

    f = shard_map(_local, mesh=mesh,
                  in_specs=(PS("d", None), PS("d"), PS(), PS(), PS(), PS()),
                  out_specs=PS(),
                  check_vma=False)
    return jax.jit(f)


class ShardedStore:
    """Device-resident bucket-sharded store for CLI ingest (VERDICT r2 #1).

    Wraps a host HashTable: `begin()` uploads its table sharded over the
    mesh, `store_chunk()` replays per-file hash streams through the
    deterministic device reservoir (bit-identical to sequential host
    store_vectorized of the same files — shared device_table kernel,
    tested), and `finalize()` downloads the result back into the host
    table, which remains the persistence mirror (.pklz/.afdb).
    """

    def __init__(self, ht, mesh: Mesh):
        self.ht = ht
        self.mesh = mesh
        self.table, self.counts, self.cfg = upload_sharded(ht, mesh)
        self._store = sharded_store_fn(mesh, self.cfg)

    def store_chunk(self, names_hashes: list) -> None:
        """Store [(name, (n,2) int host hashes)] in order; ids assigned via
        the host table's name_to_id (names/hashesperid stay host-managed)."""
        import jax.numpy as jnp

        from audfprint_tpu import params as P

        if not names_hashes:
            return
        B = len(names_hashes)
        L = max(1, max(len(h) for _, h in names_hashes))
        L = P.next_pow2(L, 256)
        Bp = P.next_pow2(B, 8)           # bound compiled (B, L) shapes
        tt = np.zeros((Bp, L), np.int32)
        hh = np.zeros((Bp, L), np.int32)
        vv = np.zeros((Bp, L), bool)
        ids = np.zeros(Bp, np.int32)
        for b, (name, h) in enumerate(names_hashes):
            h = np.asarray(h).reshape(-1, 2)
            id_ = self.ht.name_to_id(name, add_if_missing=True)
            self.ht._check_id_capacity(id_)
            self.ht.hashesperid[id_] += len(h)
            ids[b] = id_
            tt[b, : len(h)] = h[:, 0]
            hh[b, : len(h)] = h[:, 1]
            vv[b, : len(h)] = True
        self.table, self.counts = self._store(
            self.table, self.counts, jnp.asarray(tt), jnp.asarray(hh),
            jnp.asarray(vv), jnp.asarray(ids))

    def finalize(self) -> None:
        """Download device state into the host table (one gather)."""
        self.ht.table = (DT.join_wide(self.table) if self.cfg.wide
                         else np.asarray(self.table))
        self.ht.counts = np.asarray(self.counts)
        self.ht.dirty = True
        self.ht.rev += 1


def resolve_ndev(ndev: int | None) -> int:
    """CLI/Matcher --ndev resolution: explicit value wins; None/0 = auto
    (all local devices).  1 = single-device paths."""
    if ndev:
        return int(ndev)
    return jax.device_count()


def sharded_merge_fn(mesh: Mesh, cfg: DT.TableConfig):
    """Merge-as-resharding: replay another table's stored entries into the
    sharded table (the reference's only distribution story, SURVEY §3.4).

    Returns jitted (table, counts, hashes (N,), entries (N,), valid (N,)) ->
    updated sharded state.  Entries must already carry the id offset; use
    `entry_streams` to extract them from a host HashTable.
    """
    ndev = mesh.devices.size
    assert cfg.n_buckets % ndev == 0
    n_local = cfg.n_buckets // ndev

    def _local(table, counts, h, e, v):
        lo = jax.lax.axis_index("d") * n_local
        return DT.store_packed_local(table, counts, h, e, v, cfg, lo)

    f = shard_map(_local, mesh=mesh,
                  in_specs=(PS("d", None), PS("d"), PS(), PS(), PS()),
                  out_specs=(PS("d", None), PS("d")))
    return jax.jit(f, donate_argnums=(0, 1))


def entry_streams(ht, id_offset: int = 0):
    """Host HashTable -> flat (hashes, entries, valid) replay streams in
    bucket-major, slot order (== the reference merge's replay order).
    Vectorized O(total entries) — shared with HashTable.merge.  Wide
    tables return (N, 2) uint32 (lo, hi) entry planes (the device store's
    wide convention)."""
    from audfprint_tpu.index.hash_table import _stored_entry_streams

    hs, _ranks, es = _stored_entry_streams(ht)
    if getattr(ht, "wide", False):
        es = DT.split_wide(es.astype(np.uint64)
                           + np.uint64(id_offset << ht.maxtimebits))
    else:
        es = (es + np.uint32(id_offset << ht.maxtimebits)).astype(np.uint32)
    return hs.astype(np.int32), es, np.ones(len(hs), bool)


def dp_fingerprint_fn(mesh: Mesh, cfg):
    """Data-parallel fingerprinting: batch axis sharded over 'd'."""
    from audfprint_tpu.ops import pipeline as pipe

    ds = NamedSharding(mesh, PS("d", None))
    ls = NamedSharding(mesh, PS("d"))

    def f(audio, lengths):
        audio = jax.lax.with_sharding_constraint(audio, ds)
        lengths = jax.lax.with_sharding_constraint(lengths, ls)
        return pipe.fingerprint_batch(audio, lengths, cfg)

    return jax.jit(f, in_shardings=(ds, ls))
