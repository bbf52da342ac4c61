"""Device-resident inverted hash index: vectorized store + gather (JAX).

The TPU-native replacement for the reference's Python-loop `HashTable.store`
/ `get_hits` (hash_table.py:~120-240; SURVEY §7 layer 3):

  store  = flatten batch -> stable sort by bucket -> within-bucket rank ->
           insertion position = counts[bucket] + rank -> reservoir slot via
           the deterministic keyed PRNG -> last-wins collision resolution ->
           one scatter.  Bit-identical to the sequential host store for the
           same insertion stream (tested against HashTable.store).

  gather = table[qhash] (Q, depth) + validity mask from counts; decode
           id = entry >> maxtimebits, dt = (entry & timemask) - qtime.

Everything is static-shape; the host `HashTable` remains the canonical
persistence mirror (.pklz), and `to_device`/`to_host` move state across.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from audfprint_tpu import params as P

_C1 = jnp.uint32(0x85EBCA6B)
_C2 = jnp.uint32(0xC2B2AE35)
_GOLDEN = jnp.uint32(0x9E3779B1)


class TableConfig(NamedTuple):
    hashbits: int = P.TABLE_HASHBITS
    depth: int = P.TABLE_DEPTH
    maxtimebits: int = 14
    seed: int = 0
    # id bits of the entry packing.  Default = what fits beside the time
    # field in a uint32 (the reference's packing, SURVEY §2.3.4).  Raising
    # it past that (VERDICT r2 #6: the uint32 cap is to be "honored or
    # consciously raised") switches to WIDE entries: uint64 on host, split
    # (lo, hi) uint32 planes on device — table shape (nb, depth, 2) —
    # since TPUs have no native 64-bit lanes.  maxtimebits <= 31 and
    # idbits <= 31 (ids stay int32 in voting).
    idbits: int = 0          # 0 = derive as 32 - maxtimebits (packed)

    @property
    def maxtime(self) -> int:
        return 1 << self.maxtimebits

    @property
    def n_buckets(self) -> int:
        return 1 << self.hashbits

    @property
    def idbits_eff(self) -> int:
        return self.idbits or (32 - self.maxtimebits)

    @property
    def wide(self) -> bool:
        return self.idbits_eff + self.maxtimebits > 32


def _mix32(x: jax.Array) -> jax.Array:
    """murmur3 fmix32 — must match audfprint_tpu.utils.prng.mix32."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * _C1
    x = x ^ (x >> 13)
    x = x * _C2
    x = x ^ (x >> 16)
    return x


def reservoir_slot_device(bucket: jax.Array, position: jax.Array,
                          seed: int) -> jax.Array:
    h = _mix32((bucket.astype(jnp.uint32) * _GOLDEN)
               ^ _mix32(position.astype(jnp.uint32) + jnp.uint32(seed)))
    return (h % (position.astype(jnp.uint32) + jnp.uint32(1))).astype(jnp.int32)


def empty_table(cfg: TableConfig):
    shape = ((cfg.n_buckets, cfg.depth, 2) if cfg.wide
             else (cfg.n_buckets, cfg.depth))
    table = jnp.zeros(shape, jnp.uint32)
    counts = jnp.zeros((cfg.n_buckets,), jnp.int32)
    return table, counts


def store_batch_local(table: jax.Array, counts: jax.Array,
                      times: jax.Array, hashes: jax.Array, valid: jax.Array,
                      ids: jax.Array, cfg: TableConfig,
                      bucket_lo: jax.Array | int = 0):
    """Insert a batch of per-file hash streams into a (possibly shard-local)
    table covering buckets [bucket_lo, bucket_lo + table.shape[0]).

    Args:
      table, counts: current state (updated functionally)
      times/hashes/valid: (B, L) int32/int32/bool per-file streams (rows of
        one file in order; e.g. straight from ops.pipeline.fingerprint_batch)
      ids: (B,) int32 track ids
      bucket_lo: first global bucket owned by this table (0 = full table)

    Semantics == sequential HashTable.store of file 0, then file 1, ...
    restricted to the owned bucket range (SURVEY §2.2: table sharding =
    the EP-style "route to owning shard" pattern; out-of-range hashes are
    simply masked here and handled by the shard that owns them).
    """
    B, L = hashes.shape
    timemask = cfg.maxtime - 1
    t = (times & timemask).reshape(-1)
    u = jnp.broadcast_to(ids[:, None].astype(jnp.uint32),
                         (B, L)).reshape(-1)
    entry = (u << cfg.maxtimebits) | t.astype(jnp.uint32)
    if cfg.wide:
        # logical entry64 = (id << mtb) | t split into uint32 planes:
        # lo carries t plus the id bits that fit; hi the id overflow
        entry = jnp.stack([entry, u >> (32 - cfg.maxtimebits)], axis=-1)
    return store_packed_local(table, counts, hashes.reshape(-1),
                              entry, valid.reshape(-1), cfg, bucket_lo)


def store_packed_local(table: jax.Array, counts: jax.Array,
                       hashes: jax.Array, entry, valid: jax.Array,
                       cfg: TableConfig, bucket_lo: jax.Array | int = 0):
    """Insert pre-packed entries (= (id << maxtimebits) | t) — used both by
    store_batch_local and by merge-as-resharding (replaying another table's
    stored entries, the reference's merge, hash_table.py:~340-400).

    `entry`: (n,) uint32 array (packed tables) or (n, 2) uint32 (lo, hi)
    planes (wide tables, cfg.wide) — the extra plane rides the two sorts
    as one more payload operand and lands in the table's trailing axis."""
    n_local = table.shape[0]
    hashmask = (1 << cfg.hashbits) - 1

    h = (hashes & hashmask) - jnp.asarray(bucket_lo, jnp.int32)
    v = valid & (h >= 0) & (h < n_local)
    if cfg.wide:
        es_in = entry[..., 0].astype(jnp.uint32)
        eh_in = entry[..., 1].astype(jnp.uint32)
    else:
        es_in = entry.astype(jnp.uint32)
        eh_in = None
    n = h.shape[0]

    # invalid rows -> bucket sentinel past the real buckets so they sort last
    # and never write (we allocate one scratch bucket row for them).
    hkey = jnp.where(v, h, n_local)
    order = jnp.arange(n, dtype=jnp.int32)
    if cfg.wide:
        hs, es, eh, ords = jax.lax.sort((hkey, es_in, eh_in, order),
                                        num_keys=1, is_stable=True)
    else:
        hs, es, ords = jax.lax.sort((hkey, es_in, order), num_keys=1,
                                    is_stable=True)
    first = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    rank = idx - run_start
    pos = counts[jnp.minimum(hs, n_local - 1)] + rank
    # reservoir PRNG is keyed by the GLOBAL bucket id so shard-local stores
    # remain bit-identical to the unsharded table
    slot = jnp.where(
        pos < cfg.depth, pos,
        reservoir_slot_device(hs + jnp.asarray(bucket_lo, jnp.int32),
                              jnp.maximum(pos, cfg.depth), cfg.seed))
    write = (slot < cfg.depth) & (hs < n_local)
    # last-wins on (bucket, slot): sort by (bucket, slot, ord) and keep the
    # row whose successor differs (sequential-store semantics).
    skey = jnp.where(write, slot, cfg.depth)
    if cfg.wide:
        hs2, sk2, _ord2, es2, eh2 = jax.lax.sort(
            (hs, skey, ords, es, eh), num_keys=3)
    else:
        hs2, sk2, _ord2, es2 = jax.lax.sort((hs, skey, ords, es), num_keys=3)
    last = jnp.concatenate(
        [(hs2[1:] != hs2[:-1]) | (sk2[1:] != sk2[:-1]), jnp.ones((1,), bool)])
    do = last & (sk2 < cfg.depth) & (hs2 < n_local)
    # masked-out rows get an out-of-bounds bucket index and are dropped by
    # the scatter (never redirect to a real slot: a "harmless" overwrite of
    # a live slot's old value races with genuine writes to it)
    bidx = jnp.where(do, hs2, n_local)
    sidx = jnp.where(do, sk2, 0)
    if cfg.wide:
        table = table.at[bidx, sidx].set(
            jnp.stack([es2, eh2], axis=-1), mode="drop")
    else:
        table = table.at[bidx, sidx].set(es2, mode="drop")
    counts = counts.at[jnp.minimum(hs, n_local - 1)].add(
        jnp.where(hs < n_local, 1, 0))
    return table, counts


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def store_batch(table: jax.Array, counts: jax.Array,
                times: jax.Array, hashes: jax.Array, valid: jax.Array,
                ids: jax.Array, cfg: TableConfig):
    """Full-table store (single device); see store_batch_local."""
    return store_batch_local(table, counts, times, hashes, valid, ids, cfg, 0)


def get_hits_local(table: jax.Array, counts: jax.Array,
                   qtimes: jax.Array, qhashes: jax.Array, qvalid: jax.Array,
                   cfg: TableConfig, bucket_lo: jax.Array | int = 0):
    """(B, Q) queries -> (ids, dts, hvalid) each (B, Q, depth), restricted to
    the bucket range owned by this (possibly shard-local) table.

    Row order per query == reference get_hits (slot order per query hash).
    """
    n_local = table.shape[0]
    hashmask = (1 << cfg.hashbits) - 1
    timemask = cfg.maxtime - 1
    qh = (qhashes & hashmask) - jnp.asarray(bucket_lo, jnp.int32)
    own = (qh >= 0) & (qh < n_local)
    qh = jnp.clip(qh, 0, n_local - 1)
    tab = table[qh]                           # (B,Q,depth[,2]) u32
    nids = jnp.minimum(cfg.depth, counts[qh])              # (B,Q)
    slotidx = jnp.arange(cfg.depth, dtype=jnp.int32)
    hvalid = ((slotidx[None, None, :] < nids[:, :, None])
              & (qvalid & own)[:, :, None])
    # decode in uint32 (logical shift): an int32 cast before the shift
    # sign-extends entries with the top bit set, corrupting ids >= 2^17
    # at default maxtimebits=14 — half the packing's 2^18 id capacity
    if cfg.wide:
        lo, hi = tab[..., 0], tab[..., 1]
        ids = ((lo >> cfg.maxtimebits)
               | (hi << (32 - cfg.maxtimebits))).astype(jnp.int32)
        dts = ((lo & jnp.uint32(timemask)).astype(jnp.int32)
               - qtimes[:, :, None])
    else:
        ids = (tab >> cfg.maxtimebits).astype(jnp.int32)
        dts = ((tab & jnp.uint32(timemask)).astype(jnp.int32)
               - qtimes[:, :, None])
    return ids, dts, hvalid


@functools.partial(jax.jit, static_argnames=("cfg",))
def get_hits(table: jax.Array, counts: jax.Array,
             qtimes: jax.Array, qhashes: jax.Array, qvalid: jax.Array,
             cfg: TableConfig):
    """Full-table gather (single device); see get_hits_local."""
    return get_hits_local(table, counts, qtimes, qhashes, qvalid, cfg, 0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_hpi_plane(table: jax.Array, hpi: jax.Array,
                    cfg: TableConfig) -> jax.Array:
    """Per-entry hashesperid plane aligned with the table: plane[b, s] =
    hpi[id of table[b, s]] (int32).

    Rationale (round 4, measured): voting ranks candidates by
    raw_count / hashesperid (upstream _best_count_ids), and the per-hit
    hpi[id] word-gather — (B, H) random 4-byte loads — was ~10 ms of a
    ~27 ms device-side config-5 match batch (benchmarks/topk_probe.py
    --stages: runs +0, gather +10, sort +2).  TPU word-gathers issue
    element-at-a-time, while the table's own row-gather (contiguous
    depth-row per query hash) measured ~2 ms for the same hit count.
    Baking hpi per ENTRY turns the word-gather into one more row-gather:
    the plane is built ONCE per staged table revision (the gather over
    all nb*depth entries runs at staging time, amortized over every
    subsequent query batch) and rides the F1 sort as a payload operand.

    A track's hpi never changes after its hashes are stored, so the
    plane stays valid until the table itself changes (same cache key)."""
    if cfg.wide:
        ids = ((table[..., 0] >> cfg.maxtimebits)
               | (table[..., 1] << (32 - cfg.maxtimebits))).astype(jnp.int32)
    else:
        ids = (table >> cfg.maxtimebits).astype(jnp.int32)
    # empty slots decode to id 0; their plane value is never read (hvalid
    # masks them), clamp only to stay in bounds
    return hpi[jnp.clip(ids, 0, hpi.shape[0] - 1)]


def gather_plane(plane: jax.Array, qhashes: jax.Array, cfg: TableConfig,
                 bucket_lo: jax.Array | int = 0) -> jax.Array:
    """Row-gather an auxiliary per-entry plane with get_hits_local's own
    bucket indexing -> (B, Q, depth), slot-aligned with its hit arrays."""
    n_local = plane.shape[0]
    hashmask = (1 << cfg.hashbits) - 1
    qh = (qhashes & hashmask) - jnp.asarray(bucket_lo, jnp.int32)
    qh = jnp.clip(qh, 0, n_local - 1)
    return plane[qh]


def config_for(ht) -> TableConfig:
    return TableConfig(hashbits=ht.hashbits, depth=ht.depth,
                      maxtimebits=ht.maxtimebits, seed=ht.seed,
                      idbits=getattr(ht, "idbits", 0))


def split_wide(table_u64: np.ndarray) -> np.ndarray:
    """Host uint64 entries -> device (nb, depth, 2) uint32 (lo, hi) planes."""
    return np.stack([(table_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                     (table_u64 >> np.uint64(32)).astype(np.uint32)],
                    axis=-1)


def join_wide(table_planes: np.ndarray) -> np.ndarray:
    """Device (nb, depth, 2) uint32 planes -> host uint64 entries."""
    t = np.asarray(table_planes)
    return (t[..., 0].astype(np.uint64)
            | (t[..., 1].astype(np.uint64) << np.uint64(32)))


def table_to_device(ht) -> tuple[jax.Array, jax.Array, TableConfig]:
    """Upload a host HashTable's arrays (zero-copy semantics via device_put).

    Wide host tables (uint64 entries) split into (lo, hi) uint32 planes —
    TPUs have no native 64-bit lanes."""
    cfg = config_for(ht)
    host = split_wide(ht.table) if cfg.wide else ht.table
    return jax.device_put(host), jax.device_put(ht.counts), cfg


def table_to_host(table: jax.Array, counts: jax.Array, ht) -> None:
    """Download device state into a host HashTable (names managed by caller)."""
    wide = table.ndim == 3
    ht.table = join_wide(table) if wide else np.asarray(table)
    ht.counts = np.asarray(counts)
    ht.dirty = True
