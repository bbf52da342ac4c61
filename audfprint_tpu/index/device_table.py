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

    @property
    def maxtime(self) -> int:
        return 1 << self.maxtimebits

    @property
    def n_buckets(self) -> int:
        return 1 << self.hashbits


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
    table = jnp.zeros((cfg.n_buckets, cfg.depth), jnp.uint32)
    counts = jnp.zeros((cfg.n_buckets,), jnp.int32)
    return table, counts


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0, 1))
def store_batch(table: jax.Array, counts: jax.Array,
                times: jax.Array, hashes: jax.Array, valid: jax.Array,
                ids: jax.Array, cfg: TableConfig):
    """Insert a batch of per-file hash streams into the table.

    Args:
      table, counts: current state (donated — updated in place on device)
      times/hashes/valid: (B, L) int32/int32/bool per-file streams (rows of
        one file in order; e.g. straight from ops.pipeline.fingerprint_batch)
      ids: (B,) int32 track ids

    Semantics == sequential HashTable.store of file 0, then file 1, ...
    """
    B, L = hashes.shape
    hashmask = (1 << cfg.hashbits) - 1
    timemask = cfg.maxtime - 1

    h = (hashes & hashmask).reshape(-1)
    t = (times & timemask).reshape(-1)
    v = valid.reshape(-1)
    entry = ((ids[:, None].astype(jnp.uint32) << cfg.maxtimebits)
             | jnp.zeros((B, L), jnp.uint32)).reshape(-1) | t.astype(jnp.uint32)
    n = B * L

    # invalid rows -> bucket sentinel past the real buckets so they sort last
    # and never write (we allocate one scratch bucket row for them).
    hkey = jnp.where(v, h, cfg.n_buckets)
    order = jnp.arange(n, dtype=jnp.int32)
    hs, es, ords = jax.lax.sort((hkey, entry, order), num_keys=1,
                                is_stable=True)
    first = jnp.concatenate([jnp.ones((1,), bool), hs[1:] != hs[:-1]])
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, 0))
    rank = idx - run_start
    pos = counts[jnp.minimum(hs, cfg.n_buckets - 1)] + rank
    slot = jnp.where(
        pos < cfg.depth, pos,
        reservoir_slot_device(hs, jnp.maximum(pos, cfg.depth), cfg.seed))
    write = (slot < cfg.depth) & (hs < cfg.n_buckets)
    # last-wins on (bucket, slot): sort by (bucket, slot, ord) and keep the
    # row whose successor differs (sequential-store semantics).
    skey = jnp.where(write, slot, cfg.depth)
    hs2, sk2, _ord2, es2 = jax.lax.sort((hs, skey, ords, es), num_keys=3)
    last = jnp.concatenate(
        [(hs2[1:] != hs2[:-1]) | (sk2[1:] != sk2[:-1]), jnp.ones((1,), bool)])
    do = last & (sk2 < cfg.depth) & (hs2 < cfg.n_buckets)
    bidx = jnp.where(do, hs2, cfg.n_buckets - 1)
    sidx = jnp.where(do, sk2, 0)
    # guard scatter: redirect masked-out rows to a harmless overwrite of
    # their own current value
    cur = table[bidx, sidx]
    table = table.at[bidx, sidx].set(jnp.where(do, es2, cur))
    counts = counts.at[jnp.minimum(hs, cfg.n_buckets - 1)].add(
        jnp.where(hs < cfg.n_buckets, 1, 0))
    return table, counts


@functools.partial(jax.jit, static_argnames=("cfg",))
def get_hits(table: jax.Array, counts: jax.Array,
             qtimes: jax.Array, qhashes: jax.Array, qvalid: jax.Array,
             cfg: TableConfig):
    """(B, Q) queries -> (ids, dts, hvalid) each (B, Q, depth).

    Row order per query == reference get_hits (slot order per query hash).
    """
    hashmask = (1 << cfg.hashbits) - 1
    timemask = cfg.maxtime - 1
    qh = qhashes & hashmask
    tab = table[qh].astype(jnp.int32)                      # (B,Q,depth)
    nids = jnp.minimum(cfg.depth, counts[qh])              # (B,Q)
    slotidx = jnp.arange(cfg.depth, dtype=jnp.int32)
    hvalid = (slotidx[None, None, :] < nids[:, :, None]) & qvalid[:, :, None]
    ids = (tab >> cfg.maxtimebits).astype(jnp.int32)
    dts = (tab & timemask) - qtimes[:, :, None]
    return ids, dts, hvalid


def table_to_device(ht) -> tuple[jax.Array, jax.Array, TableConfig]:
    """Upload a host HashTable's arrays (zero-copy semantics via device_put)."""
    cfg = TableConfig(hashbits=ht.hashbits, depth=ht.depth,
                      maxtimebits=ht.maxtimebits, seed=ht.seed)
    return jax.device_put(ht.table), jax.device_put(ht.counts), cfg


def table_to_host(table: jax.Array, counts: jax.Array, ht) -> None:
    """Download device state into a host HashTable (names managed by caller)."""
    ht.table = np.asarray(table)
    ht.counts = np.asarray(counts)
    ht.dirty = True
