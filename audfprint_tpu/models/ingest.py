"""Fused device ingest: fingerprint -> store in ONE dispatch per chunk.

VERDICT r4 #2/#4.  The two-stage CLI ingest pays, per chunk: fingerprint
dispatch + packed hash fetch + (host store | sharded store dispatch).
Through a relay-attached chip each host<->device interaction is a ~30 ms
round trip, and on a mesh the replicated-stream store broadcasts every
hash to all shards (O(ndev x hashes) traffic).  This module fuses the
whole ingest hot path into one compiled graph per chunk:

  single device : fingerprint_batch -> store_batch_local, table/counts
                  donated; the host fetches ONLY the per-file unique
                  counts (for names/hashesperid and report lines) — the
                  hashes never touch the host.
  mesh          : shard_map of [DP fingerprint of the chunk's batch slice
                  -> pack entries -> route (hash, entry) pairs to the
                  bucket-owning shard with ONE all_to_all -> local
                  deterministic-reservoir store].  Per-device traffic is
                  O(hashes / ndev) with a 2x headroom cap instead of the
                  replicated path's O(hashes) broadcast; a (vanishingly
                  rare) cap overflow masks ALL writes, returns ok=0, and
                  the caller replays the chunk through the replicated
                  path — so results are unconditionally bit-identical.

Bit-identity to the sequential host store (reference ingest loop,
audfprint.py:~200 / hash_table.py:~120-180 [M]) holds by construction:
the deterministic reservoir is keyed by (global bucket, position), and
both the batch-axis sharding (contiguous file blocks per device) and the
all_to_all receive order (source-major, stable within source) preserve
the global file-major insertion order per bucket (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.index import device_table as DT
from audfprint_tpu.ops import pipeline as pipe


@functools.partial(jax.jit, static_argnames=("pcfg", "tcfg"),
                   donate_argnums=(0, 1))
def fused_ingest_graph(table, counts, audio, lengths, ids, pcfg, tcfg):
    """ONE compiled graph: audio batch -> hashes -> stored table.

    Returns (table, counts, per-file unique hash counts).  The (t, hash)
    rows live and die on device; semantics == sequential
    HashTable.store of file 0, then file 1, ... (store_batch_local)."""
    t, h, uniq, cnt = pipe.fingerprint_batch(audio, lengths, pcfg)
    table, counts = DT.store_batch_local(table, counts, t, h, uniq, ids,
                                         tcfg, 0)
    return table, counts, cnt


def _pack_entries(t, h, uniq, ids, tcfg):
    """(B, L) streams -> flat (hash, entry lo[, entry hi], valid) arrays,
    file-major order (== store_batch_local's packing)."""
    B, L = h.shape
    timemask = tcfg.maxtime - 1
    tt = (t & timemask).reshape(-1).astype(jnp.uint32)
    u = jnp.broadcast_to(ids[:, None].astype(jnp.uint32), (B, L)).reshape(-1)
    e_lo = (u << tcfg.maxtimebits) | tt
    e_hi = (u >> (32 - tcfg.maxtimebits)) if tcfg.wide else None
    hashmask = (1 << tcfg.hashbits) - 1
    hf = (h.reshape(-1) & hashmask).astype(jnp.int32)
    return hf, e_lo, e_hi, uniq.reshape(-1)


@functools.lru_cache(maxsize=32)
def sharded_fused_ingest_fn(mesh, pcfg, tcfg, cap_override: int | None = None):
    """jitted (table, counts, audio, lengths, ids) ->
    (table, counts, cnt_and_ok) on a bucket-sharded mesh.

    cnt_and_ok is (B + 1,) int32 replicated: per-file unique counts with
    the ok flag appended — ONE tiny fetch resolves the chunk.  ok == 0
    means a routing-cap overflow masked every write (table unchanged);
    the caller replays the chunk through the replicated store.
    cap_override forces the routing cap (tests exercise the overflow
    fallback with it; None = the 2x-headroom auto cap)."""
    from jax.sharding import PartitionSpec as PS

    from audfprint_tpu.parallel.sharded import shard_map

    ndev = mesh.devices.size
    assert tcfg.n_buckets % ndev == 0
    n_local = tcfg.n_buckets // ndev

    def _local(table, counts, audio, lengths, ids):
        t, h, uniq, cnt = pipe.fingerprint_batch(audio, lengths, pcfg)
        hf, e_lo, e_hi, vf = _pack_entries(t, h, uniq, ids, tcfg)
        Hl = hf.shape[0]
        # routing cap: uniform hashing spreads valid hashes ~evenly over
        # shards; 2x the FLAT capacity per dest is enormous headroom
        # (valid counts are ~density*dur << Hl).  Static per trace.
        cap = cap_override or P.next_pow2(max(128, (2 * Hl) // ndev))
        dest = jnp.where(vf, hf // n_local, ndev)
        iota = jnp.arange(Hl, dtype=jnp.int32)
        if tcfg.wide:
            ds, hs, els, ehs = jax.lax.sort((dest, hf, e_lo, e_hi),
                                            num_keys=1, is_stable=True)
        else:
            ds, hs, els = jax.lax.sort((dest, hf, e_lo), num_keys=1,
                                       is_stable=True)
            ehs = None
        first = jnp.concatenate([jnp.ones((1,), bool), ds[1:] != ds[:-1]])
        run_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(first, iota, 0))
        rank = iota - run_start
        ok_local = ~jnp.any((ds < ndev) & (rank >= cap))
        wv = (ds < ndev) & (rank < cap)
        slot = jnp.where(wv, ds * cap + rank, ndev * cap)  # OOB -> drop
        send_h = jnp.zeros((ndev * cap,), jnp.int32).at[slot].set(
            hs, mode="drop")
        send_lo = jnp.zeros((ndev * cap,), jnp.uint32).at[slot].set(
            els, mode="drop")
        send_v = jnp.zeros((ndev * cap,), bool).at[slot].set(
            wv, mode="drop")
        ops = [send_h, send_lo, send_v]
        if tcfg.wide:
            ops.append(jnp.zeros((ndev * cap,), jnp.uint32).at[slot].set(
                ehs, mode="drop"))
        if ndev > 1:
            ops = [jax.lax.all_to_all(o.reshape(ndev, cap), "d",
                                      split_axis=0, concat_axis=0,
                                      tiled=True).reshape(-1) for o in ops]
            ok = jnp.min(jax.lax.all_gather(
                ok_local.astype(jnp.int32), "d", tiled=False))
        else:
            ops = [o.reshape(-1) for o in ops]
            ok = ok_local.astype(jnp.int32)
        recv_h, recv_lo, recv_v = ops[0], ops[1], ops[2]
        entry = (jnp.stack([recv_lo, ops[3]], axis=-1) if tcfg.wide
                 else recv_lo)
        lo = jax.lax.axis_index("d") * n_local
        table, counts = DT.store_packed_local(
            table, counts, recv_h, entry, recv_v & (ok > 0), tcfg, lo)
        if ndev > 1:
            cnt = jax.lax.all_gather(cnt, "d", axis=0, tiled=True)
        return table, counts, jnp.concatenate([cnt, ok[None]])

    f = shard_map(_local, mesh=mesh,
                  in_specs=(PS("d", None), PS("d"), PS("d", None),
                            PS("d"), PS("d")),
                  out_specs=(PS("d", None), PS("d"), PS()),
                  check_vma=False)
    return jax.jit(f, donate_argnums=(0, 1))


class DeviceIngest:
    """Device-resident ingest for the CLI: the table lives on device for
    the whole run (uploaded once, or born empty for `new`), every chunk
    is ONE fused fingerprint+store dispatch + one tiny counts fetch, and
    `finalize()` downloads the result into the host HashTable (the
    persistence mirror) with a sparse fetch sized by max bucket
    occupancy.

    Replaces parallel.sharded.ShardedStore as the CLI mesh-ingest path
    (that class remains the replicated-store fallback + merge engine).
    """

    def __init__(self, ht, analyzer, ndev: int, fresh: bool | None = None):
        from audfprint_tpu.parallel import sharded

        self.ht = ht
        self.analyzer = analyzer
        self.ndev = ndev
        self.cfg = DT.config_for(ht)
        if fresh is None:      # empty table: born on device, no upload
            fresh = not ht.counts.any()
        if ndev > 1:
            if self.cfg.n_buckets % ndev:
                raise ValueError(
                    f"hashbits={ht.hashbits} table not divisible over "
                    f"{ndev} devices")
            self.mesh = sharded.make_mesh(ndev)
            if fresh:
                self.table, self.counts = sharded.empty_sharded_table(
                    self.mesh, self.cfg)
            else:
                self.table, self.counts, _ = sharded.upload_sharded(
                    ht, self.mesh)
            self._fn = sharded_fused_ingest_fn(
                self.mesh, analyzer.config, self.cfg)
        else:
            self.mesh = None
            if fresh:
                self.table, self.counts = DT.empty_table(self.cfg)
            else:
                self.table, self.counts, _ = DT.table_to_device(ht)
        self._repl_store = None     # built lazily (mesh overflow / .afpt)

    # -- chunk path -------------------------------------------------------

    def _assign_id(self, name: str, nhashes: int | None) -> int:
        """Host id assignment in strict input order; hashesperid is
        deferred to consume for device-counted files (nhashes None)."""
        id_ = self.ht.name_to_id(name, add_if_missing=True)
        self.ht._check_id_capacity(id_)
        if nhashes is not None:
            self.ht.hashesperid[id_] += nhashes
        return id_

    def dispatch_chunk(self, ordered, report):
        """Dispatch one decoded chunk: maximal same-kind runs keep the
        global file order (ids + per-bucket insertion order == the
        sequential reference loop).  Precomputed `.afpt`/`.afpk` files
        load on host here and ride a packed-store dispatch.

        Returns a handle for consume_chunk; entries that failed decode /
        load are reported (or raise under fail_on_error) and skipped."""
        an = self.analyzer
        segs: list = []      # (kind, [(name, payload, dur)])
        for name, kind, d in ordered:
            if kind == "wav":
                if d is None:
                    continue                       # decode failed, reported
                row = (name, d, len(d) / an.target_sr)
            elif kind == "stream":
                if d is None:
                    continue                       # stream failed, reported
                kind = "pre"               # hashes already on host
                row = (name, d[0], d[1])
            else:
                try:
                    h = an.wavfile2hashes(name)
                except (OSError, ValueError) as e:
                    if an.fail_on_error:
                        raise
                    report(f"Error reading {name}: {e}")
                    continue
                row = (name, h, an.soundfiledur)
            if segs and segs[-1][0] == kind:
                segs[-1][1].append(row)
            else:
                segs.append((kind, [row]))
        out = []
        for kind, rows in segs:
            if kind == "wav":
                out.append(self._dispatch_wavs(rows))
            else:
                out.append(self._dispatch_pre(rows))
        return out

    def _stage_chunk(self, sigs: list):
        """Pad a chunk's signals into ONE (Bp, blen) batch (chunk-max
        bucket; strict file order — no length regrouping, the fused store
        depends on in-order rows).  Bp is padded to a pow2 multiple of
        ndev so shapes stay on O(log B) compiled graphs."""
        from audfprint_tpu.models.analyzer import _bucket_len

        blen = _bucket_len(max(len(s) for s in sigs))
        Bp = P.next_pow2(len(sigs), max(8, self.ndev))
        if Bp % max(1, self.ndev):
            Bp = -(-Bp // self.ndev) * self.ndev
        all_i16 = all(s.dtype == np.int16 for s in sigs if len(s))
        batch = np.zeros((Bp, blen), np.int16 if all_i16 else np.float32)
        lens = np.zeros(Bp, np.int32)
        for row, s in enumerate(sigs):
            if not all_i16 and s.dtype == np.int16:
                s = s.astype(np.float32) / float(1 << 15)
            batch[row, : len(s)] = s
            lens[row] = len(s)
        return batch, lens

    def _dispatch_wavs(self, rows):
        names = [n for n, _, _ in rows]
        sigs = [d for _, d, _ in rows]
        durs = [dur for _, _, dur in rows]
        batch, lens = self._stage_chunk(sigs)
        ids = np.zeros(len(lens), np.int32)
        for row, name in enumerate(names):
            ids[row] = self._assign_id(name, None)
        if self.mesh is not None:
            self.table, self.counts, cnt_ok = self._fn(
                self.table, self.counts, jnp.asarray(batch),
                jnp.asarray(lens), jnp.asarray(ids))
        else:
            self.table, self.counts, cnt = fused_ingest_graph(
                self.table, self.counts, jnp.asarray(batch),
                jnp.asarray(lens), jnp.asarray(ids),
                pcfg=self.analyzer.config, tcfg=self.cfg)
            cnt_ok = cnt           # ok flag is a mesh-routing concept
        return ("wav", names, durs, cnt_ok, ids, batch, lens)

    def _dispatch_pre(self, rows):
        """Precomputed hash files: host arrays -> one packed store
        dispatch (replicated streams on a mesh — they are host-resident
        already, and .afpt ingest is the rare path)."""
        tt, hh, vv, ids = self._pad_hashes(rows)
        if self.mesh is not None:
            self.table, self.counts = self._repl_store_fn()(
                self.table, self.counts, jnp.asarray(tt), jnp.asarray(hh),
                jnp.asarray(vv), jnp.asarray(ids))
        else:
            self.table, self.counts = DT.store_batch(
                self.table, self.counts, jnp.asarray(tt), jnp.asarray(hh),
                jnp.asarray(vv), jnp.asarray(ids), self.cfg)
        return ("pre", [n for n, _, _ in rows], [d for _, _, d in rows],
                [len(h) for _, h, _ in rows], None, None, None)

    def _pad_hashes(self, rows):
        B = len(rows)
        L = P.next_pow2(max(1, max(len(h) for _, h, _ in rows)), 256)
        Bp = P.next_pow2(B, 8)
        tt = np.zeros((Bp, L), np.int32)
        hh = np.zeros((Bp, L), np.int32)
        vv = np.zeros((Bp, L), bool)
        ids = np.zeros(Bp, np.int32)
        for b, (name, h, _dur) in enumerate(rows):
            h = np.asarray(h).reshape(-1, 2)
            ids[b] = self._assign_id(name, len(h))
            tt[b, : len(h)] = h[:, 0]
            hh[b, : len(h)] = h[:, 1]
            vv[b, : len(h)] = True
        return tt, hh, vv, ids

    def _repl_store_fn(self):
        from audfprint_tpu.parallel import sharded
        if self._repl_store is None:
            self._repl_store = sharded.sharded_store_fn(self.mesh, self.cfg)
        return self._repl_store

    def consume_chunk(self, handle) -> list:
        """Resolve a dispatch_chunk handle -> ordered (name, nhash, dur)
        rows; fetches ONE small buffer per segment.  A mesh routing-cap
        overflow (ok == 0) replays that segment's audio through a
        separate fingerprint + replicated store — bit-identical, since
        the overflowing dispatch masked all its writes."""
        out = []
        for seg in handle:
            kind, names, durs, cnt_ok, ids, batch, lens = seg
            if kind == "pre":
                out.extend(zip(names, cnt_ok, durs))
                continue
            buf = np.asarray(cnt_ok)
            if self.mesh is not None:
                cnt, ok = buf[:-1], int(buf[-1])
                if not ok:
                    cnt = self._replay_overflow(batch, lens, ids)
            else:
                cnt = buf
            for row, (name, dur) in enumerate(zip(names, durs)):
                n = int(cnt[row])
                self.ht.hashesperid[ids[row]] += n
                out.append((name, n, dur))
        return out

    def _replay_overflow(self, batch, lens, ids):
        """Routing-cap overflow fallback: fingerprint two-stage and store
        through the replicated-stream mesh kernel."""
        import jax.numpy as _jnp

        th, counts = pipe.fingerprint_batch_compact(
            _jnp.asarray(batch), _jnp.asarray(lens), self.analyzer.config)
        rows = pipe.resolve_compact(th, counts)
        L = P.next_pow2(max(1, max(len(h) for h in rows)), 256)
        tt = np.zeros((len(rows), L), np.int32)
        hh = np.zeros((len(rows), L), np.int32)
        vv = np.zeros((len(rows), L), bool)
        for b, h in enumerate(rows):
            tt[b, : len(h)] = h[:, 0]
            hh[b, : len(h)] = h[:, 1]
            vv[b, : len(h)] = True
        self.table, self.counts = self._repl_store_fn()(
            self.table, self.counts, jnp.asarray(tt), jnp.asarray(hh),
            jnp.asarray(vv), jnp.asarray(ids))
        return np.asarray([len(h) for h in rows] + [0] * (len(lens)
                                                          - len(rows)))

    # -- finalize ---------------------------------------------------------

    def finalize(self) -> None:
        """Download device state into the host table (persistence mirror).

        The stored hashes are tiny relative to the table's capacity (a
        fresh ingest of F files holds ~F*density*dur entries in a
        n_buckets*depth grid), so fetching even the occupied slot
        COLUMNS (table[:, :kmax]) ships mostly zeros: ~64-128 MB over a
        ~27 MB/s relay, measured 5-16 s of the CLI `store` stage.  The
        fix is a device-side compaction (_compact_slots): occupied slots
        scatter bucket-major into a dense S-word buffer whose layout the
        host re-derives from `counts` alone, so the D2H bytes track the
        STORED HASHES (~4 B/entry), not the capacity.  Falls back to the
        column-slice fetch when the table is dense enough that the slice
        is within 4x of the packed size."""
        counts = np.asarray(self.counts)
        kmax = int(min(self.cfg.depth, counts.max())) if counts.size else 0
        k = min(self.cfg.depth, max(1, P.next_pow2(max(1, kmax), 1)))
        occ = np.minimum(counts, self.cfg.depth).astype(np.int64)
        total = int(occ.sum())
        words = 2 if self.cfg.wide else 1
        S = max(1, P.next_pow2(max(1, total), 1))
        shape = ((self.cfg.n_buckets, self.cfg.depth, 2)
                 if self.cfg.wide else
                 (self.cfg.n_buckets, self.cfg.depth))
        if S * 4 <= self.cfg.n_buckets * k:
            packed = np.asarray(_compact_slots(
                self.table, self.counts, k=k, S=S, wide=self.cfg.wide))
            tab = np.zeros(shape, np.uint32)
            rowb = np.repeat(np.arange(self.cfg.n_buckets), occ)
            off = np.cumsum(occ) - occ
            col = np.arange(total) - off[rowb]
            if self.cfg.wide:
                tab[rowb, col, 0] = packed[0][:total]
                tab[rowb, col, 1] = packed[1][:total]
            else:
                tab[rowb, col] = packed[0][:total]
        elif kmax >= self.cfg.depth:
            tab = np.asarray(self.table)
        else:
            tab_k = np.asarray(_slice_depth(self.table, k))
            tab = np.zeros(shape, np.uint32)
            tab[:, : tab_k.shape[1]] = tab_k
        self.ht.table = DT.join_wide(tab) if self.cfg.wide else tab
        self.ht.counts = counts
        self.ht.dirty = True
        self.ht.rev += 1


@functools.partial(jax.jit, static_argnames=("k", "S", "wide"))
def _compact_slots(table, counts, k: int, S: int, wide: bool):
    """Pack every occupied slot of table[:, :k] bucket-major into a dense
    (words, S) uint32 buffer.  Layout contract with finalize(): entry j
    belongs to the bucket b with off[b] <= j < off[b] + occ[b] where
    occ = min(counts, k) and off = exclusive-cumsum(occ) — i.e. fully
    derivable from `counts` on host, so ONLY the packed values cross the
    wire."""
    occ = jnp.minimum(counts, k).astype(jnp.int32)
    off = jnp.cumsum(occ) - occ
    slot = jnp.arange(k, dtype=jnp.int32)[None, :]
    mask = slot < occ[:, None]
    pos = jnp.where(mask, off[:, None] + slot, S).reshape(-1)
    if wide:
        lo = jnp.zeros((S,), jnp.uint32).at[pos].set(
            table[:, :k, 0].reshape(-1), mode="drop")
        hi = jnp.zeros((S,), jnp.uint32).at[pos].set(
            table[:, :k, 1].reshape(-1), mode="drop")
        return jnp.stack([lo, hi])
    return jnp.zeros((S,), jnp.uint32).at[pos].set(
        table[:, :k].reshape(-1), mode="drop")[None]


@functools.partial(jax.jit, static_argnames=("k",))
def _slice_depth(table, k: int):
    return table[:, :k]
