"""Matcher: user-facing retrieval (reference Matcher parity).

Mirrors audfprint_match.py's Matcher (SURVEY §2.3.5): match_hashes /
match_file / file_match_to_msgs / illustrate_match, with the voting core
running as batched on-device reductions (audfprint_tpu.match.voting).  The
device table upload is cached per (HashTable, revision) so repeated queries
against the same DB pay the transfer once.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.index import device_table as DT
from audfprint_tpu.match import voting
from audfprint_tpu.utils import audio as audio_io


_next_pow2 = P.next_pow2

# qt_cap floor shared by the two-stage batch path and the fused serving
# graph: queries whose max frame fits under it (~47.5 s at the default
# hop) compile ONE dt-bin domain, and the fused path's static cap equals
# the two-stage path's derived qt_cap exactly (bit-identity precondition)
_QT_FLOOR = 2048


@functools.partial(jax.jit, static_argnames=("pcfg", "tcfg", "mcfg",
                                             "qcap"))
def _fused_match_graph(audio, lengths, table, counts, hpi, hpi_plane,
                       pcfg, tcfg, mcfg, qcap: int):
    """ONE compiled graph from raw audio to packed match results.

    The serving fast path: fingerprint_batch_compact -> static qcap-column
    slice of the front-compacted (t, hash) buffer -> the compacted-RLE
    vote -> the packed (B, max_returns, 7) result, all inside one jit.
    Through a relay-attached chip every host<->device interaction is a
    ~30 ms round trip; the two-stage path pays fingerprint dispatch +
    count fetch + hash fetch + match dispatch + result fetch, while this
    graph pays dispatch + ONE fetch.  The query hashes never touch the
    host on the fast path.

    Row [-1] of the returned (B, max_returns + 1, 7) buffer carries the
    host-side eligibility readback [n_unique_hashes, max_frame,
    effective_qcap, 0...]: a row whose hash count exceeds the static cap
    (or whose max frame reaches mcfg.qt_cap) is re-matched by the caller
    through the two-stage path, so truncation can never change results
    (match_fused_resolve).  Results for eligible rows are bit-identical
    to match_hashes_batch: same fingerprint graph, same vote, and the
    vote is invariant to trailing invalid query slots and shares the
    static qt_cap floor (reference behavior: audfprint_match.py:~120
    match_hashes over audfprint_analyze.py wavfile2hashes)."""
    import jax.numpy as jnp

    from audfprint_tpu.ops import pipeline as pipe

    th, cnt = pipe.fingerprint_batch_compact(audio, lengths, pcfg)
    qce = min(qcap, th.shape[1])
    qt = th[:, :qce, 0]
    qh = th[:, :qce, 1]
    iota = jnp.arange(qce, dtype=jnp.int32)[None]
    qv = iota < jnp.minimum(cnt, qce)[:, None]
    packed = voting.match_batch_packed(table, counts, hpi, qt, qh, qv,
                                       tcfg, mcfg, "sorted", hpi_plane)
    maxt = jnp.max(jnp.where(qv, qt, 0), axis=1)
    zero = jnp.zeros_like(cnt)
    extra = jnp.stack([cnt, maxt, jnp.full_like(cnt, qce),
                       zero, zero, zero, zero], axis=-1)
    return jnp.concatenate([packed, extra[:, None, :]], axis=1)


def sweep_factors(pct: float) -> list:
    """+/-pct% speed-correction factors in 1% steps, unity excluded."""
    k = min(10, int(round(abs(pct))))
    return [1.0 + i / 100.0 for i in range(-k, k + 1) if i]


def slice_hash_windows(hashes, dur: float, window_sec: float, fps: float,
                       hop_sec: float = 0.0) -> list:
    """Slice one query's (t, hash) rows into overlapping time windows in
    the HASH domain (broadcast monitoring): the input is fingerprinted
    once — hash times are raw frame counts, so this works for arbitrarily
    long recordings — and every window can ride one batched device match.

    Returns [(t0_sec, hashes_shifted, win_dur_sec)] per window; hop
    defaults to window/2.  The tail remainder gets its own window only
    when meaningfully offset (>= hop/2) from the last grid window — a
    few-frame remainder would just duplicate its matches."""
    ww = max(1, int(round(window_sec * fps)))
    hh = max(1, int(round((hop_sec if hop_sec > 0 else window_sec / 2)
                          * fps)))
    nf = max(1, int(round(dur * fps)))
    starts = list(range(0, max(1, nf - ww + 1), hh))
    if nf - ww - starts[-1] >= max(1, hh // 2):
        starts.append(nf - ww)
    h = np.asarray(hashes).reshape(-1, 2)
    out = []
    for t0 in starts:
        sel = h[(h[:, 0] >= t0) & (h[:, 0] < t0 + ww)].copy()
        sel[:, 0] -= t0
        out.append((t0 / fps, sel, min(ww, nf - t0) / fps))
    return out


class Matcher:
    def __init__(self,
                 window: int = P.MATCH_WIN,
                 threshcount: int = P.MIN_COUNT,
                 max_returns: int = P.MAX_MATCHES,
                 search_depth: int = P.SEARCH_DEPTH,
                 exact_count: bool = False,
                 find_time_range: bool = False,
                 time_quantile: float = P.TIME_QUANTILE,
                 sort_by_time: bool = False,
                 verbose: int = 1,
                 illustrate: bool = False,
                 illustrate_hpf: bool = False,
                 sonify: bool = False,
                 ndev: int | None = 1):
        self.window = window
        self.threshcount = threshcount
        self.max_returns = max_returns
        self.search_depth = search_depth
        self.exact_count = exact_count
        self.find_time_range = find_time_range
        self.time_quantile = time_quantile
        self.sort_by_time = sort_by_time
        self.verbose = verbose
        self.illustrate = illustrate
        self.illustrate_hpf = illustrate_hpf
        self.sonify = sonify
        # device-count for table-sharded matching (VERDICT r2 #1: the
        # multi-chip path as a product feature).  1 = single-device cores;
        # None/0 = all local devices; N = first N.  Results are
        # bit-identical at any ndev (tested); the table is sharded by
        # bucket range over the mesh and per-shard voting partials are
        # combined with psum/pmin collectives (parallel/sharded.py).
        self.ndev = ndev
        self._dev = None          # (ht id, revision) -> device state

    # -- device cache -----------------------------------------------------

    def _resolved_ndev(self, ht) -> int:
        from audfprint_tpu.parallel import sharded
        n = sharded.resolve_ndev(self.ndev)
        if n > 1 and (1 << ht.hashbits) % n:
            if self.verbose and getattr(self, "_ndev_noted", None) != n:
                self._ndev_noted = n      # note once, not per batch
                print(f"Note: hashbits={ht.hashbits} table not divisible "
                      f"over {n} devices; matching single-device")
            return 1
        return n

    def _device_state(self, ht):
        # cache key: a WEAK reference to the HashTable object plus its
        # mutation counter.  Identity (not id()) prevents aliasing a new
        # table allocated at a freed table's address — a dead weakref
        # resolves to None, never `is` a live table — while not pinning
        # hundreds of MB of host arrays to the cache slot
        rev = getattr(ht, "rev", None)
        ndev = self._resolved_ndev(ht)
        if (self._dev is None or self._dev[0]() is not ht
                or self._dev[1] != (rev, ndev)):
            import jax
            import weakref
            ncap = _next_pow2(max(1, len(ht.names)), 256)
            hpi = np.zeros(ncap, np.int32)
            hpi[: len(ht.hashesperid)] = np.minimum(
                ht.hashesperid, 2**31 - 1)
            if ndev > 1:
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as PS

                from audfprint_tpu.parallel import sharded
                mesh = sharded.make_mesh(ndev)
                table, counts, tcfg = sharded.upload_sharded(ht, mesh)
                hpi_dev = jax.device_put(
                    hpi, NamedSharding(mesh, PS()))
                # per-entry hpi plane shards like the table (rows follow
                # the bucket range); jit propagates the table's sharding
                # through build_hpi_plane's gather-from-replicated
                plane = self._maybe_hpi_plane(table, hpi_dev, tcfg,
                                              ndev=ndev)
            else:
                mesh = None
                table, counts, tcfg = DT.table_to_device(ht)
                hpi_dev = jax.device_put(hpi)
                plane = self._maybe_hpi_plane(table, hpi_dev, tcfg)
            self._dev = (weakref.ref(ht), (rev, ndev), table, counts,
                         hpi_dev, tcfg, ncap, mesh, plane)
        return self._dev[2:]

    # Per-entry hashesperid plane for the sorted core's candidate ranking
    # (DT.build_hpi_plane): trades one table-sized int32 buffer + a one-
    # time staging gather for removing the per-batch (B, H) word-gather
    # that measured ~10 ms of a ~27 ms device-side config-5 batch.
    # None = auto (build when the plane fits comfortably inside the
    # voting memory budget); True/False forces.
    use_hpi_plane: bool | None = None

    def _maybe_hpi_plane(self, table, hpi_dev, tcfg, ndev: int = 1):
        use = self.use_hpi_plane
        if use is None:
            # backend gate (VERDICT r4 #10): the plane exists to turn the
            # per-hit hpi[id] WORD-gather — element-at-a-time on TPU, ~10
            # ms of a ~27 ms config-5 batch — into one more row-gather.
            # CPU gathers don't have that penalty, and on a CPU mesh the
            # plane measurably LOSES (it doubles the all_to_all payload;
            # DESIGN.md round-4 ablation), so auto enables it on TPU only
            # (a real-multi-chip TPU A/B is still pending — no hardware).
            import jax
            if jax.default_backend() != "tpu":
                return None
            # per-DEVICE bytes: a sharded plane splits its rows like the
            # table, so each device holds 1/ndev of it
            plane_bytes = 4 * tcfg.n_buckets * tcfg.depth // max(1, ndev)
            use = plane_bytes <= self._budget_bytes() // 2
        return DT.build_hpi_plane(table, hpi_dev, tcfg) if use else None

    def invalidate(self):
        self._dev = None

    # -- core -------------------------------------------------------------

    # Device-memory budget for one voting call's histogram-class buffers.
    # The envelope (see _voting_bytes_per_row): the dominant buffers scale
    # as (search_depth+1) x (maxtime + qt_cap) int32 PER QUERY ROW, so long
    # queries or deep searches are handled by splitting the batch, never by
    # truncating the query (VERDICT r1: arbitrary-length query parity).
    # None = derive from the backend's reported memory limit on first use
    # (1/3 of bytes_limit leaves the table + pipeline buffers headroom; on
    # a 16 GB v5e that is ~5.3 GiB, keeping the default B=128/qt_cap=2048
    # approx batch (~2.9 GiB) on one dispatch).  Backends with no stats
    # (CPU, relay) fall back to 4 GiB; set matcher.mem_budget_bytes to
    # override on small-HBM targets (ADVICE r2).
    mem_budget_bytes: int | None = None

    # Pin the single-device voting core ("hist" | "sorted"); None = choose
    # by the memory envelope.  Both cores are bit-identical (tested) — this
    # is a perf-harness hook, ignored on sharded meshes.
    force_core: str | None = None

    # Pin the fused serving graph's static query-hash cap (None = estimate
    # per bucket from density); a cap below the actual unique-hash count
    # just re-routes those rows two-stage — a tuning/testing hook.
    fused_qcap: int | None = None

    def _budget_bytes(self) -> int:
        if self.mem_budget_bytes is not None:
            return self.mem_budget_bytes
        cached = getattr(self, "_auto_budget", None)
        if cached is None:
            cached = 4 << 30
            try:
                import jax
                stats = jax.devices()[0].memory_stats() or {}
                lim = int(stats.get("bytes_limit", 0))
                if lim > 0:
                    cached = min(max(1 << 28, lim // 3), 8 << 30)
            except Exception:
                pass
            self._auto_budget = cached
        return cached

    def _voting_bytes_per_row(self, tcfg, qt_cap: int, Q: int = 0) -> int:
        """Hist-core footprint estimate: bin-domain buffers per query row.

        exact-count materializes up to ~6 live (SD+1)-row bin-domain
        arrays (hist, wmax, the EXT diff array, its cumsum, the coverage
        view, and the selection score); approx ~3 (hist, padded smear
        accumulator, masked-score).  The core runs those buffers in int16
        whenever every count provably fits (H = Q·depth < 2^15, see
        voting.match_core), so size them at 2 bytes then — otherwise the
        envelope would split batches twice as often as the memory
        actually requires."""
        SD = self.search_depth
        nbins = tcfg.maxtime + qt_cap
        n_hist = 6 if self.exact_count else 3
        itemsize = 2 if (Q and Q * tcfg.depth < (1 << 15)) else 4
        per = n_hist * (SD + 1) * nbins * itemsize
        if self.find_time_range:
            per += (SD + 1) * qt_cap * itemsize
        return per

    def _sorted_bytes_per_row(self, tcfg, Q: int) -> int:
        """Sorted-core footprint estimate: ~16 hit-domain int32 arrays per
        row (sorts double-buffer), independent of maxtime/query length.
        Exact-count adds the 3H-wide merged event/run sort (3 packed
        operands since round 4, double-buffered) — the 2.5x estimate is
        kept as the envelope (it now carries slack rather than risk)."""
        per = 16 * Q * tcfg.depth * 4
        return per * 5 // 2 if self.exact_count else per

    def _mcfg(self, qt_cap: int, ncap: int) -> voting.MatchConfig:
        return voting.MatchConfig(
            window=self.window, threshcount=self.threshcount,
            max_returns=self.max_returns, search_depth=self.search_depth,
            exact_count=self.exact_count,
            find_time_range=self.find_time_range,
            time_quantile=self.time_quantile,
            sort_by_time=self.sort_by_time,
            qt_cap=qt_cap, n_ids_cap=ncap,
            modes_cap=max(1, self.max_returns))

    def match_hashes(self, ht, hashes) -> np.ndarray:
        """Query (t, hash) rows -> (k, 6) int64 result rows
        [id, filtcount, mode_dt, rawcount, min_t, max_t].

        Oracle-identical for ANY query length: the dt-histogram domain is
        sized to the query (qt_cap = next pow2 of the max query frame), and
        memory is bounded by splitting the batch, not the query."""
        return self.match_hashes_batch(ht, [np.asarray(hashes)])[0]

    def match_hashes_batch(self, ht, hash_lists) -> list:
        (table, counts, hpi, tcfg, ncap, mesh,
         hpi_plane) = self._device_state(ht)
        B = len(hash_lists)
        maxn = max([1] + [len(h) for h in hash_lists])
        # pow2 padding so typical query sizes share few compiled graphs
        # (TPU compiles are the expensive resource).  The floor is 128, not
        # 512: scatter updates (B x Q x depth) scale the device-side voting
        # cost, and a typical 5 s query (~125 hashes) at Q=512 would issue
        # 4x the updates it needs.
        Q = _next_pow2(maxn, 128)
        maxt = max([1] + [int(h[:, 0].max()) + 1 for h in hash_lists
                          if len(h)])
        qt_cap = _next_pow2(maxt, 2048)
        # voting-memory envelope.  Matching uses the compacted-RLE
        # ("sorted") core everywhere — fastest at every measured scale
        # since round 4 AND O(B*H) memory independent of maxtime/query
        # length, so the envelope only ever splits the batch.  On a mesh
        # the same vote runs after an all_to_all hit exchange
        # (sharded.sharded_match_rle_packed_cached): per-device sort
        # volume equals the single-device core's at equal B, so the
        # single-device envelope formula carries over unchanged.  The
        # psum-combinable hist core stays reachable via force_core (the
        # A/B + equivalence-reference path).
        budget = self._budget_bytes()
        core = "sorted"
        if self.force_core is not None:
            # benchmark/testing hook: pin the voting core regardless of the
            # dispatch policy (both cores are bit-identical; this exists so
            # perf harnesses can A/B them on hardware)
            core = self.force_core
        if mesh is not None and core == "hist":
            per_row = self._voting_bytes_per_row(tcfg, qt_cap, Q)
            if per_row > budget:
                # a query too long for even one row's hist buffers drops
                # to one device (bit-identical) instead of OOMing mid-mesh.
                # The single-device (table, counts, hpi, plane) state is
                # cached per table revision: every oversized batch was
                # paying a full table transfer + plane rebuild (ADVICE r4)
                if self.verbose:
                    print("Note: query exceeds the sharded voting memory "
                          "envelope; matching this batch single-device")
                import jax
                rev = getattr(ht, "rev", None)
                fb = getattr(self, "_fallback_dev", None)
                if fb is None or fb[0]() is not ht or fb[1] != rev:
                    import weakref
                    table, counts, tcfg = DT.table_to_device(ht)
                    hpi = jax.device_put(np.asarray(hpi))
                    hpi_plane = self._maybe_hpi_plane(table, hpi, tcfg)
                    self._fallback_dev = (weakref.ref(ht), rev, table,
                                          counts, tcfg, hpi, hpi_plane)
                else:
                    table, counts, tcfg, hpi, hpi_plane = fb[2:]
                mesh = None
                core = "sorted"
        if core == "hist":
            per_row = self._voting_bytes_per_row(tcfg, qt_cap, Q)
        else:
            per_row = self._sorted_bytes_per_row(tcfg, Q)
        # sub-batch size is a POWER OF TWO, not B itself: callers with
        # varying batch sizes (the --listen loop's dynamic batching drains
        # whatever backlog is pending) must share O(log B) compiled graphs
        # instead of compiling one per distinct B — the tail chunk is
        # padded with empty rows below, trading cheap compute for the
        # expensive resource (TPU compiles)
        cap = max(1, budget // max(1, per_row))
        bsub = _next_pow2(B)
        if bsub > cap:
            bsub = 1 << max(0, cap.bit_length() - 1)
        if bsub < B and self.verbose:
            print(f"Note: using the {core} voting core, "
                  f"splitting {B} queries into sub-batches of {bsub} "
                  f"(voting buffers ~{per_row >> 20} MiB/query at "
                  f"qt_cap={qt_cap}, search_depth={self.search_depth})")
        results = []
        for i in range(0, B, bsub):
            chunk = hash_lists[i: i + bsub]
            # pad the tail so every sub-batch reuses one compiled shape
            pad = bsub - len(chunk)
            chunk = list(chunk) + [np.zeros((0, 2), np.int32)] * pad
            rows = self._match_padded(table, counts, hpi, tcfg, ncap,
                                      chunk, Q, qt_cap, core, mesh,
                                      hpi_plane)
            results.extend(rows[: len(rows) - pad] if pad else rows)
        return results

    def _match_padded(self, table, counts, hpi, tcfg, ncap,
                      hash_lists, Q: int, qt_cap: int,
                      core: str = "hist", mesh=None,
                      hpi_plane=None) -> list:
        B = len(hash_lists)
        tt = np.zeros((B, Q), np.int32)
        hh = np.zeros((B, Q), np.int32)
        vv = np.zeros((B, Q), bool)
        for b, h in enumerate(hash_lists):
            h = np.asarray(h).reshape(-1, 2)
            tt[b, : len(h)] = h[:, 0]
            hh[b, : len(h)] = h[:, 1]
            vv[b, : len(h)] = True
        mcfg = self._mcfg(qt_cap, ncap)
        import jax.numpy as jnp
        # single packed output buffer = single D2H fetch (the per-array
        # fetches of the dict form dominated per-batch latency through the
        # relay; see voting.match_batch_packed)
        if mesh is not None:
            from audfprint_tpu.parallel import sharded
            if core == "sorted":
                # the RLE exchange splits the batch axis over the mesh —
                # pad B to a multiple of ndev with empty rows (B is a
                # static power of two per compiled graph, so this adds at
                # most ndev-1 all-invalid rows, dropped below)
                ndev = mesh.devices.size
                Bp = -(-B // ndev) * ndev
                if Bp != B:
                    z = np.zeros((Bp - B, Q), tt.dtype)
                    tt = np.concatenate([tt, z])
                    hh = np.concatenate([hh, z.astype(hh.dtype)])
                    vv = np.concatenate([vv, np.zeros((Bp - B, Q), bool)])
                fn = sharded.sharded_match_rle_packed_cached(
                    mesh, tcfg, mcfg, hpi_plane is not None)
                args = (table, counts, hpi) + (
                    (hpi_plane,) if hpi_plane is not None else ())
                out = np.asarray(fn(*args, jnp.asarray(tt),
                                    jnp.asarray(hh), jnp.asarray(vv)))[:B]
            else:
                fn = sharded.sharded_match_packed_cached(mesh, tcfg, mcfg)
                out = np.asarray(fn(table, counts, hpi, jnp.asarray(tt),
                                    jnp.asarray(hh), jnp.asarray(vv)))
        else:
            out = np.asarray(voting.match_batch_packed(
                table, counts, hpi, jnp.asarray(tt), jnp.asarray(hh),
                jnp.asarray(vv), tcfg, mcfg, core,
                hpi_plane if core == "sorted" else None))
        results = []
        for b in range(B):
            n = int(out[b, :, 6].sum())   # n_results == rvalid.sum()
            results.append(out[b, :n, :6].astype(np.int64))
        return results

    def match_hashes_windowed(self, ht, hashes, dur: float,
                              window_sec: float, fps: float,
                              hop_sec: float = 0.0) -> list:
        """Broadcast monitoring over one long query (library form of the
        CLI's `match --windowed`): hash-domain window slicing
        (slice_hash_windows) + ONE batched device match over all windows.
        fps = analysis frame rate (analyzer.target_sr / analyzer.n_hop).
        Returns [(t0_sec, rows, n_window_hashes, win_dur_sec)]."""
        wins = slice_hash_windows(hashes, dur, window_sec, fps, hop_sec)
        res = self.match_hashes_batch(ht, [h for _, h, _ in wins])
        return [(t0, rows, len(h), wdur)
                for (t0, h, wdur), rows in zip(wins, res)]

    def match_samples_sweep(self, analyzer, ht, samples: list, pct: float,
                            base_hashes: list | None = None) -> list:
        """Batched match with a query playback-speed correction sweep.

        Landmark dt/df quantization is not speed-robust (measured recall 0
        at -3%/+4% speed, docs/STATUS.md config 3 — a blind spot the
        reference shares).  Each query in `samples` is additionally
        fingerprinted at +/-pct% time-scale corrections in 1% steps (just
        extra rows of the device batch); all variants are matched in one
        dispatch and the best rank-0 aligned count wins, unity on ties.

        samples[i] = float32/int16 sample array, or None to match only
        base_hashes[i] (e.g. precomputed inputs with no audio).
        base_hashes: optional pre-fingerprinted (t, hash) arrays aligned
        with samples (computed here when omitted).
        Returns [(rows, factor, nhash_of_winner)] per query."""
        factors = sweep_factors(pct)
        if base_hashes is None:
            base_hashes = analyzer.samples_batch2hashes(
                [s for s in samples if s is not None])
            it = iter(base_hashes)
            base_hashes = [next(it) if s is not None
                           else np.zeros((0, 2), np.int32) for s in samples]
        sigs, meta = [], []
        for i, d in enumerate(samples):
            if d is None or not factors:
                continue
            if d.dtype == np.int16:
                d = d.astype(np.float32) / float(1 << 15)
            for f in factors:
                sigs.append(audio_io._resample(
                    d, 100, 100 + round((f - 1) * 100)))
                meta.append((i, f))
        vlists = analyzer.samples_batch2hashes(sigs) if sigs else []
        results = self.match_hashes_batch(ht, list(base_hashes) + vlists)
        score = (lambda rr: int(rr[0][1]) if len(rr) else 0)
        best = [(rr, 1.0, len(h))
                for rr, h in zip(results, base_hashes)]
        for (i, f), rr, h in zip(meta, results[len(base_hashes):], vlists):
            if score(rr) > score(best[i][0]):
                best[i] = (rr, f, len(h))
        return best

    # -- fused serving fast path --------------------------------------------

    def match_samples_fused_async(self, analyzer, ht, signals: list):
        """Dispatch the fused one-graph fingerprint+match for a list of
        sample arrays WITHOUT waiting (serving fast path; see
        _fused_match_graph).  Returns a handle for match_fused_resolve,
        or None when the fast path is ineligible — sharded mesh matching,
        a pinned hist core, or a group past the voting memory envelope —
        in which case the caller uses the two-stage path unchanged.

        Per-ROW ineligibility (more unique hashes than the static cap, or
        a query longer than the qt_cap floor) is detected at resolve time
        from the readback row and re-matched two-stage there, so the fast
        path can never change results.

        On a mesh the dispatch is the single shard_map jit
        (sharded.sharded_fused_match_cached, VERDICT r4 #3): DP
        fingerprint of the batch slice + the RLE all_to_all hit exchange
        + packed all_gather — same readback protocol, bit-identical to
        the two-stage sharded path."""
        (table, counts, hpi, tcfg, ncap, mesh,
         hpi_plane) = self._device_state(ht)
        if self.force_core == "hist":
            return None
        mcfg = self._mcfg(_QT_FLOOR, ncap)
        budget = self._budget_bytes()
        groups = analyzer.stage_groups(signals)
        qcaps = []
        footprint = 0
        for idxs, batch, lens in groups:
            # static query-hash cap per bucket: the fingerprint emits
            # ~density unique hashes/sec (that IS what density means), so
            # 1.5x + 64 covers the spread; an underestimate only costs a
            # rare two-stage re-match of that row
            dur = batch.shape[1] / float(analyzer.target_sr)
            qcap = self.fused_qcap or _next_pow2(
                int(dur * analyzer.density * 1.5) + 64, 128)
            # ALL groups are dispatched before any resolve, so their
            # voting buffers can be live simultaneously: budget the SUM
            # of the groups' footprints, like the two-stage path budgets
            # its sequential sub-batches (ADVICE r4 #2)
            footprint += self._sorted_bytes_per_row(tcfg, qcap) * len(lens)
            if footprint > budget:
                return None
            qcaps.append(qcap)
        import jax.numpy as jnp
        outs = []
        for (idxs, batch, lens), qcap in zip(groups, qcaps):
            if mesh is not None:
                from audfprint_tpu.parallel import sharded
                ndev = mesh.devices.size
                Bp = -(-batch.shape[0] // ndev) * ndev
                if Bp != batch.shape[0]:
                    pad = Bp - batch.shape[0]
                    batch = np.concatenate(
                        [batch, np.zeros((pad, batch.shape[1]),
                                         batch.dtype)])
                    lens = np.concatenate([lens,
                                           np.zeros(pad, lens.dtype)])
                fn = sharded.sharded_fused_match_cached(
                    mesh, analyzer.config, tcfg, mcfg, qcap,
                    hpi_plane is not None)
                args = (table, counts, hpi) + (
                    (hpi_plane,) if hpi_plane is not None else ())
                dev = fn(*args, jnp.asarray(batch), jnp.asarray(lens))
            else:
                dev = _fused_match_graph(
                    jnp.asarray(batch), jnp.asarray(lens), table, counts,
                    hpi, hpi_plane, pcfg=analyzer.config, tcfg=tcfg,
                    mcfg=mcfg, qcap=qcap)
            outs.append((idxs, dev))
        return (len(signals), outs, signals)

    def match_fused_resolve(self, analyzer, ht, handle) -> tuple:
        """Materialize match_samples_fused_async results: ONE packed fetch
        per dispatch group.  Rows flagged ineligible by the readback row
        re-match through the two-stage path (bit-identical by
        construction).  Returns (results rows list, n_hashes list)."""
        n, outs, signals = handle
        results: list = [None] * n
        nhash = [0] * n
        redo = []
        for idxs, dev in outs:
            out = np.asarray(dev)
            R = out.shape[1] - 1
            for row, i in enumerate(idxs):
                cnt_i = int(out[row, R, 0])
                maxt_i = int(out[row, R, 1])
                qce = int(out[row, R, 2])
                nhash[i] = cnt_i
                if cnt_i > qce or maxt_i + 1 > _QT_FLOOR:
                    redo.append(i)
                    continue
                nres = int(out[row, :R, 6].sum())
                results[i] = out[row, :nres, :6].astype(np.int64)
        if redo:
            hashes = analyzer.samples_batch2hashes(
                [signals[i] for i in redo])
            rr = self.match_hashes_batch(ht, hashes)
            for i, h, r in zip(redo, hashes, rr):
                results[i] = r
                nhash[i] = len(h)
        return results, nhash

    def match_samples_fused(self, analyzer, ht, signals: list):
        """Blocking convenience over the async/resolve pair; None when the
        fast path is ineligible (callers fall back to two-stage)."""
        handle = self.match_samples_fused_async(analyzer, ht, signals)
        if handle is None:
            return None
        return self.match_fused_resolve(analyzer, ht, handle)

    # -- file-level API -----------------------------------------------------

    def match_file(self, analyzer, ht, filename: str, number=None):
        """Analyze one file and match it -> (rows, dur, nhash)."""
        hashes = analyzer.wavfile2hashes(filename)
        dur = analyzer.soundfiledur
        rows = self.match_hashes(ht, hashes)
        if self.verbose > 1:
            print(f"Analyzed {filename} of {dur:.3f} s "
                  f"to {len(hashes)} hashes")
        return rows, dur, len(hashes)

    def file_match_to_msgs(self, analyzer, ht, qry: str, number=None):
        """Match one file, return the canonical output message lines
        (the CLI-compat contract strings, SURVEY §2.3.5 [H])."""
        rslts, dur, nhash = self.match_file(analyzer, ht, qry, number)
        return self.results_to_msgs(rslts, dur, nhash, analyzer, ht, qry)

    def results_to_msgs(self, rslts, dur, nhash, analyzer, ht, qry):
        t_hop = analyzer.n_hop / float(analyzer.target_sr)
        if self.verbose:
            qrymsg = f"{qry} {dur:.1f} sec {nhash} raw hashes"
        else:
            qrymsg = qry
        msgrslt = []
        if len(rslts) == 0:
            if self.verbose:
                msgrslt.append("NOMATCH " + qrymsg)
            else:
                msgrslt.append(qrymsg + "\t")
        else:
            for rank, row in enumerate(rslts):
                (tophitid, nhashaligned, aligntime, nhashraw,
                 min_time, max_time) = (int(x) for x in row[:6])
                name = ht.names[tophitid]
                if self.verbose:
                    if self.find_time_range:
                        msg = (
                            f"Matched {(max_time - min_time) * t_hop:6.1f} s "
                            f"starting at {min_time * t_hop:6.1f} s in {qry} "
                            f"to time {(min_time + aligntime) * t_hop:6.1f} s "
                            f"in {name} with {nhashaligned} of {nhashraw} "
                            f"common hashes at rank {rank}")
                    else:
                        msg = (f"Matched {qrymsg} as {name} "
                               f"at {aligntime * t_hop:.1f} s "
                               f"with {nhashaligned} of {nhashraw} "
                               f"common hashes at rank {rank}")
                    msgrslt.append(msg)
                else:
                    msgrslt.append(qrymsg + "\t" + name)
        if self.illustrate or self.illustrate_hpf:
            self.illustrate_match(analyzer, ht, qry)
        if self.sonify:
            self.sonify_match(analyzer, ht, qry)
        return msgrslt

    # -- diagnostics --------------------------------------------------------

    def illustrate_match(self, analyzer, ht, filename: str,
                         out_png: str | None = None,
                         show: bool | None = None,
                         hpf: bool | None = None):
        """Spectrogram + landmark overlay, matched landmarks highlighted
        (reference illustrate_match, audfprint_match.py:~300-380).

        hpf=None follows the matcher's flags: `-I --illustrate` draws the
        plain whitened log-magnitude spectrogram; `-J --illustrate-hpf`
        applies the onset high-pass first (distinct images, as in the
        reference).  Analysis/matching always uses the HPF'd signal
        regardless — this only changes the displayed background.

        show=None (default): display interactively when a display exists
        AND no explicit out_png was requested (the reference's matplotlib
        behavior), else save <filename>.match.png; show=True/False forces
        either."""
        import os
        if show is None:
            show = out_png is None and bool(
                os.environ.get("DISPLAY")
                or os.environ.get("MPLBACKEND", "").lower()
                not in ("", "agg"))
        try:
            import matplotlib
            if not show:
                matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("illustrate_match: matplotlib not available; skipping")
            return None
        from audfprint_tpu.oracle import analyze as oa

        if hpf is None:
            hpf = bool(self.illustrate_hpf)
        d = analyzer.read_audio(filename)
        sg = oa.spectrogram(d, P.AnalyzerParams(
            density=analyzer.density, n_fft=analyzer.n_fft,
            n_hop=analyzer.n_hop, f_sd=analyzer.f_sd), hpf=hpf)
        hashes = analyzer.samples2hashes(d)
        rows = self.match_hashes(ht, hashes)
        lmks = oa.hashes2landmarks(hashes)
        fig, ax = plt.subplots(figsize=(12, 5))
        ax.imshow(sg.T, origin="lower", aspect="auto", cmap="magma")
        for t, f1, f2, dt in lmks:
            ax.plot([t, t + dt], [f1, f2], "-", color="c", lw=0.6)
        if len(rows):
            mode = int(rows[0][2])
            tid = int(rows[0][0])
            ref = ht.get_hits(hashes)
            alig = ref[(ref[:, 0] == tid)
                       & (np.abs(ref[:, 1] - mode) <= self.window)]
            qmatch = {(int(q), int(h)) for h, q in zip(alig[:, 2], alig[:, 3])}
            matched_rows = [(int(r[0]), int(r[1])) for r in hashes
                            if (int(r[0]), int(r[1])) in qmatch]
            mlmks = oa.hashes2landmarks(
                np.array(matched_rows, dtype=np.int64).reshape(-1, 2))
            for t, f1, f2, dt in mlmks:
                ax.plot([t, t + dt], [f1, f2], "-", color="lime", lw=1.2)
            ax.set_title(f"{filename}: matched {ht.names[tid]} "
                         f"dt={mode} frames")
        else:
            ax.set_title(f"{filename}: NOMATCH")
        if show:
            plt.show()               # the reference's interactive display
            plt.close(fig)
            return None
        out_png = out_png or filename + ".match.png"
        fig.savefig(out_png, dpi=90)
        plt.close(fig)
        print(f"illustrate_match: wrote {out_png}")
        return out_png

    def sonify_match(self, analyzer, ht, filename: str,
                     out_wav: str | None = None):
        """Resynthesize the query's landmarks as sine-pair chirps so a human
        can audition what the fingerprinter extracted; matched landmarks are
        rendered louder (the audible analog of illustrate_match; SURVEY
        §2.3.5 [L] — upstream's Matlab ancestor had this, the Python port's
        flag is vestigial, so this is a faithful reconstruction).
        Writes <filename>.sonify.wav."""
        import numpy as np

        from audfprint_tpu.oracle import analyze as oa
        from audfprint_tpu.utils.audio import audio_write_wav

        sr = analyzer.target_sr
        d = analyzer.read_audio(filename)
        hashes = analyzer.samples2hashes(d)
        rows = self.match_hashes(ht, hashes)
        matched: set = set()
        if len(rows):
            mode = int(rows[0][2])
            tid = int(rows[0][0])
            hits = ht.get_hits(hashes)
            alig = hits[(hits[:, 0] == tid)
                        & (np.abs(hits[:, 1] - mode) <= self.window)]
            matched = {(int(q), int(h))
                       for h, q in zip(alig[:, 2], alig[:, 3])}
        lmks = oa.hashes2landmarks(hashes)
        out = np.zeros(len(d), np.float32)
        t_hop = analyzer.n_hop
        bin_hz = sr / float(analyzer.n_fft)
        for (t, f1, f2, dt), (tq, hsh) in zip(
                lmks, ((int(r[0]), int(r[1])) for r in hashes)):
            amp = 0.5 if (tq, hsh) in matched else 0.12
            s0 = t * t_hop
            n = max(1, int(dt * t_hop))
            m = min(n, len(out) - s0)   # clip chirps at the buffer end
            if m <= 0:
                continue
            tt = np.arange(n) / sr
            env = np.hanning(n) if n > 1 else np.ones(1)
            seg = 0.5 * np.sin(2 * np.pi * f1 * bin_hz * tt)
            seg += 0.5 * np.sin(2 * np.pi * f2 * bin_hz * tt)
            out[s0: s0 + m] += (amp * env * seg)[:m].astype(np.float32)
        peak = float(np.abs(out).max())
        if peak > 0:
            out = out / peak * 0.7
        out_wav = out_wav or filename + ".sonify.wav"
        audio_write_wav(out_wav, out, sr)
        print(f"sonify_match: wrote {out_wav}")
        return out_wav
