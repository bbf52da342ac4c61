"""Analyzer: the user-facing analysis model (reference Analyzer parity).

Mirrors the reference class surface (audfprint_analyze.py Analyzer, SURVEY
§2.3.3): wavfile2hashes / wavfile2peaks / ingest plus this rebuild's batched
TPU entry points (wavfiles2hashes).  All DSP runs through the fused device
pipeline in audfprint_tpu.ops; decode stays on host (SURVEY §2.1).

Audio lengths are padded into geometric buckets so the number of distinct
compiled shapes stays O(log max_len) — XLA compiles once per (bucket,
config) and the persistent cache makes that a one-time cost.
"""

from __future__ import annotations

import os

import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.ops import pipeline as pipe
from audfprint_tpu.ops import peaks as PK
from audfprint_tpu.ops import spectro as SP
from audfprint_tpu.ops.config import PipelineConfig
from audfprint_tpu.utils import audio as audio_io
from audfprint_tpu.utils import formats


def _bucket_len(n: int, minimum: int = 1 << 16) -> int:
    """Pad length to the next {1, 1.5} x power-of-two bucket."""
    b = minimum
    while b < n:
        if (b * 3) // 2 >= n and b >= minimum * 2:
            return (b * 3) // 2
        b *= 2
    return b


class Analyzer:
    def __init__(self,
                 density: float = P.DENSITY,
                 target_sr: int = P.TARGET_SR,
                 n_fft: int = P.N_FFT,
                 n_hop: int = P.N_HOP,
                 shifts: int = P.SHIFTS,
                 maxpksperframe: int = P.MAX_PKS_PER_FRAME,
                 maxpairsperpeak: int = P.MAX_PAIRS_PER_PEAK,
                 f_sd: float = P.F_SD,
                 fail_on_error: bool = True):
        self.density = density
        self.target_sr = target_sr
        self.n_fft = n_fft
        self.n_hop = n_hop
        self.shifts = max(1, shifts)
        self.maxpksperframe = maxpksperframe
        self.maxpairsperpeak = maxpairsperpeak
        self.f_sd = f_sd
        self.fail_on_error = fail_on_error
        self.soundfiledur = 0.0   # duration of last-analyzed file (reference)
        # rows per device dispatch: bounds HBM for huge ingest lists and
        # keeps batch shapes on the small set of already-compiled graphs
        # (an uncapped 1000-row batch forces a one-off multi-minute compile
        # and a ~1.4 GB transfer).  The peak-prune scan is latency-bound on
        # its serial time chain, so wider batches are nearly free: measured
        # 65k/73k/75k audio-sec/s at 128/256/512 rows — 256 takes most of
        # the win at half the staging memory of 512.
        self.max_batch_rows = 256
        # streamed (chunked) ingest for very long inputs: WAV-PCM files at
        # the analysis rate longer than stream_above_sec analyze chunk-wise
        # with O(chunk) host+device memory (models/streaming.py; SURVEY §5
        # long-audio plan).  0 disables.
        self.stream_above_sec = 3600.0
        self.stream_chunk_frames = 8192

    # -- config ---------------------------------------------------------

    @property
    def config(self) -> PipelineConfig:
        return PipelineConfig(
            density=self.density, n_fft=self.n_fft, n_hop=self.n_hop,
            shifts=self.shifts, maxpksperframe=self.maxpksperframe,
            maxpairsperpeak=self.maxpairsperpeak, f_sd=self.f_sd)

    def params_dict(self) -> dict:
        """Analyzer params persisted into the DB for compat checks
        (reference HashTable.params, SURVEY §5 config row)."""
        return {"density": self.density, "samplerate": self.target_sr,
                "n_fft": self.n_fft, "n_hop": self.n_hop,
                "shifts": self.shifts, "fanout": self.maxpairsperpeak}

    # -- decode ---------------------------------------------------------

    def read_audio(self, filename: str) -> np.ndarray:
        d, _sr = audio_io.audio_read(filename, sr=self.target_sr, channels=1)
        self.soundfiledur = float(len(d)) / self.target_sr
        return d

    # -- single-file API (reference parity) ------------------------------

    def wavfile2hashes(self, filename: str) -> np.ndarray:
        """File -> (N, 2) int32 sorted unique (t, hash) rows.

        `.afpt` inputs short-circuit to hashes_load; `.afpk` peak files are
        re-paired into landmarks and hashed (reference wavfile2hashes,
        audfprint_analyze.py:~430)."""
        ext = os.path.splitext(filename)[1]
        if ext == formats.PRECOMPEXT:
            hashes = formats.hashes_load(filename)
        elif ext == formats.PRECOMPPKEXT:
            from audfprint_tpu.oracle import analyze as oa

            params = P.AnalyzerParams(
                density=self.density, n_fft=self.n_fft, n_hop=self.n_hop,
                maxpairsperpeak=self.maxpairsperpeak, f_sd=self.f_sd)
            peaks = formats.peaks_load(filename)
            lmks = oa.peaks2landmarks(peaks, params)
            h = oa.landmarks2hashes(lmks)
            hashes = (np.unique(h, axis=0) if len(h)
                      else np.zeros((0, 2), np.int32))
        elif self._should_stream(filename):
            return self.wavfile2hashes_streaming(filename)
        else:
            d = self.read_audio(filename)
            return self.samples2hashes(d)
        # reference reports duration from hash extent for precomputed
        self.soundfiledur = (
            float(hashes[:, 0].max()) * self.n_hop / self.target_sr
            if len(hashes) else 0.0)
        return hashes

    def samples2hashes(self, d: np.ndarray) -> np.ndarray:
        batch = self._batch_one(d)
        return pipe.fingerprint_numpy(batch, [len(d)], self.config)[0]

    def wavfile2peaks(self, filename: str):
        """File -> list of (frame, bin) peaks (sorted, unique across shifts).

        `.afpk` inputs short-circuit to peaks_load."""
        if os.path.splitext(filename)[1] == formats.PRECOMPPKEXT:
            return formats.peaks_load(filename)
        d = self.read_audio(filename)
        cfg = self.config
        import jax.numpy as jnp
        batch = jnp.asarray(self._batch_one(d))
        # peaks per shift, merged (shift 0 only when shifts == 1)
        all_pk = []
        for s in range(cfg.shifts):
            off = s * cfg.n_hop // cfg.shifts
            ds = batch[:, off:]
            ns = np.asarray(pipe.frame_count_device(
                np.asarray([max(0, len(d) - off)], np.int32), cfg))
            sg = SP.whitened_spectrogram(ds, jnp.asarray(ns), cfg)
            mask = np.asarray(PK.find_peaks_mask(sg, jnp.asarray(ns), cfg))[0]
            t, f = np.nonzero(mask)
            all_pk.append(np.stack([t, f], axis=1))
        pk = np.unique(np.concatenate(all_pk, axis=0), axis=0)
        return [(int(a), int(b)) for a, b in pk]

    def samples_batch2peaks(self, signals: list) -> list:
        """Batched peak extraction (the `precompute -K` path,
        VERDICT r4 #9): list of sample arrays -> list of sorted unique
        (frame, bin) peak tuples per file — identical to per-file
        wavfile2peaks (same kernels, same np.unique union across
        shifts), but batched through the device like the hashes path."""
        import jax.numpy as jnp

        out: list = [None] * len(signals)
        cfg = self.config
        for idxs, batch, lens in self.stage_groups(signals):
            bins, valid = pipe.peaks_batch(
                jnp.asarray(batch), jnp.asarray(lens), cfg)
            bins = np.asarray(bins)
            valid = np.asarray(valid)
            for row, i in enumerate(idxs):
                pairs = []
                for s in range(cfg.shifts):
                    tt, pp = np.nonzero(valid[row, s])
                    pairs.append(np.stack(
                        [tt, bins[row, s][tt, pp]], axis=1))
                pk = (np.unique(np.concatenate(pairs, axis=0), axis=0)
                      if pairs else np.zeros((0, 2), np.int64))
                out[i] = [(int(a), int(b)) for a, b in pk]
        return out

    def ingest(self, ht, filename: str):
        """Analyze one file and store it (reference ingest) -> (dur, nhash)."""
        hashes = self.wavfile2hashes(filename)
        ht.store_vectorized(filename, hashes)
        return self.soundfiledur, len(hashes)

    # -- streamed (chunked) ingest for very long inputs -------------------

    def _should_stream(self, filename: str) -> bool:
        """True when this file exceeds stream_above_sec and is streamable
        (any-rate PCM WAV; wrong rates stream through chunked polyphase
        resampling) — header probe only, no decode."""
        if not self.stream_above_sec or not filename.lower().endswith(".wav"):
            return False
        from audfprint_tpu.models import streaming as STM
        try:
            src = STM.open_stream_source(filename, self.target_sr)
        except STM.StreamUnsupported:
            return False
        dur = src.n_samples / float(self.target_sr)
        src.close()
        return dur > self.stream_above_sec

    def wavfile2hashes_streaming(self, filename: str,
                                 chunk_frames: int | None = None
                                 ) -> np.ndarray:
        """Chunked analysis of an unbounded-length WAV: host and device
        memory O(chunk) instead of O(file) (models/streaming.py)."""
        from audfprint_tpu.models import streaming as STM
        h, dur = STM.wavfile2hashes_streaming(
            filename, self.config, self.target_sr,
            chunk_frames or self.stream_chunk_frames)
        self.soundfiledur = dur
        return h

    # -- batched TPU API --------------------------------------------------

    def _batch_one(self, d: np.ndarray) -> np.ndarray:
        n = _bucket_len(len(d))
        batch = np.zeros((1, n), np.float32)
        batch[0, : len(d)] = d
        return batch

    def stage_groups(self, signals: list):
        """Stage sample arrays into padded (rows, bucket_len) host batches.

        Yields (idxs, batch, lens) groups — the shared front half of
        fingerprint_async and the Matcher's fused fingerprint+match
        dispatch (match.matcher).  Groups signals by length bucket, caps
        rows per dispatch at max_batch_rows, and pads the row count to a
        power of two so the set of compiled shapes stays O(log rows_cap)
        per bucket."""
        order = sorted(range(len(signals)), key=lambda i: len(signals[i]))
        groups: dict[int, list[int]] = {}
        for i in order:
            groups.setdefault(_bucket_len(len(signals[i])), []).append(i)
        rows_cap = max(1, int(self.max_batch_rows))
        # dtype decided per CALL, not per chunk: a mixed corpus stages
        # everything float32 so each (rows, blen) bucket compiles ONE
        # graph, while pure-int16 corpora (the common precomputed case)
        # ship raw PCM throughout
        all_i16 = bool(signals) and all(
            s.dtype == np.int16 for s in signals if len(s))
        out = []
        for blen, g_idxs in groups.items():
            for i0 in range(0, len(g_idxs), rows_cap):
                idxs = g_idxs[i0: i0 + rows_cap]
                # pad the row count to the next power of two (<= rows_cap):
                # zero rows are nearly free to compute, while each distinct
                # (rows, blen) shape is a fresh multi-minute XLA compile on
                # this target — this keeps the shape set O(log rows_cap)
                nrows = min(P.next_pow2(len(idxs)), rows_cap)
                # raw-PCM staging: int16 batches convert bit-exactly on
                # device (ops.pipeline.fingerprint_batch), at half the
                # H2D bytes
                batch = np.zeros((nrows, blen),
                                 np.int16 if all_i16 else np.float32)
                lens = np.zeros(nrows, np.int32)
                for row, i in enumerate(idxs):
                    s = signals[i]
                    if not all_i16 and s.dtype == np.int16:
                        s = s.astype(np.float32) / float(1 << 15)
                    batch[row, : len(s)] = s
                    lens[row] = len(s)
                out.append((idxs, batch, lens))
        return out

    def _hash_cap_estimate(self, dur_sec: float) -> int:
        """Static per-file unique-hash estimate for the single-fetch
        buffer (fingerprint_batch_compact_k): the fingerprint emits
        ~density unique hashes/sec, shifts add partially-deduped extras
        (~+50%/shift measured), 1.5x + 64 covers the spread.  An
        underestimate only costs a tiny per-row fallback fetch."""
        factor = 1.0 + 0.5 * (self.shifts - 1)
        return P.next_pow2(
            int(dur_sec * self.density * factor * 1.5) + 64, 128)

    def fingerprint_async(self, signals: list):
        """Dispatch fingerprinting of sample arrays to the device WITHOUT
        waiting: returns an opaque handle for fingerprint_resolve.

        Lets callers pipeline host work (decode/store of other batches)
        against device execution — the device is never idle."""
        import jax.numpy as jnp

        handle = []
        for idxs, batch, lens in self.stage_groups(signals):
            k = self._hash_cap_estimate(batch.shape[1] / self.target_sr)
            dev = pipe.fingerprint_batch_compact_k(
                jnp.asarray(batch), jnp.asarray(lens), self.config, k=k)
            handle.append((idxs, dev))
        return (len(signals), handle)

    def fingerprint_resolve(self, handle) -> list:
        """Materialize the results of fingerprint_async as (n, 2) arrays.

        ONE packed D2H fetch per dispatch group: the (B, k+1, 2) buffer
        carries the compacted (t, hash) rows AND the per-file counts
        (pipe.fingerprint_batch_compact_k), so the count fetch + slice
        dispatch + slice fetch round trips of the old resolve_compact
        path collapse to a single transfer.  Rows past the static k
        (rare: k is sized from duration x density with headroom) resolve
        from the retained on-device full buffer, so results are
        bit-identical at any k."""
        n, groups = handle
        out: list = [None] * n
        for idxs, (buf_dev, th_dev) in groups:
            buf = np.asarray(buf_dev)
            k = buf.shape[1] - 1
            counts = buf[:, k, 0]
            for row, i in enumerate(idxs):
                c = int(counts[row])
                if c <= k:
                    out[i] = buf[row, :c].astype(np.int32)
                else:          # overflow fallback: full row, tiny fetch
                    out[i] = np.asarray(
                        pipe._one_row(th_dev, row))[:c].astype(np.int32)
        return out

    def samples_batch2hashes(self, signals: list) -> list:
        """Fingerprint a list of sample arrays in shared-bucket batches."""
        return self.fingerprint_resolve(self.fingerprint_async(signals))

    def glob2hashtable(self, pattern: str, ht=None):
        """Build (or extend) a HashTable from a glob pattern (reference
        glob2hashtable, audfprint_analyze.py [M]) — audio batched on
        device, precomputed .afpt/.afpk loaded directly (ids and table
        content identical to the serial per-file loop: store order is
        input order)."""
        import glob as _glob

        from audfprint_tpu.index.hash_table import HashTable
        if ht is None:
            ht = HashTable()
        names = sorted(_glob.glob(pattern))
        pre = {n for n in names
               if os.path.splitext(n)[1] in (formats.PRECOMPEXT,
                                             formats.PRECOMPPKEXT)}
        wavs = [n for n in names if n not in pre]
        wav_hashes = iter(self.wavfiles2hashes(wavs))
        for name in names:
            h = (self.wavfile2hashes(name) if name in pre
                 else next(wav_hashes))
            if h is not None:
                ht.store_vectorized(name, h)
        return ht

    def wavfiles2hashes(self, filenames: list) -> list:
        """Batched fingerprinting of many files -> list of (N, 2) arrays
        (None for failed decodes when fail_on_error is False).  Files past
        the streaming threshold analyze chunk-wise instead of joining the
        in-memory batch (O(chunk) memory for multi-hour inputs)."""
        signals, durs = [], []
        oks: list[bool] = []
        streamed: dict[int, np.ndarray] = {}
        for i, f in enumerate(filenames):
            try:
                if self._should_stream(f):
                    streamed[i] = self.wavfile2hashes_streaming(f)
                    signals.append(np.zeros(0, np.float32))
                else:
                    signals.append(self.read_audio(f))
                durs.append(self.soundfiledur)
                oks.append(True)
            except audio_io.DecodeError:
                if self.fail_on_error:
                    raise
                signals.append(np.zeros(0, np.float32))
                durs.append(0.0)
                oks.append(False)
        hashes = self.samples_batch2hashes(signals)
        for i, h in streamed.items():
            hashes[i] = h
        self.durations = durs
        return [h if ok else None for h, ok in zip(hashes, oks)]
