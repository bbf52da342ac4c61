"""Streaming (chunked) ingest driver — analyze unbounded audio with
O(chunk) host and device memory (SURVEY §5 long-audio plan; reference
anchor: wavfile2hashes, audfprint_analyze.py:~430, which holds the whole
file in memory).

Round-5 architecture (v2): TWO ranged read passes over the file and TWO
device dispatches per chunk, all shifts batched into one (S, Nc) row
block per dispatch:

  stats pass  ops/streaming.chunk_stats — ONE dispatch per chunk returns
          the per-shift |STFT| max/min plus EXACT integer level sums of
          the log magnitudes (3-level fixed-point split, ops/streaming
          _split3).  The host accumulates Python-int totals, so the
          whitening mean is the correctly-rounded mathematical mean of
          the same f32 values regardless of chunk size.  Chunks holding
          entries below the FINAL floor gmax/1e6 (detected via the
          fetched per-chunk min) get one correction dispatch
          (chunk_stats_below) that swaps those entries' summands for
          log(floor) — still integer-exact.
  peaks pass  chunk_fwd_peaks — whiten with the (gmax, mean) vectors ->
          onset HPF with carried (xprev, yprev) -> forward
          decaying-threshold prune with carried sthresh envelope ->
          compact per-frame (bin, value) peak lists.  Every recurrence
          crosses chunk boundaries through its exact float32 carry, so
          per-element arithmetic is identical to the single-batch scan.

v1 ran 3 serial passes PER SHIFT (3*S file reads, 3*S dispatches per
chunk, a (T, 257) f32 logm fetch per chunk); v2 reads each chunk once
per pass (one ranged read covers every shift's offset row), dispatches
once per pass for all shifts, keeps carries on device between chunks,
and drains fetches two chunks behind the dispatch so disk reads overlap
device compute.

The backward prune needs future context (it runs time-reversed from the
file end), but it only touches the ~density*dur surviving forward peaks —
a sparse stream.  The host runs the exact oracle backward prune over that
sparse list (oracle.analyze.bwd_prune_sparse), then pairs and hashes.

Wrong-rate PCM WAVs are streamed through ResampledWavSource — a chunked
polyphase resample (scipy resample_poly) whose FIR-phase-aligned halos
make every ranged read bit-identical to slicing a whole-file resample
(validated across up/down pairs in tests/test_streaming.py).  Non-WAV
inputs (compressed codecs need ffmpeg's stateful decoder) still raise
StreamUnsupported and callers fall back to the in-memory batched path.
"""

from __future__ import annotations

import math
import wave
from collections import deque
from fractions import Fraction

import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.oracle import analyze as oa
from audfprint_tpu.ops import streaming as ST
from audfprint_tpu.ops.config import PipelineConfig
from audfprint_tpu.utils import audio as audio_io


class StreamUnsupported(Exception):
    """Input cannot be streamed (not a decodable PCM WAV)."""


class _RawWav:
    """Ranged float32 mono sample reads from a PCM WAV at its native rate.

    Per-sample conversion (buf_to_float + float32 channel mean) is local,
    so chunked reads are bit-identical to utils.audio._read_wav's
    whole-file decode of the same ranges."""

    def __init__(self, filename: str):
        try:
            self._w = wave.open(filename, "rb")
        except (wave.Error, EOFError, OSError) as e:
            raise StreamUnsupported(f"not a PCM WAV: {filename}: {e}") from e
        self.rate = self._w.getframerate()
        self.nch = self._w.getnchannels()
        self.sampwidth = self._w.getsampwidth()
        self.n_samples = self._w.getnframes()

    def read(self, start: int, n: int) -> np.ndarray:
        """float32 mono samples [start, start+n) (short read at EOF)."""
        if start >= self.n_samples:
            return np.zeros(0, np.float32)
        self._w.setpos(start)
        raw = self._w.readframes(min(n, self.n_samples - start))
        x = audio_io.buf_to_float(raw, self.sampwidth)
        if self.nch > 1:
            x = x.reshape(-1, self.nch).mean(axis=1)
        return x.astype(np.float32)

    def read_i16(self, start: int, n: int) -> np.ndarray:
        """RAW int16 mono samples [start, start+n) — only valid when
        sampwidth == 2 and nch == 1; lets the chunk reader stage PCM to
        the device at half the bytes (ops/streaming._to_f32 reproduces
        buf_to_float's exact f32 on device)."""
        if start >= self.n_samples:
            return np.zeros(0, np.int16)
        self._w.setpos(start)
        raw = self._w.readframes(min(n, self.n_samples - start))
        return np.frombuffer(raw, dtype="<i2")

    def close(self):
        self._w.close()


class WavPCMSource(_RawWav):
    """Ranged reads from a PCM WAV already AT the analysis sample rate
    (raises StreamUnsupported otherwise — use open_stream_source to get
    automatic chunked resampling for wrong-rate WAVs)."""

    def __init__(self, filename: str, sr: int):
        super().__init__(filename)
        if self.rate != sr:
            rate = self.rate
            self.close()
            raise StreamUnsupported(
                f"{filename}: sample rate {rate} != analysis rate {sr}; "
                "use open_stream_source for chunked resampling")


class ResampledWavSource:
    """Ranged reads from a PCM WAV at any rate, chunk-resampled to the
    analysis rate with scipy.signal.resample_poly.

    Each read resamples an FIR-phase-aligned input window: the window
    start is clamped to a multiple of `down` (so the polyphase phase
    matches the whole-file call) and extended by a halo covering the
    kaiser-windowed FIR's half length, making every returned sample
    BIT-IDENTICAL to slicing utils.audio._resample of the whole file
    (same f64 dot products over the same taps; edge zero-padding is
    inherited from resample_poly when the window hits the true file
    edges).  Validated across up/down shapes incl. 147/640 and 441/320
    in tests/test_streaming.py."""

    def __init__(self, filename: str, sr: int):
        self._raw = _RawWav(filename)
        g = math.gcd(self._raw.rate, sr)
        self.up = sr // g
        self.down = self._raw.rate // g
        self.n_samples = -(-self._raw.n_samples * self.up // self.down)
        # scipy default half-length is 10*max(up,down) output-domain taps
        # (window=('kaiser', 5.0)); +4 input samples of slack for rounding
        self._halo = -(-(10 * max(self.up, self.down)) // self.up) + 4

    def read(self, start: int, n: int) -> np.ndarray:
        """float32 analysis-rate samples [start, start+n) (short at EOF)."""
        from scipy.signal import resample_poly

        if start >= self.n_samples:
            return np.zeros(0, np.float32)
        n = min(n, self.n_samples - start)
        up, down = self.up, self.down
        i0 = max(0, (start * down) // up - self._halo)
        i0 -= i0 % down                       # polyphase phase alignment
        i1 = min(self._raw.n_samples,
                 -(-((start + n) * down) // up) + self._halo)
        y = resample_poly(self._raw.read(i0, i1 - i0), up,
                          down).astype(np.float32)
        j0 = i0 * up // down                  # exact: i0 % down == 0
        seg = y[start - j0: start - j0 + n]
        if len(seg) < n:                      # defensive (EOF rounding)
            seg = np.pad(seg, (0, n - len(seg)))
        return seg

    def close(self):
        self._raw.close()


def open_stream_source(filename: str, sr: int):
    """PCM WAV -> ranged analysis-rate sample source (resampling when the
    native rate differs); raises StreamUnsupported for non-WAV inputs."""
    raw = _RawWav(filename)
    rate = raw.rate
    raw.close()
    if rate == sr:
        return WavPCMSource(filename, sr)
    return ResampledWavSource(filename, sr)


# depth of the dispatch-ahead window: chunk c+_LAG dispatches before
# chunk c's results are fetched, overlapping disk reads + host compaction
# with device compute (JAX dispatch is async)
_LAG = 2


class _ChunkReader:
    """Shared chunk grid for both passes: one ranged read per chunk feeds
    every shift's (S, Nc) row block.

    Two relay/bandwidth optimizations (round 5, measured on the chip
    where per-chunk H2D was the #1 cost at ~190 ms/8.4 MB):
      * 16-bit mono WAVs at the analysis rate stage RAW int16 rows —
        half the bytes; the device reproduces buf_to_float's exact f32
        (ops/streaming._to_f32).
      * uploaded device chunks are CACHED between the stats and peaks
        passes while their total stays under `cache_bytes` (default
        2 GiB ≈ 14 h of int16 mono at 11025 Hz), so each chunk is read
        from disk and shipped to the device ONCE; past the budget the
        second pass re-reads/re-uploads and device memory stays
        O(chunk)."""

    def __init__(self, src, cfg: PipelineConfig, chunk_frames: int,
                 cache_bytes: int = 2 << 30):
        self.src, self.cfg = src, cfg
        S = max(1, cfg.shifts)
        self.offs = np.array([s * cfg.n_hop // S for s in range(S)])
        navail = np.maximum(0, src.n_samples - self.offs)
        self.T_s = np.where(
            navail >= cfg.n_fft, 1 + (navail - cfg.n_fft) // cfg.n_hop,
            0).astype(np.int64)
        self.Tc = int(chunk_frames)
        self.Nc = ST.chunk_samples(self.Tc, cfg)
        self.nchunks = int(-(-self.T_s.max() // self.Tc))
        self._span = self.Nc + int(self.offs.max())
        self._i16 = (isinstance(src, _RawWav) and src.sampwidth == 2
                     and src.nch == 1)
        itemsize = 2 if self._i16 else 4
        self._cache_ok = (self.nchunks * S * self.Nc * itemsize
                          <= cache_bytes)
        self._dev: dict[int, object] = {}

    def chunk(self, c: int) -> tuple[np.ndarray, np.ndarray]:
        """((S, Nc) f32/int16 audio rows, (S,) int32 valid frame counts)."""
        base = c * self.Tc * self.cfg.n_hop
        if self._i16:
            x = self.src.read_i16(base, self._span)
            buf = np.zeros((len(self.offs), self.Nc), np.int16)
        else:
            x = self.src.read(base, self._span)
            buf = np.zeros((len(self.offs), self.Nc), np.float32)
        for s in range(len(self.offs)):
            row = x[self.offs[s]: self.offs[s] + self.Nc]
            buf[s, : len(row)] = row
        nf = np.clip(self.T_s - c * self.Tc, 0, self.Tc).astype(np.int32)
        return buf, nf

    def chunk_dev(self, c: int):
        """(device (S, Nc) rows, (S,) int32 nf) — device array cached
        across passes under the budget."""
        import jax.numpy as jnp

        nf = np.clip(self.T_s - c * self.Tc, 0, self.Tc).astype(np.int32)
        dev = self._dev.get(c)
        if dev is None:
            buf, _ = self.chunk(c)
            dev = jnp.asarray(buf)
            if self._cache_ok:
                self._dev[c] = dev
        return dev, nf


def _levels_to_int(hi: np.ndarray, lo: np.ndarray) -> int:
    """(6,) int32 limb pairs -> exact signed Python-int total in units of
    2^-58 (levels: [pos0, pos1, pos2, neg0, neg1, neg2])."""
    lev = [int(h) * 65536 + int(lv) for h, lv in zip(hi, lo)]
    return (((lev[0] - lev[3]) << 44) + ((lev[1] - lev[4]) << 22)
            + (lev[2] - lev[5]))


def _stats_pass(rd: _ChunkReader, cfg: PipelineConfig):
    """Fused chunked whitening stats: per shift (gmax f32, mean f32).

    The integer level sums make the mean chunking-invariant BY
    CONSTRUCTION; Fraction -> float is the correctly-rounded f64 total,
    matching v1's exact-f64 host accumulation whenever that sum was
    itself exact (its documented envelope)."""
    import jax.numpy as jnp

    S = len(rd.offs)
    F = cfg.n_fft // 2 + 1
    if rd.Tc > ST.STATS_MAX_FRAMES:
        gmax = _gmax_only(rd, cfg)
        return gmax, _exact_mean_fallback(rd, cfg, gmax)

    cmax = np.zeros(S, np.float32)
    cmin = np.full((rd.nchunks, S), np.inf, np.float32)
    totals = [0] * S
    resmax = 0.0
    pend: deque = deque()

    def drain():
        nonlocal resmax
        c, h = pend.popleft()
        cm, cn, hi, lo, rm = ST.unpack_stats(np.asarray(h))
        np.maximum(cmax, cm, out=cmax)
        cmin[c] = cn
        for s in range(S):
            totals[s] += _levels_to_int(hi[s], lo[s])
        resmax = max(resmax, float(rm))

    for c in range(rd.nchunks):
        dev, nf = rd.chunk_dev(c)
        pend.append((c, ST.chunk_stats(dev, jnp.asarray(nf), cfg)))
        if len(pend) > _LAG:
            drain()
    while pend:
        drain()

    gmax = cmax
    active = (rd.T_s > 0) & (gmax > 0)
    if resmax > 0 or np.any(active & (gmax < 1e-30)):
        # a log output below 2^-34 or a floor below the provisional tiny
        # floor would break the split's exactness envelope — take the
        # exact-f64 logm path instead (never observed; belt and braces)
        return gmax, _exact_mean_fallback(rd, cfg, gmax)

    # floor correction: any chunk whose min |STFT| can fall below the
    # final whitening floor gets one chunk_stats_below dispatch.  The
    # host-side floor only FLAGS chunks (1e-6 slack over-flags, never
    # under-flags); the device recomputes its own f32 floor exactly.
    floor = np.where(active, (np.maximum(gmax, np.float32(1e-37))
                              / np.float32(1e6)) * (1 + 1e-6), 0.0)
    flagged = np.nonzero((cmin < floor[None, :]).any(axis=1))[0]
    gmax_j = jnp.asarray(gmax)
    for c in flagged:
        dev, nf = rd.chunk_dev(int(c))
        cnt, bhi, blo, lfs, rm = ST.unpack_stats_below(np.asarray(
            ST.chunk_stats_below(dev, jnp.asarray(nf), gmax_j, cfg)))
        if float(rm) > 0:
            return gmax, _exact_mean_fallback(rd, cfg, gmax)
        for s in range(S):
            if cnt[s]:
                lf = (((int(lfs[s][0]) - int(lfs[s][3])) << 44)
                      + ((int(lfs[s][1]) - int(lfs[s][4])) << 22)
                      + (int(lfs[s][2]) - int(lfs[s][5])))
                bs = [int(v) * 65536 for v in bhi[s]]
                bl = [int(v) for v in blo[s]]
                blev = [a + b for a, b in zip(bs, bl)]
                bsum = (((blev[0] - blev[3]) << 44)
                        + ((blev[1] - blev[4]) << 22) + (blev[2] - blev[5]))
                totals[s] += int(cnt[s]) * lf - bsum

    mean = np.zeros(S, np.float32)
    for s in range(S):
        if rd.T_s[s] > 0:
            mean[s] = np.float32(
                float(Fraction(totals[s], 1 << 58)) / (int(rd.T_s[s]) * F))
    return gmax, mean


def _gmax_only(rd: _ChunkReader, cfg: PipelineConfig) -> np.ndarray:
    """Per-shift global |STFT| max via the fused stats kernel (sums
    discarded) — used when the chunk size exceeds the integer-sum
    envelope."""
    import jax.numpy as jnp

    S = len(rd.offs)
    gmax = np.zeros(S, np.float32)
    for c in range(rd.nchunks):
        dev, nf = rd.chunk_dev(c)
        cm = np.asarray(ST.chunk_mag_max_rows(dev, jnp.asarray(nf), cfg))
        np.maximum(gmax, cm, out=gmax)
    return gmax


def _exact_mean_fallback(rd: _ChunkReader, cfg: PipelineConfig,
                         gmax: np.ndarray) -> np.ndarray:
    """v1-grade pass B, batched over shifts: fetch the (S, T, 257) f32
    log magnitudes and accumulate exactly in f64 on host (exact at these
    magnitudes/counts; see ops/streaming.py pass-B note)."""
    import jax.numpy as jnp

    S = len(rd.offs)
    totals = np.zeros(S, np.float64)
    gmax_j = jnp.asarray(np.asarray(gmax, np.float32))
    for c in range(rd.nchunks):
        dev, nf = rd.chunk_dev(c)
        logm = np.asarray(ST.chunk_logm(dev, gmax_j, cfg))
        for s in range(S):
            if nf[s]:
                totals[s] += float(np.sum(logm[s, : nf[s]].astype(np.float64)))
    F = cfg.n_fft // 2 + 1
    mean = np.zeros(S, np.float32)
    np.divide(totals, np.maximum(rd.T_s, 1) * F, out=totals)
    mean[:] = totals.astype(np.float32)
    return np.where(rd.T_s > 0, mean, 0.0).astype(np.float32)


def _peaks_pass(rd: _ChunkReader, cfg: PipelineConfig, gmax: np.ndarray,
                mean: np.ndarray):
    """Chunked whiten -> HPF -> forward prune for all shifts at once;
    carries stay on device between dispatches.  Returns per shift
    (pk_t int64, pk_pos int64, pk_val f32, last_row f32 (F,))."""
    import jax.numpy as jnp

    S = len(rd.offs)
    F = cfg.n_bins
    xprev = jnp.zeros((S, F), jnp.float32)
    yprev = jnp.zeros((S, F), jnp.float32)
    env = jnp.zeros((S, F), jnp.float32)
    gmax_j = jnp.asarray(np.asarray(gmax, np.float32))
    mean_j = jnp.asarray(np.asarray(mean, np.float32))

    ts = [[] for _ in range(S)]
    poss = [[] for _ in range(S)]
    vals = [[] for _ in range(S)]
    last_row = np.zeros((S, F), np.float32)
    pend: deque = deque()
    k = cfg.maxpksperframe

    def drain():
        c, nf, h = pend.popleft()
        bins_h, valid_h, vals_h, lrow = ST.unpack_fwd_peaks(
            np.asarray(h), rd.Tc, k)
        for s in range(S):
            n = int(nf[s])
            if not n:
                continue
            tloc, slot = np.nonzero(valid_h[s, :n])
            ts[s].append(tloc.astype(np.int64) + c * rd.Tc)
            poss[s].append(bins_h[s, :n][tloc, slot])
            vals[s].append(vals_h[s, :n][tloc, slot])
            last_row[s] = lrow[s]

    for c in range(rd.nchunks):
        dev, nf = rd.chunk_dev(c)
        packed, env, xprev, yprev = ST.chunk_fwd_peaks(
            dev, jnp.asarray(nf), gmax_j, mean_j,
            xprev, yprev, env, cfg, c == 0)
        pend.append((c, nf, packed))
        if len(pend) > _LAG:
            drain()
    while pend:
        drain()

    def cat(parts, dt):
        return (np.concatenate(parts) if parts
                else np.zeros(0, dt))

    return [(cat(ts[s], np.int64), cat(poss[s], np.int64),
             cat(vals[s], np.float32), last_row[s]) for s in range(S)]


#: None = auto (device pairing off the cpu backend, host oracle on cpu —
#: the kernel's static (Tp, A) pads cost more than the tiny host loop at
#: CPU speeds); tests override to pin device/host equality explicitly.
PAIR_ON_DEVICE: bool | None = None


def _pow2(n: int, lo: int = 128) -> int:
    return max(lo, 1 << (max(1, int(n)) - 1).bit_length())


def _pair_on_device(kept: list, Tmax: int, cfg: PipelineConfig) -> list:
    """Pair the FINAL kept peak streams on device: one batched
    ops/streaming.pair_kept_slots dispatch for all shifts, one packed
    fetch (anchor times are already on host).  Content-identical to the
    oracle peaks2landmarks/landmarks2hashes pairing (the kernel replicates
    its (dt asc, partner-bin asc, maxpairsperpeak) scan exactly —
    tests/test_streaming.py pins equality against the host path).

    kept: per shift (t ascending, bin ascending within frame) kept-peak
    arrays, or None for inactive shifts.  Returns per ACTIVE shift an
    (n, 2) int32 (t, hash) row array, in shift order."""
    import jax.numpy as jnp

    K = cfg.maxpksperframe
    act = [x for x in kept if x is not None and len(x[0])]
    if not act:
        return []
    Tp = _pow2(Tmax)
    A = _pow2(max(len(x[0]) for x in act))
    S = len(kept)
    slots = np.zeros((S, Tp, K), np.int16)
    anchors = np.zeros((S, A), np.int32)
    n_a = [0] * S
    for s, x in enumerate(kept):
        if x is None or len(x[0]) == 0:
            continue
        t, p = x
        slot = np.arange(len(t)) - np.searchsorted(t, t)  # rank in frame
        slots[s, t, slot] = p.astype(np.int16) + 1
        anchors[s, : len(t)] = (t * K + slot).astype(np.int32)
        n_a[s] = len(t)
    g = np.asarray(ST.pair_kept_slots(
        jnp.asarray(slots), jnp.asarray(anchors), cfg))
    out = []
    for s in range(S):
        n = n_a[s]
        if not n:
            continue
        gs = g[s, :n]                                   # (n, fanout)
        lv = (gs >> 20) > 0
        tt = np.broadcast_to(kept[s][0][:, None], gs.shape)[lv]
        out.append(np.stack([tt, (gs & 0xFFFFF)[lv]],
                            axis=1).astype(np.int32))
    return out


def _analyzer_params(cfg: PipelineConfig) -> P.AnalyzerParams:
    return P.AnalyzerParams(
        density=cfg.density, n_fft=cfg.n_fft, n_hop=cfg.n_hop,
        shifts=cfg.shifts, maxpksperframe=cfg.maxpksperframe,
        maxpairsperpeak=cfg.maxpairsperpeak, f_sd=cfg.f_sd,
        targetdf=cfg.targetdf, mindt=cfg.mindt, targetdt=cfg.targetdt,
        hpf_pole=cfg.hpf_pole)


def wavfile2hashes_streaming(filename: str, cfg: PipelineConfig,
                             target_sr: int, chunk_frames: int = 8192,
                             stats=None) -> tuple[np.ndarray, float]:
    """File -> (sorted unique (N, 2) int32 (t, hash) rows, duration_sec).

    `stats`: optional per-shift list of (gmax, mean) whitening-stat
    overrides (testing hook — lets equality tests pin the one scalar whose
    reduction order differs from the single-batch path).
    """
    src = open_stream_source(filename, target_sr)
    try:
        dur = src.n_samples / float(target_sr)
        rd = _ChunkReader(src, cfg, chunk_frames)
        S = len(rd.offs)
        if rd.nchunks == 0:
            return np.zeros((0, 2), np.int32), dur

        if stats is None:
            gmax, mean = _stats_pass(rd, cfg)
        else:
            gmax = np.asarray([s[0] for s in stats], np.float32)
            mean = np.asarray([s[1] for s in stats], np.float32)

        ap = _analyzer_params(cfg)
        per_shift = _peaks_pass(rd, cfg, gmax, mean)
        kept: list = []
        for s in range(S):
            if not (rd.T_s[s] > 0 and gmax[s] > 0):
                kept.append(None)   # empty/all-zero shift emits no peaks
                continue
            pk_t, pk_pos, pk_val, lrow = per_shift[s]
            sel = oa.bwd_prune_sparse(int(rd.T_s[s]), pk_t, pk_pos,
                                      pk_val, lrow, ap)
            kept.append((pk_t[sel], pk_pos[sel]))

        use_dev = PAIR_ON_DEVICE
        if use_dev is None:
            import jax
            use_dev = jax.default_backend() != "cpu"
        if use_dev:
            all_h = _pair_on_device(kept, int(rd.T_s.max()), cfg)
        else:
            all_h = []
            for x in kept:
                if x is None or not len(x[0]):
                    continue
                pklist = list(zip(x[0].tolist(), x[1].tolist()))
                all_h.append(oa.landmarks2hashes(
                    oa.peaks2landmarks(pklist, ap)))

        if not all_h:
            return np.zeros((0, 2), np.int32), dur
        h = np.concatenate(all_h, axis=0)
        if h.size == 0:
            return np.zeros((0, 2), np.int32), dur
        return np.unique(h, axis=0).astype(np.int32), dur
    finally:
        src.close()
