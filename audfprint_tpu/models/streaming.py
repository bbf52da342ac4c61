"""Streaming (chunked) ingest driver — analyze unbounded audio with
O(chunk) host and device memory (SURVEY §5 long-audio plan; reference
anchor: wavfile2hashes, audfprint_analyze.py:~430, which holds the whole
file in memory).

Orchestrates the three device passes of ops/streaming.py per shift
(global max -> exact whitening mean -> carried HPF + forward prune), runs
the exact sparse backward prune on host (oracle.analyze.bwd_prune_sparse),
then pairs and hashes the sparse peak stream with the oracle's exact
pairing.  Chunk size only changes memory and dispatch granularity —
results are bit-identical across chunk sizes (tests/test_streaming.py),
and bit-identical to the single-batch device path whenever the one
order-sensitive scalar (the f32 whitening mean) rounds identically (see
ops/streaming.py pass B for the honest contract).

v1 scope: ranged reads need a PCM WAV already at the analysis sample rate
(chunked resampling would need FIR-phase-aligned halos; production ingest
pipelines normalize rates upstream).  Other inputs raise StreamUnsupported
and callers fall back to the in-memory batched path.
"""

from __future__ import annotations

import wave

import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.oracle import analyze as oa
from audfprint_tpu.ops import streaming as ST
from audfprint_tpu.ops.config import PipelineConfig
from audfprint_tpu.utils import audio as audio_io


class StreamUnsupported(Exception):
    """Input cannot be streamed (not PCM WAV at the analysis rate)."""


class WavPCMSource:
    """Ranged sample reads from a PCM WAV at the analysis sample rate.

    Per-sample conversion (buf_to_float + float32 channel mean) is local,
    so chunked reads are bit-identical to utils.audio._read_wav's
    whole-file decode of the same ranges."""

    def __init__(self, filename: str, sr: int):
        try:
            self._w = wave.open(filename, "rb")
        except (wave.Error, EOFError, OSError) as e:
            raise StreamUnsupported(f"not a PCM WAV: {filename}: {e}") from e
        if self._w.getframerate() != sr:
            rate = self._w.getframerate()
            self._w.close()
            raise StreamUnsupported(
                f"{filename}: sample rate {rate} != analysis rate {sr}; "
                "streamed ingest needs pre-resampled input")
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

    def close(self):
        self._w.close()


def _shift_stream_hashes(src: WavPCMSource, offset: int, cfg: PipelineConfig,
                         chunk_frames: int, stats=None) -> np.ndarray:
    """One shift's full stream: passes A/B/C + sparse bwd + pairing."""
    import jax.numpy as jnp

    n = src.n_samples - offset
    if n < cfg.n_fft:
        return np.zeros((0, 2), np.int32)
    T = 1 + (n - cfg.n_fft) // cfg.n_hop
    Tc = int(chunk_frames)
    Nc = ST.chunk_samples(Tc, cfg)
    nchunks = -(-T // Tc)

    def chunk_audio(c: int) -> tuple[np.ndarray, int]:
        t0 = c * Tc
        nf = min(Tc, T - t0)
        x = src.read(offset + t0 * cfg.n_hop, Nc)
        buf = np.zeros((1, Nc), np.float32)
        buf[0, : len(x)] = x
        return buf, nf

    nf_full = np.asarray([Tc], np.int32)
    if stats is None:
        # pass A: global max (associative -> chunking-invariant)
        gmax = np.float32(0.0)
        for c in range(nchunks):
            buf, nf = chunk_audio(c)
            m = np.asarray(ST.chunk_mag_max(
                jnp.asarray(buf), jnp.asarray([nf], np.int32), cfg))
            gmax = max(gmax, np.float32(m))
        if not gmax > 0.0:
            return np.zeros((0, 2), np.int32)   # all-zero signal: no peaks
        # pass B: exact mean of the f32 log-floored magnitudes.  float64
        # accumulation of f32 values never rounds at these magnitudes and
        # counts (see ops/streaming.py), so the mean is the exactly-rounded
        # mathematical mean — independent of chunk size.
        total = 0.0
        gmax_j = jnp.float32(gmax)
        for c in range(nchunks):
            buf, nf = chunk_audio(c)
            logm = np.asarray(ST.chunk_logm(jnp.asarray(buf), gmax_j, cfg))
            total += float(np.sum(logm[0, :nf].astype(np.float64)))
        mean = np.float32(total / (T * logm.shape[-1]))
    else:
        gmax, mean = np.float32(stats[0]), np.float32(stats[1])
        if not gmax > 0.0:
            return np.zeros((0, 2), np.int32)

    # pass C: carried HPF + forward prune; collect the sparse peak stream
    F = cfg.n_bins
    xprev = jnp.zeros((1, F), jnp.float32)
    yprev = jnp.zeros((1, F), jnp.float32)
    env = jnp.zeros((1, F), jnp.float32)
    gmax_j, mean_j = jnp.float32(gmax), jnp.float32(mean)
    ts, poss, vals = [], [], []
    last_row = np.zeros(F, np.float32)
    for c in range(nchunks):
        buf, nf = chunk_audio(c)
        bins_d, valid_d, vals_d, lrow, env, xprev, yprev = ST.chunk_fwd_peaks(
            jnp.asarray(buf), jnp.asarray([nf], np.int32), gmax_j, mean_j,
            xprev, yprev, env, cfg, c == 0)
        bins_h = np.asarray(bins_d)[0]          # (Tc, k)
        valid_h = np.asarray(valid_d)[0]
        vals_h = np.asarray(vals_d)[0]
        tloc, slot = np.nonzero(valid_h[:nf])
        ts.append(tloc.astype(np.int64) + c * Tc)
        poss.append(bins_h[:nf][tloc, slot])
        vals.append(vals_h[:nf][tloc, slot])
        last_row = np.asarray(lrow)[0]

    pk_t = np.concatenate(ts) if ts else np.zeros(0, np.int64)
    pk_pos = np.concatenate(poss) if poss else np.zeros(0, np.int64)
    pk_val = np.concatenate(vals) if vals else np.zeros(0, np.float32)

    ap = P.AnalyzerParams(
        density=cfg.density, n_fft=cfg.n_fft, n_hop=cfg.n_hop,
        shifts=cfg.shifts, maxpksperframe=cfg.maxpksperframe,
        maxpairsperpeak=cfg.maxpairsperpeak, f_sd=cfg.f_sd,
        targetdf=cfg.targetdf, mindt=cfg.mindt, targetdt=cfg.targetdt,
        hpf_pole=cfg.hpf_pole)
    keep = oa.bwd_prune_sparse(T, pk_t, pk_pos, pk_val, last_row, ap)
    pklist = list(zip(pk_t[keep].tolist(), pk_pos[keep].tolist()))
    return oa.landmarks2hashes(oa.peaks2landmarks(pklist, ap))


def wavfile2hashes_streaming(filename: str, cfg: PipelineConfig,
                             target_sr: int, chunk_frames: int = 8192,
                             stats=None) -> tuple[np.ndarray, float]:
    """File -> (sorted unique (N, 2) int32 (t, hash) rows, duration_sec).

    `stats`: optional per-shift list of (gmax, mean) whitening-stat
    overrides (testing hook — lets equality tests pin the one scalar whose
    reduction order differs from the single-batch path).
    """
    src = WavPCMSource(filename, target_sr)
    try:
        dur = src.n_samples / float(target_sr)
        all_h = []
        for s in range(max(1, cfg.shifts)):
            off = s * cfg.n_hop // max(1, cfg.shifts)
            all_h.append(_shift_stream_hashes(
                src, off, cfg, chunk_frames,
                None if stats is None else stats[s]))
        h = np.concatenate(all_h, axis=0)
        if h.size == 0:
            return np.zeros((0, 2), np.int32), dur
        return np.unique(h, axis=0).astype(np.int32), dur
    finally:
        src.close()
