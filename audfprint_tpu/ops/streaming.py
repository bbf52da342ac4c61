"""Chunked streaming analysis ops — unbounded-length ingest (SURVEY §5
long-audio plan; reference behavior anchor: wavfile2hashes,
audfprint_analyze.py:~430, which analyzes whole files in memory).

The single-batch pipeline loads the entire file as one padded device row;
a multi-hour input would mean a multi-GB host buffer.  This module
analyzes a file in fixed-size FRAME-ALIGNED chunks with every piece of
cross-chunk state carried exactly, so host and device memory stay
O(chunk) while results match the single-batch device path.  Two device
passes per chunk, all shifts batched as rows (v2, round 5; v1 ran three
serial passes per shift):

  stats pass (chunk_stats)  per shift row: global max of |STFT| over
          valid frames (associative -> the chunked max is bit-identical
          to the single-batch one), the valid min (floor-correction
          flag), and EXACT integer level sums of log(max(mag, tiny))
          via a 3-level fixed-point split (_split3): the whitening mean
          (oracle: sgram -= mean(sgram)) is reconstructed on host from
          arbitrary-precision integer totals, so it is the
          correctly-rounded mathematical mean of the same f32 values,
          independent of chunk size BY CONSTRUCTION.  Chunks holding
          entries below the final floor gmax/1e6 get one correction
          dispatch (chunk_stats_below) that swaps those entries'
          summands for log(floor) — still integer-exact.  The
          single-batch path reduces the same values with XLA's f32
          summation order, which can differ by ~1 ulp.  When the rounded
          scalars coincide, streamed hashes are bit-identical to the
          single-batch path end to end; when they differ, the
          reference's masking envelope is tie-chaotic (one flipped
          borderline peak re-routes later envelope comparisons), so only
          statistical agreement holds — exactly the sensitivity the
          upstream algorithm itself has across BLAS/fft builds.  The
          tests pin the strong claims that ARE order-free: chunk-size
          invariance unconditionally (including through the floor
          correction), and full bit-equality with the single-batch path
          under injected stats.
  peaks pass (chunk_fwd_peaks)  whiten with the per-shift (gmax, mean)
          vectors -> onset HPF with carried (xprev, yprev) -> forward
          decaying-threshold prune with carried sthresh envelope ->
          compact per-frame (bin, value) peak lists.  Every recurrence
          crosses chunk boundaries through its exact float32 carry, so
          per-element arithmetic is identical to the single-batch scan.

The backward prune needs future context (it runs time-reversed from the
file end), but it only touches the ~density·dur surviving forward peaks —
a sparse stream.  The host runs the exact oracle backward prune over that
sparse list (oracle.analyze.bwd_prune_sparse), then pairs and hashes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.ops import peaks as PK
from audfprint_tpu.ops import spectro as SP
from audfprint_tpu.ops.config import PipelineConfig


def chunk_samples(chunk_frames: int, cfg: PipelineConfig) -> int:
    """Samples per full chunk: frame t of chunk c starts at sample
    (c*chunk_frames + t) * n_hop, so consecutive chunks overlap by
    n_fft - n_hop samples and chunk c covers exactly chunk_frames frames."""
    return (chunk_frames - 1) * cfg.n_hop + cfg.n_fft


def _to_f32(audio: jax.Array) -> jax.Array:
    """Device-side PCM conversion: int16 rows -> exactly the float32
    samples utils.audio.buf_to_float produces on host (cast then divide
    by 2^15 — both exact in f32), so raw int16 staging halves the
    host->device bytes without changing one bit downstream."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) / jnp.float32(32768.0)
    return audio.astype(jnp.float32)


def _mag(audio: jax.Array, cfg: PipelineConfig) -> jax.Array:
    """(S, N) f32/int16 -> (S, T, 257) |STFT| — same framing/window/rfft
    graph as spectro.whitened_logmag."""
    window = jnp.asarray(P.hann_window(cfg.n_fft), dtype=jnp.float32)
    frames = SP.frame_batch(_to_f32(audio), cfg)
    return jnp.abs(jnp.fft.rfft(frames * window, axis=-1))


@functools.partial(jax.jit, static_argnames=("cfg",))
def chunk_mag_max(audio: jax.Array, n_frames: jax.Array,
                  cfg: PipelineConfig) -> jax.Array:
    """Max |STFT| over this chunk's valid frames (scalar over all rows)."""
    mag = _mag(audio, cfg)
    T = mag.shape[1]
    vmask = (jnp.arange(T)[None, :] < n_frames[:, None])[:, :, None]
    return jnp.max(jnp.where(vmask, mag, 0.0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def chunk_mag_max_rows(audio: jax.Array, n_frames: jax.Array,
                       cfg: PipelineConfig) -> jax.Array:
    """Per-shift-row max |STFT| over valid frames ((S,) vector) — the
    oversized-chunk fallback where the fused integer sums would overflow
    (models/streaming._gmax_only)."""
    mag = _mag(audio, cfg)
    T = mag.shape[1]
    vmask = (jnp.arange(T)[None, :] < n_frames[:, None])[:, :, None]
    return jnp.max(jnp.where(vmask, mag, 0.0), axis=(1, 2))


def _split3(x: jax.Array):
    """Exact 3-level fixed-point split of a NON-NEGATIVE f32 array:
    x == f0*2^-14 + f1*2^-36 + f2*2^-58 + res, with f0/f1/f2 integer-valued
    and res == 0 for every f32 whose lowest mantissa bit is >= 2^-58.

    Each step is exact in f32: multiplying by a power of two only shifts
    the exponent, and t - floor(t) for t >= 0 never rounds (f0 == 0 makes
    it the identity; t >= 1 makes both operands multiples of ulp(t) with a
    sub-1.0 difference).  Per-frame int32 sums of the levels therefore
    reconstruct the EXACT sum of the f32 values — the order-free integer
    arithmetic that makes the streamed whitening mean chunking-invariant
    (models/streaming.py).  Level-0 magnitudes stay < 2^21 (|log| < 100
    after the 1e-43 floor) and levels 1/2 < 2^22, so 257-bin frame sums
    fit int32."""
    t = x * jnp.float32(16384.0)                      # 2^14
    f0 = jnp.floor(t)
    t = (t - f0) * jnp.float32(4194304.0)             # 2^22
    f1 = jnp.floor(t)
    t = (t - f1) * jnp.float32(4194304.0)             # 2^22
    f2 = jnp.floor(t)
    return f0, f1, f2, t - f2


#: Maximum chunk_frames the int32 hi/lo limb reduction below stays
#: overflow-free for (lo sums < T * 2^16 must fit int32).
STATS_MAX_FRAMES = 16384


def _sum6(s: jax.Array, take: jax.Array):
    """Signed exact sums: s (S,T,F) f32, take (S,T,F) bool ->
    (hi (S,6) int32, lo (S,6) int32) per-shift level sums (pos 3 levels,
    then neg 3), where level total = hi*2^16 + lo exactly.

    Per-frame int32 level sums stay < 257*2^22 = 2^30.  Splitting each
    into (>>16, &0xFFFF) limbs before the T-axis reduction keeps both
    int32-safe for T <= STATS_MAX_FRAMES (lo < T*2^16 <= 2^30,
    hi < T*2^14 <= 2^28) and shrinks the host fetch from (S,T,6) to two
    (S,6) words."""
    pos = jnp.where(take, jnp.maximum(s, 0.0), 0.0)
    neg = jnp.where(take, jnp.maximum(-s, 0.0), 0.0)
    p0, p1, p2, rp = _split3(pos)
    n0, n1, n2, rn = _split3(neg)
    frame = jnp.stack(
        [lvl.astype(jnp.int32).sum(axis=-1)
         for lvl in (p0, p1, p2, n0, n1, n2)], axis=-1)   # (S,T,6)
    hi = (frame >> 16).sum(axis=1)
    lo = (frame & 0xFFFF).sum(axis=1)
    return hi, lo, jnp.maximum(jnp.max(rp), jnp.max(rn))


def _tiny_floor() -> jax.Array:
    """Provisional log floor used before gmax is known.  Must be a NORMAL
    f32 (TPUs flush subnormals to zero, and log(0) = -inf would poison the
    integer sums), <= any plausible final floor so log(max(mag, tiny)) ==
    log(mag) for every entry at or above the final floor (the driver
    falls back to the exact f64 pass when gmax is so small that the final
    floor max(gmax,1e-37)/1e6 dips below this), and > 0 so the log is
    finite.  finfo(f32).tiny = 2^-126: |log| <= 87.34 keeps the level-0
    split magnitudes < 2^21."""
    return jnp.float32(np.finfo(np.float32).tiny)


def _bc_f32_i32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def unpack_stats(p: np.ndarray):
    """Host-side unpack of chunk_stats' packed (S, 15) int32 row block ->
    (cmax (S,) f32, cmin (S,) f32, hi (S,6) i32, lo (S,6) i32, resmax f32)."""
    cmax = p[:, 0].view(np.float32)
    cmin = p[:, 1].view(np.float32)
    return cmax, cmin, p[:, 2:8], p[:, 8:14], p[:, 14].view(np.float32).max()


@functools.partial(jax.jit, static_argnames=("cfg",))
def chunk_stats(audio: jax.Array, n_frames: jax.Array, cfg: PipelineConfig):
    """Fused stats pass (round 5): ONE dispatch per chunk replaces the old
    separate pass-A (max) and pass-B (full-logm fetch) dispatches, and the
    whole result rides ONE (S, 15) int32 fetch (each relay round trip is
    ~30 ms; five small fetches were real money).

    Packed columns (unpack with unpack_stats), per shift row:
      0     cmax f32 bitcast: max |STFT| over valid frames (associative
            -> exact),
      1     cmin f32 bitcast: min |STFT| over valid frames (+inf when
            none) — lets the driver detect chunks holding entries below
            the FINAL whitening floor gmax/1e6, which then get one
            correction dispatch (chunk_stats_below),
      2-13  hi/lo (6 each) int32 limb pairs: exact level sums of
            log(max(mag, tiny)) as hi*2^16 + lo (see _split3/_sum6;
            valid for T <= STATS_MAX_FRAMES),
      14    resmax f32 bitcast (same value every row): max split
            residual — 0 unless a log output falls below 2^-34 in
            magnitude, which f32 log cannot produce
            (|log(1 +/- ulp)| >= ~2^-25); checked on host."""
    mag = _mag(audio, cfg)
    T = mag.shape[1]
    vmask = (jnp.arange(T)[None, :] < n_frames[:, None])[:, :, None]
    cmax = jnp.max(jnp.where(vmask, mag, 0.0), axis=(1, 2))
    cmin = jnp.min(jnp.where(vmask, mag, jnp.inf), axis=(1, 2))
    s = jnp.log(jnp.maximum(mag, _tiny_floor()))
    hi, lo, resmax = _sum6(s, jnp.broadcast_to(vmask, s.shape))
    S = mag.shape[0]
    return jnp.concatenate([
        _bc_f32_i32(cmax)[:, None], _bc_f32_i32(cmin)[:, None], hi, lo,
        jnp.broadcast_to(_bc_f32_i32(resmax), (S,))[:, None]], axis=1)


def unpack_stats_below(p: np.ndarray):
    """Host-side unpack of chunk_stats_below's packed (S, 20) int32 ->
    (cnt (S,), bhi (S,6), blo (S,6), lfsplit (S,6), resmax f32)."""
    return (p[:, 0], p[:, 1:7], p[:, 7:13], p[:, 13:19],
            p[:, 19].view(np.float32).max())


@functools.partial(jax.jit, static_argnames=("cfg",))
def chunk_stats_below(audio: jax.Array, n_frames: jax.Array,
                      gmax: jax.Array, cfg: PipelineConfig):
    """Floor correction for chunks whose min valid |STFT| fell below the
    final whitening floor: the fused stats pass summed log(max(mag, tiny))
    for those entries, but the true summand is log(floor).

    Returns ONE packed (S, 20) int32 block (unpack_stats_below):
    cnt (entries below floor), bhi/blo (6 each: exact limb sums of
    log(max(mag, tiny)) restricted to those entries), lfsplit (6: exact
    split of log(floor)), resmax f32 bitcast.  Host fixes:
    total += cnt*lf - bsums (all integer-exact)."""
    mag = _mag(audio, cfg)
    T = mag.shape[1]
    vmask = (jnp.arange(T)[None, :] < n_frames[:, None])[:, :, None]
    floor = jnp.maximum(gmax, 1e-37)[:, None, None] / 1e6
    below = vmask & (mag < floor)
    cnt = below.sum(axis=(1, 2)).astype(jnp.int32)
    s = jnp.log(jnp.maximum(mag, _tiny_floor()))
    bhi, blo, res1 = _sum6(s, below)
    lf = jnp.log(floor[:, 0, 0])                       # (S,)
    lp0, lp1, lp2, rp = _split3(jnp.maximum(lf, 0.0))
    ln0, ln1, ln2, rn = _split3(jnp.maximum(-lf, 0.0))
    lfsplit = jnp.stack([lp0, lp1, lp2, ln0, ln1, ln2],
                        axis=-1).astype(jnp.int32)
    resmax = jnp.maximum(res1, jnp.maximum(jnp.max(rp), jnp.max(rn)))
    S = mag.shape[0]
    return jnp.concatenate([
        cnt[:, None], bhi, blo, lfsplit,
        jnp.broadcast_to(_bc_f32_i32(resmax), (S,))[:, None]], axis=1)


def _row_bcast(v: jax.Array) -> jax.Array:
    """Scalar stays scalar; a per-shift (S,) stats vector broadcasts over
    each row's (T, F) plane."""
    v = jnp.asarray(v, jnp.float32)
    return v[:, None, None] if v.ndim == 1 else v


@functools.partial(jax.jit, static_argnames=("cfg",))
def chunk_logm(audio: jax.Array, gmax: jax.Array,
               cfg: PipelineConfig) -> jax.Array:
    """Log-floored magnitudes (B, T, 257) given the global max (scalar, or
    (B,) per shift row) — identical elementwise formula to
    whitened_logmag's logm."""
    mag = _mag(audio, cfg)
    return jnp.log(jnp.maximum(mag, jnp.maximum(_row_bcast(gmax), 1e-37)
                               / 1e6))


def unpack_fwd_peaks(p: np.ndarray, T: int, k: int):
    """Host-side unpack of chunk_fwd_peaks' packed (S, T*k*2 + F) int32 ->
    (bins (S,T,k) int32, valid (S,T,k) bool, vals (S,T,k) f32,
    last_row (S,F) f32)."""
    S = p.shape[0]
    w = p[:, : T * k].reshape(S, T, k)
    vals = p[:, T * k: 2 * T * k].view(np.float32).reshape(S, T, k)
    lrow = p[:, 2 * T * k:].view(np.float32)
    return (w & 0x1FF).astype(np.int32), (w >> 9).astype(bool), vals, lrow


@functools.partial(jax.jit, static_argnames=("cfg",))
def pair_kept_slots(slots: jax.Array, anchors: jax.Array,
                    cfg: PipelineConfig) -> jax.Array:
    """Landmark pairing of the FINAL (post-backward-prune) peak stream on
    device — replaces the streamed driver's host oracle pairing loop
    (O(peaks * targetdt * k) pure Python; ~minutes of tail for a 10 h
    file) with one dispatch through the batch path's exact pairing kernel
    (ops/landmarks.slots_to_hashes, oracle-parity pinned by its tests).

    slots:   (S, Tp, K) int16 — kept peak bin + 1 per frame in ascending
             bin order, 0 = empty slot (frames past the file are all 0,
             which correctly yields no partners past the end).
    anchors: (S, A) int32 flat t*K + slot indices of the kept peaks
             (padding gathers garbage rows the host slices off).
    Returns (S, A, fanout) int32: packed 20-bit hash | valid << 20.
    The anchor times are already known on host (they ARE the kept peak
    times), so this is the only fetch."""
    from audfprint_tpu.ops import landmarks as L

    bins = jnp.maximum(slots.astype(jnp.int32) - 1, 0)
    valid = slots > 0
    _times, hashes, lvalid = L.slots_to_hashes(bins, valid, cfg)
    S, Tp, K = slots.shape
    flat = (hashes | (lvalid.astype(jnp.int32) << 20)).reshape(
        S, Tp * K, cfg.maxpairsperpeak)
    return jnp.take_along_axis(flat, anchors[:, :, None], axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "first"))
def chunk_fwd_peaks(audio: jax.Array, n_frames: jax.Array, gmax: jax.Array,
                    mean: jax.Array, xprev: jax.Array, yprev: jax.Array,
                    env: jax.Array, cfg: PipelineConfig, first: bool):
    """Peaks pass: one chunk through whiten -> HPF -> forward prune.

    All three recurrences (HPF xprev/yprev, prune sthresh) enter and leave
    through explicit carries; `first` selects the oracle's first-10-frames
    envelope seeding instead of the carried envelope.

    Returns (packed (S, T*k*2 + F) int32 — ONE fetch via unpack_fwd_peaks:
    per frame the k ascending peak bins with a valid flag at bit 9, the
    whitened-HPF values at the peaks (f32 bitcast), and the whitened row
    at frame n_frames-1 (the sparse backward prune's envelope seed) —
    plus the device-resident carries env', xprev', yprev', which chain
    straight into the next chunk's dispatch without any host sync."""
    logm = chunk_logm(audio, gmax, cfg)
    white = (logm - _row_bcast(mean))[:, :, : cfg.n_bins]

    pole = jnp.float32(cfg.hpf_pole ** (1.0 / P.OVERSAMP))

    def hpf_step(carry, x):
        xp, yp = carry
        y = (x - xp) + pole * yp
        return (x, y), y

    x_tm = jnp.transpose(white, (1, 0, 2))                    # (T,S,F)
    (xprev2, yprev2), y_tm = jax.lax.scan(hpf_step, (xprev, yprev), x_tm)
    y = jnp.transpose(y_tm, (1, 0, 2))                        # (S,T,F)

    mask, env2 = PK.fwd_prune_carry(y, n_frames, env, cfg, not first)
    bins, valid = PK.mask_to_slots(mask, cfg)
    vals = jnp.take_along_axis(y, bins, axis=-1)
    vals = jnp.where(valid, vals, 0.0)
    last_idx = jnp.maximum(0, n_frames - 1)
    last_row = jnp.take_along_axis(y, last_idx[:, None, None], axis=1)[:, 0]
    S, T, k = bins.shape
    packed = jnp.concatenate([
        (bins | (valid.astype(jnp.int32) << 9)).reshape(S, T * k),
        _bc_f32_i32(vals).reshape(S, T * k),
        _bc_f32_i32(last_row)], axis=1)
    return packed, env2, xprev2, yprev2
