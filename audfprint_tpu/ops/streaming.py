"""Chunked streaming analysis ops — unbounded-length ingest (SURVEY §5
long-audio plan; reference behavior anchor: wavfile2hashes,
audfprint_analyze.py:~430, which analyzes whole files in memory).

The single-batch pipeline loads the entire file as one padded device row;
a multi-hour input would mean a multi-GB host buffer.  This module
analyzes a file in fixed-size FRAME-ALIGNED chunks with every piece of
cross-chunk state carried exactly, so host and device memory stay
O(chunk) while results match the single-batch device path:

  pass A  global max of |STFT| over valid frames.  Max is associative —
          the chunked max is bit-identical to the single-batch one.
  pass B  global scalar whitening mean of the log-floored magnitudes
          (oracle: sgram -= mean(sgram)).  Per-chunk (T, 257) float32 log
          values are fetched and accumulated on host in float64, which is
          EXACT for these magnitudes and counts (each f32 carries 24
          mantissa bits, per-chunk partial sums stay < 2^44 ulps, and the
          final two-level f64 sum never rounds) — so the mean is the
          exactly-rounded mathematical mean of the same f32 values,
          independent of chunk size.  The single-batch path reduces the
          same values with XLA's f32 summation order, which can differ by
          ~1 ulp.  When the rounded scalars coincide, streamed hashes are
          bit-identical to the single-batch path end to end; when they
          differ, the reference's masking envelope is tie-chaotic (one
          flipped borderline peak re-routes later envelope comparisons),
          so only statistical agreement holds — exactly the sensitivity
          the upstream algorithm itself has across BLAS/fft builds.  The
          tests pin the strong claims that ARE order-free: chunk-size
          invariance unconditionally, and full bit-equality with the
          single-batch path under injected stats.
  pass C  whiten with the (gmax, mean) scalars -> onset HPF with carried
          (xprev, yprev) -> forward decaying-threshold prune with carried
          sthresh envelope -> compact per-frame (bin, value) peak lists.
          Every recurrence crosses chunk boundaries through its exact
          float32 carry, so per-element arithmetic is identical to the
          single-batch scan.

The backward prune needs future context (it runs time-reversed from the
file end), but it only touches the ~density·dur surviving forward peaks —
a sparse stream.  The host runs the exact oracle backward prune over that
sparse list (oracle.analyze.bwd_prune_sparse), then pairs and hashes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from audfprint_tpu import params as P
from audfprint_tpu.ops import peaks as PK
from audfprint_tpu.ops import spectro as SP
from audfprint_tpu.ops.config import PipelineConfig


def chunk_samples(chunk_frames: int, cfg: PipelineConfig) -> int:
    """Samples per full chunk: frame t of chunk c starts at sample
    (c*chunk_frames + t) * n_hop, so consecutive chunks overlap by
    n_fft - n_hop samples and chunk c covers exactly chunk_frames frames."""
    return (chunk_frames - 1) * cfg.n_hop + cfg.n_fft


def _mag(audio: jax.Array, cfg: PipelineConfig) -> jax.Array:
    """(1, N) f32 -> (1, T, 257) |STFT| — same framing/window/rfft graph as
    spectro.whitened_logmag."""
    window = jnp.asarray(P.hann_window(cfg.n_fft), dtype=jnp.float32)
    frames = SP.frame_batch(audio.astype(jnp.float32), cfg)
    return jnp.abs(jnp.fft.rfft(frames * window, axis=-1))


@functools.partial(jax.jit, static_argnames=("cfg",))
def chunk_mag_max(audio: jax.Array, n_frames: jax.Array,
                  cfg: PipelineConfig) -> jax.Array:
    """Pass A step: max |STFT| over this chunk's valid frames (scalar)."""
    mag = _mag(audio, cfg)
    T = mag.shape[1]
    vmask = (jnp.arange(T)[None, :] < n_frames[:, None])[:, :, None]
    return jnp.max(jnp.where(vmask, mag, 0.0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def chunk_logm(audio: jax.Array, gmax: jax.Array,
               cfg: PipelineConfig) -> jax.Array:
    """Pass B step: log-floored magnitudes (1, T, 257) given the global
    max — identical elementwise formula to whitened_logmag's logm."""
    mag = _mag(audio, cfg)
    return jnp.log(jnp.maximum(mag, jnp.maximum(gmax, 1e-37) / 1e6))


@functools.partial(jax.jit, static_argnames=("cfg", "first"))
def chunk_fwd_peaks(audio: jax.Array, n_frames: jax.Array, gmax: jax.Array,
                    mean: jax.Array, xprev: jax.Array, yprev: jax.Array,
                    env: jax.Array, cfg: PipelineConfig, first: bool):
    """Pass C step: one chunk through whiten -> HPF -> forward prune.

    All three recurrences (HPF xprev/yprev, prune sthresh) enter and leave
    through explicit carries; `first` selects the oracle's first-10-frames
    envelope seeding instead of the carried envelope.

    Returns (bins (1,T,k) ascending per frame, valid (1,T,k), vals (1,T,k)
    whitened-HPF values at the peaks, last_row (1,F) whitened row at frame
    n_frames-1, env', xprev', yprev')."""
    logm = chunk_logm(audio, gmax, cfg)
    white = (logm - mean)[:, :, : cfg.n_bins]

    pole = jnp.float32(cfg.hpf_pole ** (1.0 / P.OVERSAMP))

    def hpf_step(carry, x):
        xp, yp = carry
        y = (x - xp) + pole * yp
        return (x, y), y

    x_tm = jnp.transpose(white, (1, 0, 2))                    # (T,1,F)
    (xprev2, yprev2), y_tm = jax.lax.scan(hpf_step, (xprev, yprev), x_tm)
    y = jnp.transpose(y_tm, (1, 0, 2))                        # (1,T,F)

    mask, env2 = PK.fwd_prune_carry(y, n_frames, env, cfg, not first)
    bins, valid = PK.mask_to_slots(mask, cfg)
    vals = jnp.take_along_axis(y, bins, axis=-1)
    vals = jnp.where(valid, vals, 0.0)
    last_idx = jnp.maximum(0, n_frames - 1)
    last_row = jnp.take_along_axis(y, last_idx[:, None, None], axis=1)[:, 0]
    return bins, valid, vals, last_row, env2, xprev2, yprev2
