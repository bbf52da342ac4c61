"""Batched spectrogram front end on device (JAX/XLA).

Audio batch (B, N) -> whitened, onset-HPF'd log-magnitude spectrogram
(B, T, n_bins) with per-file valid-frame masking (padded rows contribute
nothing to the max/mean statistics and produce no peaks downstream).

Spec: oracle `audfprint_tpu.oracle.analyze.spectrogram` (reference
audfprint_analyze.py find_peaks steps 1-3, SURVEY §2.3.3; stft.py §2.3.2).
Everything is float32; the framing, |rfft|, log floor, scalar-mean whitening,
and causal first-order HPF mirror the oracle exactly (summation order of the
mean is the only XLA-vs-NumPy difference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.ops.config import PipelineConfig


def n_frames_padded(n_samples_padded: int, cfg: PipelineConfig) -> int:
    if n_samples_padded < cfg.n_fft:
        return 0
    return 1 + (n_samples_padded - cfg.n_fft) // cfg.n_hop


def frame_batch(audio: jax.Array, cfg: PipelineConfig) -> jax.Array:
    """(B, N) -> (B, T, n_fft) overlapping frames, frame t starts at t*n_hop.

    For the default 50% overlap (n_hop = n_fft/2) this is a cheap
    reshape+concat; otherwise a gather.
    """
    B, N = audio.shape
    T = n_frames_padded(N, cfg)
    if T <= 0:
        return jnp.zeros((B, 0, cfg.n_fft), audio.dtype)
    if cfg.n_hop * 2 == cfg.n_fft:
        n_blocks = N // cfg.n_hop
        blocks = audio[:, : n_blocks * cfg.n_hop].reshape(B, n_blocks, cfg.n_hop)
        frames = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=-1)
        return frames[:, :T]
    idx = (np.arange(T)[:, None] * cfg.n_hop + np.arange(cfg.n_fft)[None, :])
    return audio[:, idx]


@functools.partial(jax.jit, static_argnames=("cfg",))
def whitened_logmag(audio: jax.Array, n_frames: jax.Array,
                    cfg: PipelineConfig) -> jax.Array:
    """(B, N) float32, (B,) int32 -> pre-HPF whitened log-mag (B, T, n_bins).

    Rows t >= n_frames[b] carry arbitrary values and must be masked by the
    consumer (the peak picker masks on t < n_frames).
    """
    window = jnp.asarray(P.hann_window(cfg.n_fft), dtype=jnp.float32)
    frames = frame_batch(audio.astype(jnp.float32), cfg)      # (B,T,nfft)
    B, T, _ = frames.shape
    mag = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))      # (B,T,257)
    valid = (jnp.arange(T)[None, :] < n_frames[:, None])       # (B,T)
    vmask = valid[:, :, None]
    # log floor + scalar-mean whitening over valid frames only
    # (oracle: sgram = log(max(sgram, max/1e6)); sgram -= mean(sgram))
    mx = jnp.max(jnp.where(vmask, mag, 0.0), axis=(1, 2), keepdims=True)
    logm = jnp.log(jnp.maximum(mag, jnp.maximum(mx, 1e-37) / 1e6))
    nvalid = jnp.maximum(1, n_frames)[:, None, None].astype(jnp.float32)
    mean = (jnp.sum(jnp.where(vmask, logm, 0.0), axis=(1, 2), keepdims=True)
            / (nvalid * mag.shape[-1]))
    white = jnp.where(mx > 0.0, logm - mean, mag)  # zero signal passes raw
    # drop nyquist row (reference "[:-1,]"), keep n_bins
    return white[:, :, : cfg.n_bins]


def hpf(white: jax.Array, cfg: PipelineConfig) -> jax.Array:
    """Causal onset HPF along time: y[t] = (x[t]-x[t-1]) + pole*y[t-1]."""
    B = white.shape[0]
    pole = jnp.float32(cfg.hpf_pole ** (1.0 / P.OVERSAMP))

    def hpf_step(carry, x):
        xprev, yprev = carry
        y = (x - xprev) + pole * yprev
        return (x, y), y

    x_tm = jnp.transpose(white, (1, 0, 2))                      # (T,B,F)
    zero = jnp.zeros((B, cfg.n_bins), jnp.float32)
    _, y_tm = jax.lax.scan(hpf_step, (zero, zero), x_tm)
    return jnp.transpose(y_tm, (1, 0, 2))                       # (B,T,F)


@functools.partial(jax.jit, static_argnames=("cfg",))
def whitened_spectrogram(audio: jax.Array, n_frames: jax.Array,
                         cfg: PipelineConfig) -> jax.Array:
    """(B, N) float32, (B,) int32 -> HPF'd whitened log-mag (B, T, n_bins)."""
    return hpf(whitened_logmag(audio, n_frames, cfg), cfg)
