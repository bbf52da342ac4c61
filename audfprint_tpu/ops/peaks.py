"""Decaying-threshold spectral peak picking on device (JAX/XLA).

Forward + backward masking-envelope prunes over a batch of spectrograms,
vectorized across (batch, freq) and sequential in time via `lax.scan`
(SURVEY §7 "Hard parts": the envelope is a data-dependent scan; parallelism
comes from the batch axis).

Spec: oracle `fwd_prune` / `bwd_prune` in audfprint_tpu/oracle/analyze.py
(reference _decaying_threshold_fwd_prune / _bwd_prune_peaks,
audfprint_analyze.py:~200-278).  Given the same float32 spectrogram these
produce bit-identical peak masks:

  * within-frame ordering (val desc, pos desc) is realized exactly via
    top_k on the bin-reversed array (XLA top_k breaks ties by lower index
    = higher original bin),
  * the gaussian masking bump is gathered from the same tabulated
    full-support template as the oracle,
  * envelopes are provably nonnegative, so "no update outside the bump
    support" == "max with 0" — letting updates be full-width vector maxes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audfprint_tpu import params as P
from audfprint_tpu.ops.config import PipelineConfig

_NEG = -jnp.inf


def _gauss_table(cfg: PipelineConfig) -> np.ndarray:
    """(F, F) table: gtab[p, j] = template value of a bump at p evaluated
    at j (full support), shared with the oracle."""
    gvec = P.gaussian_template(cfg.f_sd, cfg.gsize).astype(np.float32)
    gsize = cfg.gsize
    F = cfg.n_bins
    off = np.arange(F)[None, :] - np.arange(F)[:, None]   # j - p
    inside = np.abs(off) <= gsize
    return np.where(inside, gvec[np.clip(off + gsize, 0, 2 * gsize)], 0.0
                    ).astype(np.float32)


def locmax2(s: jax.Array) -> jax.Array:
    """Vectorized reference locmax over the last axis (oracle `locmax`)."""
    ge = s[..., 1:] >= s[..., :-1]
    tr = jnp.ones(s.shape[:-1] + (1,), bool)
    fa = jnp.zeros(s.shape[:-1] + (1,), bool)
    nbr = jnp.concatenate([tr, ge], axis=-1)       # nbr[i] = rise into i
    nbr_next = jnp.concatenate([ge, fa], axis=-1)  # nbr[i+1]
    return nbr & ~nbr_next


def _spread_vector(v: jax.Array, gtab: jax.Array) -> jax.Array:
    """Oracle spreadpeaksinvector: max of bumps at local maxima of v, (B,F)."""
    lm = locmax2(v)
    contrib = jnp.where(lm[:, :, None], v[:, :, None] * gtab[None], 0.0)
    return jnp.max(contrib, axis=1)


def _topk_valdesc_posdesc(m: jax.Array, k: int):
    """Top-k of masked values (mask -> -inf) ordered by (val desc, pos desc).

    Returns (vals (B,k), pos (B,k) int32, valid (B,k) bool).
    """
    F = m.shape[-1]
    vals, ridx = jax.lax.top_k(m[:, ::-1], k)
    pos = (F - 1) - ridx
    return vals, pos.astype(jnp.int32), vals > _NEG


@functools.partial(jax.jit, static_argnames=("cfg",))
def fwd_prune(sgram: jax.Array, n_frames: jax.Array,
              cfg: PipelineConfig) -> jax.Array:
    """(B, T, F) f32, (B,) int32 -> (B, T, F) bool forward-pass peak mask."""
    B, T, F = sgram.shape
    k = cfg.maxpksperframe
    gtab = jnp.asarray(_gauss_table(cfg))
    a_dec = jnp.float32(cfg.a_dec)
    binid = jnp.arange(F, dtype=jnp.int32)

    # initial envelope: spread of per-bin max over the first <=10 valid frames
    t10 = jnp.minimum(10, jnp.maximum(1, n_frames))
    sel = jnp.arange(T)[None, :] < t10[:, None]
    vmax = jnp.max(jnp.where(sel[:, :, None], sgram, _NEG), axis=1)
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
    env0 = _spread_vector(vmax, gtab)

    sg_tm = jnp.transpose(sgram, (1, 0, 2))               # (T,B,F)
    active_tm = (jnp.arange(T)[:, None] < n_frames[None, :])  # (T,B)

    def step(sthresh, inp):
        s, active = inp
        cand = locmax2(s) & (s > sthresh) & active[:, None]
        vals, pos, pvalid = _topk_valdesc_posdesc(
            jnp.where(cand, s, _NEG), k)
        rows = gtab[pos]                                   # (B,k,F)
        contrib = jnp.where(pvalid[:, :, None], vals[:, :, None] * rows, 0.0)
        new = jnp.maximum(sthresh, jnp.max(contrib, axis=1)) * a_dec
        mask = jnp.any((pos[:, :, None] == binid) & pvalid[:, :, None], axis=1)
        return new, mask

    _, peaks_tm = jax.lax.scan(step, env0, (sg_tm, active_tm))
    return jnp.transpose(peaks_tm, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("cfg", "use_env_in"))
def fwd_prune_carry(sgram: jax.Array, n_frames: jax.Array,
                    env_in: jax.Array, cfg: PipelineConfig,
                    use_env_in: bool):
    """fwd_prune with an explicit threshold-envelope carry (streaming
    ingest, ops/streaming.py).  use_env_in=False seeds the envelope from
    the first <=10 valid frames exactly as fwd_prune (the oracle's
    whole-file initialization); True continues from `env_in` (1, F).
    Returns (peak mask (B, T, F), envelope after the last frame).

    The per-frame decay multiplies after EVERY scan step, so the carry-out
    equals the single-batch envelope only when every frame of the chunk is
    valid — the streaming driver keeps all chunks full except the last,
    whose carry is never consumed."""
    B, T, F = sgram.shape
    k = cfg.maxpksperframe
    gtab = jnp.asarray(_gauss_table(cfg))
    a_dec = jnp.float32(cfg.a_dec)
    binid = jnp.arange(F, dtype=jnp.int32)

    if use_env_in:
        env0 = env_in
    else:
        t10 = jnp.minimum(10, jnp.maximum(1, n_frames))
        sel = jnp.arange(T)[None, :] < t10[:, None]
        vmax = jnp.max(jnp.where(sel[:, :, None], sgram, _NEG), axis=1)
        vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
        env0 = _spread_vector(vmax, gtab)

    sg_tm = jnp.transpose(sgram, (1, 0, 2))
    active_tm = (jnp.arange(T)[:, None] < n_frames[None, :])

    def step(sthresh, inp):
        s, active = inp
        cand = locmax2(s) & (s > sthresh) & active[:, None]
        vals, pos, pvalid = _topk_valdesc_posdesc(
            jnp.where(cand, s, _NEG), k)
        rows = gtab[pos]
        contrib = jnp.where(pvalid[:, :, None], vals[:, :, None] * rows, 0.0)
        new = jnp.maximum(sthresh, jnp.max(contrib, axis=1)) * a_dec
        mask = jnp.any((pos[:, :, None] == binid) & pvalid[:, :, None], axis=1)
        return new, mask

    env_out, peaks_tm = jax.lax.scan(step, env0, (sg_tm, active_tm))
    return jnp.transpose(peaks_tm, (1, 0, 2)), env_out


@functools.partial(jax.jit, static_argnames=("cfg",))
def bwd_prune(sgram: jax.Array, peaks: jax.Array, n_frames: jax.Array,
              cfg: PipelineConfig) -> jax.Array:
    """Backward prune of fwd-pass peaks -> final (B, T, F) bool mask."""
    B, T, F = sgram.shape
    k = cfg.maxpksperframe
    gtab = jnp.asarray(_gauss_table(cfg))
    a_dec = jnp.float32(cfg.a_dec)
    binid = jnp.arange(F, dtype=jnp.int32)

    # initial envelope: spread of the last valid frame (per file)
    last_idx = jnp.maximum(0, n_frames - 1)
    last = jnp.take_along_axis(sgram, last_idx[:, None, None], axis=1)[:, 0]
    env0 = _spread_vector(last, gtab)

    sg_rev = jnp.transpose(sgram, (1, 0, 2))[::-1]        # (T,B,F), t desc
    pk_rev = jnp.transpose(peaks, (1, 0, 2))[::-1]
    t_rev = jnp.arange(T - 1, -1, -1)

    def step(sthresh, inp):
        s, fwdmask, t = inp
        sthresh = jnp.where((t == n_frames - 1)[:, None], env0, sthresh)
        cand = fwdmask & (t < n_frames)[:, None]
        vals, pos, pvalid = _topk_valdesc_posdesc(
            jnp.where(cand, s, _NEG), k)
        kept = jnp.zeros((B, F), bool)
        # sequential within-frame acceptance (oracle bwd_prune inner loop)
        for i in range(k):
            v, p, pv = vals[:, i], pos[:, i], pvalid[:, i]
            cur = jnp.take_along_axis(sthresh, p[:, None], axis=1)[:, 0]
            keep = pv & (v >= cur)
            contrib = jnp.where(keep[:, None], v[:, None] * gtab[p], 0.0)
            sthresh = jnp.maximum(sthresh, contrib)
            kept = kept | ((p[:, None] == binid) & keep[:, None])
        return sthresh * a_dec, kept

    _, kept_rev = jax.lax.scan(step, env0, (sg_rev, pk_rev, t_rev))
    kept = jnp.transpose(kept_rev[::-1], (1, 0, 2))       # (B,T,F)
    # a kept peak at (t, p) deletes any kept peak at (t+1, p)
    # (oracle bwd_prune "delete any following peak")
    kept_prev = jnp.concatenate(
        [jnp.zeros((B, 1, F), bool), kept[:, :-1]], axis=1)
    return kept & ~kept_prev


@functools.partial(jax.jit, static_argnames=("cfg",))
def find_peaks_mask(sgram: jax.Array, n_frames: jax.Array,
                    cfg: PipelineConfig) -> jax.Array:
    return bwd_prune(sgram, fwd_prune(sgram, n_frames, cfg), n_frames, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mask_to_slots(mask: jax.Array, cfg: PipelineConfig):
    """(B, T, F) bool -> (bins (B,T,k) int32 ascending, valid (B,T,k) bool).

    Dense per-frame peak lists in ascending-bin order (the reference's
    peaks_at[col] ordering, since np.nonzero returns ascending bins).
    """
    F = mask.shape[-1]
    k = cfg.maxpksperframe
    key = jnp.where(mask, F - jnp.arange(F, dtype=jnp.int32), 0)
    tops = []
    for _ in range(k):       # unique keys: k max-extractions == top-k
        v = jnp.max(key, axis=-1, keepdims=True)
        tops.append(v)
        key = jnp.where(key == v, 0, key)
    topv = jnp.concatenate(tops, axis=-1)    # desc key = asc bin
    valid = topv > 0
    bins = jnp.where(valid, F - topv, 0).astype(jnp.int32)
    return bins, valid
