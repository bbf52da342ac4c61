"""Landmark pairing + 20-bit hash packing on device (JAX/XLA).

Static-shape formulation of the reference's peaks2landmarks /
landmarks2hashes (audfprint_analyze.py:~370-410, :~100-130; SURVEY §7
layer 2): every anchor peak gets exactly `maxpairsperpeak` landmark slots
with a validity mask; partner selection order (dt asc, partner-bin asc)
and the |df| < targetdf window replicate the oracle exactly, so packed
hashes are bit-identical given the same peak slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from audfprint_tpu import params as P
from audfprint_tpu.ops.config import PipelineConfig


def pack_hashes(f1: jax.Array, f2: jax.Array, dt: jax.Array) -> jax.Array:
    """20-bit hash: ((f1 & 0xFF) << 12) | ((f2-f1 & 0x3F) << 6) | (dt & 0x3F)."""
    f1 = f1.astype(jnp.int32)
    return (((f1 & P.F1_MASK) << P.F1_SHIFT)
            | (((f2.astype(jnp.int32) - f1) & P.DF_MASK) << P.DF_SHIFT)
            | (dt.astype(jnp.int32) & P.DT_MASK))


@functools.partial(jax.jit, static_argnames=("cfg",))
def slots_to_hashes(bins: jax.Array, valid: jax.Array, cfg: PipelineConfig):
    """Per-frame peak slots -> per-anchor landmark hashes.

    lax.scan over the (targetdt - mindt) dt offsets with a small carry
    (per-anchor fill count + fanout partner slots): each step examines the
    K partner slots of frame t+dt in bin-ascending order and appends the
    qualifying ones — exactly the reference's (dt asc, partner-bin asc)
    scan order.  Replaces the dense (B, T, K, ndt, K) candidate tensor of
    slots_to_hashes_dense (~1 GB of HBM traffic at B=128): the carry is
    ~(B, T, K, fanout) and each step touches O(B*T*K) elements.

    Args:
      bins:  (B, T, K) int32 peak bins, ascending per frame
      valid: (B, T, K) bool

    Returns:
      times:  (B, T, K, fanout) int32 anchor frame index
      hashes: (B, T, K, fanout) int32 packed 20-bit hashes
      lvalid: (B, T, K, fanout) bool
    """
    B, T, K = bins.shape
    fanout = cfg.maxpairsperpeak
    pad = jnp.zeros((B, cfg.targetdt, K), bins.dtype)
    vpad = jnp.zeros((B, cfg.targetdt, K), bool)
    bins_p = jnp.concatenate([bins, pad], axis=1)     # (B, T+targetdt, K)
    valid_p = jnp.concatenate([valid, vpad], axis=1)
    foid = jnp.arange(fanout, dtype=jnp.int32)

    def step(carry, d):
        count, f2s, dts = carry
        pbin = jax.lax.dynamic_slice_in_dim(bins_p, d, T, axis=1)
        pval = jax.lax.dynamic_slice_in_dim(valid_p, d, T, axis=1)
        for j in range(K):                 # partner slots, bin ascending
            f2j = pbin[:, :, j][:, :, None]            # (B, T, 1)
            okj = (valid & pval[:, :, j][:, :, None]
                   & (jnp.abs(f2j - bins) < cfg.targetdf)
                   & (count < fanout))                 # (B, T, K)
            write = okj[..., None] & (count[..., None] == foid)
            f2s = jnp.where(write, f2j[..., None], f2s)
            dts = jnp.where(write, d, dts)
            count = count + okj.astype(jnp.int32)
        return (count, f2s, dts), None

    count0 = jnp.zeros((B, T, K), jnp.int32)
    f2s0 = jnp.zeros((B, T, K, fanout), jnp.int32)
    dts0 = jnp.zeros((B, T, K, fanout), jnp.int32)
    (count, f2s, dts), _ = jax.lax.scan(
        step, (count0, f2s0, dts0),
        jnp.arange(cfg.mindt, cfg.targetdt, dtype=jnp.int32))
    lvalid = foid[None, None, None, :] < count[..., None]
    hashes = pack_hashes(bins[:, :, :, None], f2s, dts)
    times = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :, None, None], hashes.shape)
    return times, jnp.where(lvalid, hashes, 0), lvalid


@functools.partial(jax.jit, static_argnames=("cfg",))
def slots_to_hashes_dense(bins: jax.Array, valid: jax.Array,
                          cfg: PipelineConfig):
    """Dense one-shot formulation (the round-1 path), kept for equivalence
    testing: materializes every (anchor, dt, partner) candidate at once.

    Args/returns: as slots_to_hashes.
    """
    B, T, K = bins.shape
    fanout = cfg.maxpairsperpeak
    ndt = cfg.targetdt - cfg.mindt          # candidate dt values
    ncand = ndt * K                          # per-anchor candidates, scan order

    # partner[b, t, d, j] = peak slot j at frame t + mindt + d
    pad = jnp.zeros((B, cfg.targetdt, K), bins.dtype)
    vpad = jnp.zeros((B, cfg.targetdt, K), bool)
    bins_p = jnp.concatenate([bins, pad], axis=1)
    valid_p = jnp.concatenate([valid, vpad], axis=1)
    tidx = (jnp.arange(T)[:, None] + jnp.arange(cfg.mindt, cfg.targetdt)[None, :])
    part_bins = bins_p[:, tidx]              # (B, T, ndt, K)
    part_valid = valid_p[:, tidx]            # (B, T, ndt, K)

    f1 = bins[:, :, :, None, None]           # (B,T,K,1,1)
    f2 = part_bins[:, :, None, :, :]         # (B,T,1,ndt,K)
    ok = (valid[:, :, :, None, None]
          & part_valid[:, :, None, :, :]
          & (jnp.abs(f2 - f1) < cfg.targetdf))  # (B,T,K,ndt,K)
    ok = ok.reshape(B, T, K, ncand)           # dt-major, partner-bin asc

    # first `fanout` valid candidates in scan order.  Keys are unique
    # (ncand - idx when valid), so `fanout` iterative max-extractions are
    # exactly top-k — far cheaper on TPU than lax.top_k's sort lowering
    # over a 305-wide axis (measured ~6x on the whole landmark stage).
    key = jnp.where(ok, ncand - jnp.arange(ncand, dtype=jnp.int32), 0)
    tops = []
    for _ in range(fanout):
        v = jnp.max(key, axis=-1, keepdims=True)     # (B,T,K,1)
        tops.append(v)
        key = jnp.where(key == v, 0, key)
    topv = jnp.concatenate(tops, axis=-1)            # (B,T,K,fanout)
    lvalid = topv > 0
    cand = jnp.where(lvalid, ncand - topv, 0)  # candidate index
    d_idx = cand // K
    j_idx = cand % K
    # gather partner bin for each chosen candidate
    flat = part_bins.reshape(B, T, ndt * K)
    f2sel = jnp.take_along_axis(flat[:, :, None, :], cand, axis=-1)
    dt = (d_idx + cfg.mindt).astype(jnp.int32)
    hashes = pack_hashes(bins[:, :, :, None], f2sel, dt)
    times = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :, None, None], hashes.shape)
    return times, jnp.where(lvalid, hashes, 0), lvalid
