"""Fused Pallas TPU kernel: forward + backward decaying-threshold peak
pruning in a single pass over the time axis.

This is the hot sequential op of the whole framework (SURVEY §7 "Hard
parts": the masking envelope is a data-dependent scan).  Everything with no
data dependence on the envelope is hoisted OUT of the serial loop and
vectorized by XLA over all frames at once: the onset HPF, the locmax
computation, the length masking, and both initial envelopes.  The kernel
streams a single pre-masked CANDIDATE VALUE MAP

    m0[t, b, f] = y[t, b, f] if locmax & t < n_frames else -inf

and keeps only the irreducibly sequential work per frame:

  fwd pass  : cand = m0 > sthresh -> top-k by (val desc, pos desc) via k
              argmax/mask rounds (bumps are NOT in this chain: within a
              frame, acceptance tests the FRAME-START envelope only) ->
              ONE batched envelope raise for all k peaks on the MXU
              (exact one-hot x 3-way-bf16-split table matmul, see
              mxu_bump) -> decay.  Emits the frame's peaks as a COMPACT
              (pos, val) list — the fwd->bwd interchange (round 3:
              replaced the dense value map).
  bwd pass  : streams the compact lists in reverse — no candidate
              re-extraction (fwd already ordered them) — sequential
              within-frame acceptance, per-peak MXU envelope raise.
              Emits the kept peaks as a COMPACT per-frame (pos) list
              (round 3b: replaced the dense 0/1 map, halving the bwd
              output DMA and killing the downstream mask->top-k slot
              re-extraction — the dense mask is reconstructed only for
              tests via find_peaks_mask_fused).

Layout: (B_tile, 256) — batch on sublanes, freq on 2x128 lanes; the time
axis streams through VMEM in CHUNK-frame slabs with double-buffered DMA, so
VMEM use is T-independent (any clip length).  The serial chain is
VPU-work-bound (measured by ablation, DESIGN.md): moving the gaussian-row
gather from log2(F) conditional rolls to the otherwise-idle MXU took the
chip from ~75k to ~105k audio-sec/s.  The earlier roll formulation lives
in git history.  The XLA glue (find_peaks_mask_fused) applies the
reference's delete-next rule and is bit-identical to
ops.peaks.find_peaks_mask (tested on hardware, including tie-heavy
quantized inputs) and therefore to the NumPy oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audfprint_tpu import params as P
from audfprint_tpu.ops import peaks as PKref
from audfprint_tpu.ops import spectro as SP
from audfprint_tpu.ops.config import PipelineConfig

_NEG = -3.0e38  # python float: jnp scalars at module level would be
                # captured constants, which pallas_call rejects
CHUNK = 8       # frames per DMA slab


def _kernel(m0_hbm, nf_ref, env0f_ref, env0b_ref,
            g1_ref, g2_ref, g3_ref,
            peaks_hbm, keptmap_hbm,
            # scratch
            xbuf, cbuf, kbuf, in_sem, out_sem, kout_sem, sth,
            *, T: int, B: int, F: int, k: int, a_dec: float):
    C = CHUNK
    NC = T // C
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, F), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    nfb = nf_ref[:]                     # (B, 1) int32
    a = jnp.float32(a_dec)
    neg = jnp.float32(_NEG)

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            m0_hbm.at[pl.ds(c * C, C)], xbuf.at[slot], in_sem.at[slot])

    def dma_pk(direction, slot, c):
        """Compact per-frame peak lists (pos lanes 0..k-1, val lanes
        8..8+k-1): fwd writes them out, bwd streams them back in."""
        if direction == "out":
            return pltpu.make_async_copy(
                cbuf.at[slot], peaks_hbm.at[pl.ds(c * C, C)],
                out_sem.at[slot])
        return pltpu.make_async_copy(
            peaks_hbm.at[pl.ds(c * C, C)], cbuf.at[slot], in_sem.at[slot])

    def dma_kept_out(slot, c):
        return pltpu.make_async_copy(
            kbuf.at[slot], keptmap_hbm.at[pl.ds(c * C, C)], kout_sem.at[slot])

    def mxu_bump(onehot, ok):
        """Exact bump rows via the MXU: onehot (R, F) @ G (F, F) with G
        hand-split into three bf16 planes (g1 + g2 + g3 == G exactly in
        f32; each split strips 8 mantissa bits, 3x8 >= f32's 24).  Every
        output element is a SINGLE product 1.0 x gi[p, f] — no
        accumulation rounding — so (d1 + d2) + d3 reconstructs G[p, f]
        bit-exactly.  Offloads the fwd bump gather from the VPU (where
        the serial chain is work-bound, see DESIGN) to the idle MXU."""
        o = onehot.astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        d1 = jax.lax.dot_general(o, g1_ref[:], dn,
                                 preferred_element_type=jnp.float32)
        d2 = jax.lax.dot_general(o, g2_ref[:], dn,
                                 preferred_element_type=jnp.float32)
        d3 = jax.lax.dot_general(o, g3_ref[:], dn,
                                 preferred_element_type=jnp.float32)
        return jnp.where(ok, (d1 + d2) + d3, 0.0)

    # ---- forward pass ----
    sth[:] = env0f_ref[:]
    dma_in(0, 0).start()

    def fwd_chunk(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NC)
        def _():
            dma_in(1 - slot, c + 1).start()

        dma_in(slot, c).wait()

        @pl.when(c >= 2)
        def _():
            dma_pk("out", slot, c - 2).wait()

        for j in range(C):
            m0 = xbuf[slot, j]          # inactive frames pre-masked to -inf
            m = jnp.where(m0 > sth[:], m0, neg)
            # top-k by (val desc, pos desc), one slot at a time.  Bumps are
            # NOT in this dependency chain: within a frame, acceptance
            # tests against the FRAME-START envelope only (oracle
            # fwd_prune), so all k bumps batch into one gather afterwards.
            ps, vs, gots, hots = [], [], [], []
            for _i in range(k):
                v = jnp.max(m, axis=1, keepdims=True)      # (B,1)
                p = jnp.max(jnp.where(m == v, lane, -1), axis=1,
                            keepdims=True)                  # highest pos
                got = v > neg
                onehot = (lane == p) & got
                m = jnp.where(onehot, neg, m)
                ps.append(jnp.where(got, p, -1))
                vs.append(v)
                gots.append(got)
                hots.append(onehot)
            scaled = mxu_bump(
                jnp.concatenate(hots, axis=0), jnp.concatenate(gots, axis=0)
            ) * jnp.where(jnp.concatenate(gots, axis=0),
                          jnp.concatenate(vs, axis=0), 0.0)
            newenv = scaled[0:B]
            for i in range(1, k):       # max is exact: any order is equal
                newenv = jnp.maximum(newenv, scaled[i * B:(i + 1) * B])
            sth[:] = jnp.maximum(sth[:], newenv) * a
            # compact peak list out: pos (as f32, exact below 2^24; -1 =
            # absent) in lanes 0..k-1, values in lanes 8..8+k-1
            out = jnp.zeros((B, 128), jnp.float32)
            for i in range(k):
                out = jnp.where(lane128 == i, ps[i].astype(jnp.float32), out)
                out = jnp.where(lane128 == 8 + i, vs[i], out)
            cbuf[slot, j] = out
        dma_pk("out", slot, c).start()
        return 0

    jax.lax.fori_loop(0, NC, fwd_chunk, 0)
    dma_pk("out", jax.lax.rem(NC - 1, 2), NC - 1).wait()

    @pl.when(NC >= 2)
    def _():
        dma_pk("out", jax.lax.rem(NC - 2, 2), NC - 2).wait()

    # ---- backward pass (streams the compact accepted lists in reverse;
    # no candidate re-extraction: fwd already ordered them) ----
    sth[:] = env0b_ref[:]
    dma_pk("in", jax.lax.rem(NC - 1, 2), NC - 1).start()

    def bwd_chunk(i, _):
        c = NC - 1 - i
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            dma_pk("in", 1 - slot, c - 1).start()

        dma_pk("in", slot, c).wait()

        @pl.when(i >= 2)
        def _():
            dma_kept_out(slot, c + 2).wait()

        for j in range(C - 1, -1, -1):
            t = c * C + j
            pk = cbuf[slot, j]                         # (B, 128)
            sth[:] = jnp.where(t == nfb - 1, env0b_ref[:], sth[:])
            valid_t = t < nfb                          # (B,1)
            kslots = []
            # within-frame acceptance IS sequential here (a kept peak
            # masks later, weaker peaks of its own frame — oracle
            # bwd_prune), so the per-peak bump stays in the chain
            for _i2 in range(k):
                p = pk[:, _i2:_i2 + 1].astype(jnp.int32)
                v = pk[:, 8 + _i2:9 + _i2]
                got = p >= 0
                onehot = (lane == p) & got
                cur = jnp.max(jnp.where(onehot, sth[:], neg), axis=1,
                              keepdims=True)
                keep = got & valid_t & (v >= cur)
                contrib = mxu_bump(onehot, keep) * jnp.where(keep, v, 0.0)
                sth[:] = jnp.maximum(sth[:], contrib)
                kslots.append(jnp.where(keep, p.astype(jnp.float32), -1.0))
            sth[:] = sth[:] * a
            # compact kept list out: pos in lanes 0..k-1 (f32, exact below
            # 2^24; -1 = not kept), extraction order — same layout as the
            # fwd interchange
            out = jnp.zeros((B, 128), jnp.float32)
            for i in range(k):
                out = jnp.where(lane128 == i, kslots[i], out)
            kbuf[slot, j] = out
        dma_kept_out(slot, c).start()
        return 0

    jax.lax.fori_loop(0, NC, bwd_chunk, 0)
    dma_kept_out(0, 0).wait()

    @pl.when(NC >= 2)
    def _():
        dma_kept_out(1, 1).wait()


def _pad_b(B: int) -> int:
    return max(8, ((B + 7) // 8) * 8)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def fused_prune(sgram: jax.Array, n_frames: jax.Array, cfg: PipelineConfig,
                interpret: bool = False):
    """(B, T, F) pre-HPF whitened sgram -> (peaks_compact, keptmap).

    peaks_compact: (T, B, 128) f32 — the fwd pass's accepted peaks per
    frame in extraction order (pos lanes 0..k-1, -1 = absent; values lanes
    8..8+k-1).  This IS the fwd→bwd interchange (round 3: replaces the
    dense value map, cutting the bwd re-extraction reduces and 2x of the
    streamed bytes).
    kept: (B, T, k) int32 — positions the bwd pass kept, extraction order,
    -1 = not kept (before the delete-next rule, which the caller applies).
    Round 3b: compact output replaces the dense (B, T, F) 0/1 map — the
    bwd output DMA halves and the caller no longer re-extracts top-k
    slots from a dense mask.
    """
    B, T, F = sgram.shape
    k = cfg.maxpksperframe
    assert k <= 8, "fused kernel's compact peak layout caps pks/frame at 8"
    Bp = _pad_b(B)
    Tp = ((T + CHUNK - 1) // CHUNK) * CHUNK
    if Bp != B or Tp != T:
        sgram = jnp.pad(sgram, ((0, Bp - B), (0, Tp - T), (0, 0)))
        n_frames = jnp.concatenate(
            [n_frames, jnp.zeros(Bp - B, n_frames.dtype)])
    gtab = jnp.asarray(PKref._gauss_table(cfg))

    # envelope-independent precomputation, vectorized by XLA over all T:
    # HPF, locmax -> candidate value map (frames past n_frames pre-masked,
    # so the kernel's serial chain never touches the length vector), and
    # both initial envelopes
    y = SP.hpf(sgram, cfg)                           # (Bp, Tp, F)
    active = (jnp.arange(Tp)[None, :] < n_frames[:, None])[:, :, None]
    m0 = jnp.where(PKref.locmax2(y) & active, y, jnp.float32(_NEG))
    head = jnp.minimum(10, jnp.maximum(1, n_frames))
    sel = jnp.arange(Tp)[None, :] < head[:, None]
    vmax = jnp.max(jnp.where(sel[:, :, None], y, -jnp.inf), axis=1)
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
    env0f = PKref._spread_vector(vmax, gtab)
    last_idx = jnp.maximum(0, n_frames - 1)
    lastcol = jnp.take_along_axis(y, last_idx[:, None, None], axis=1)[:, 0]
    env0b = PKref._spread_vector(lastcol, gtab)

    # exact 3-way bf16 split of the (F, F) bump-row table for the fwd
    # pass's MXU gather (see _kernel.mxu_bump): g1+g2+g3 == gtab in f32
    g1 = gtab.astype(jnp.bfloat16)
    r2 = gtab - g1.astype(jnp.float32)
    g2b = r2.astype(jnp.bfloat16)
    g3b = (r2 - g2b.astype(jnp.float32)).astype(jnp.bfloat16)

    m0_tm = jnp.transpose(m0, (1, 0, 2))             # (Tp, Bp, F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # m0 stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # n_frames (Bp,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # env0f
            pl.BlockSpec(memory_space=pltpu.VMEM),    # env0b
            pl.BlockSpec(memory_space=pltpu.VMEM),    # g1 (bf16 split)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # g2
            pl.BlockSpec(memory_space=pltpu.VMEM),    # g3
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # peaks (Tp,Bp,128) HBM
            pl.BlockSpec(memory_space=pl.ANY),        # keptpos (Tp,Bp,128) HBM
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, Bp, F), jnp.float32),    # m0 stream-in
            pltpu.VMEM((2, CHUNK, Bp, 128), jnp.float32),  # compact peaks
            pltpu.VMEM((2, CHUNK, Bp, 128), jnp.float32),  # compact kept out
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Bp, F), jnp.float32),         # sthresh
        ],
    )
    kern = functools.partial(
        _kernel, T=Tp, B=Bp, F=F, k=k, a_dec=float(cfg.a_dec))
    peaks, keptpos = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(m0_tm, n_frames[:, None].astype(jnp.int32), env0f, env0b,
      g1, g2b, g3b)
    kept = jnp.transpose(keptpos, (1, 0, 2))[:B, :T, :k].astype(jnp.int32)
    return peaks, kept


def _delete_next_compact(kept: jax.Array):
    """Apply the reference's delete-next rule in the compact domain.

    kept: (B, T, k) int32 positions (-1 = not kept), PRE-rule.  A kept
    peak at (t, p) kills a kept peak at (t+1, p); kills test the PRE-rule
    frame t (a killed peak still kills its successor), exactly like the
    dense `kmask & ~shift(kmask)` formulation.  Returns (B, T, k) bool
    survivors."""
    B, T, k = kept.shape
    prev = jnp.concatenate(
        [jnp.full((B, 1, k), -1, kept.dtype), kept[:, :-1]], axis=1)
    dup = jnp.any(kept[..., :, None] == prev[..., None, :], axis=-1)
    return (kept >= 0) & ~dup


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def find_peaks_slots_fused(sgram_prehpf: jax.Array, n_frames: jax.Array,
                           cfg: PipelineConfig, interpret: bool = False):
    """Pre-HPF whitened sgram -> per-frame peak slots, no dense mask.

    Returns (bins (B, T, k) int32 ascending, valid (B, T, k) bool) —
    drop-in equal to ops.peaks.mask_to_slots(find_peaks_mask(hpf(sgram)))
    (pinned by test_pallas_peaks), but straight from the kernel's compact
    kept lists: the delete-next rule is k x k compares and the ascending
    order one tiny sort, instead of top-k re-extraction over (B, T, F)."""
    B, T, F = sgram_prehpf.shape
    _peaks, kept = fused_prune(sgram_prehpf, n_frames, cfg, interpret)
    surv = _delete_next_compact(kept)
    s = jnp.sort(jnp.where(surv, kept, F), axis=-1)   # asc, F = absent
    valid = s < F
    return jnp.where(valid, s, 0).astype(jnp.int32), valid


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def find_peaks_mask_fused(sgram_prehpf: jax.Array, n_frames: jax.Array,
                          cfg: PipelineConfig, interpret: bool = False):
    """Pre-HPF whitened sgram -> final (B, T, F) bool peak mask.

    Drop-in equal to ops.peaks.find_peaks_mask(hpf(sgram), ...) — the HPF
    lives in the XLA precomputation.  The dense mask is scattered from the
    kernel's compact kept lists (the product pipeline uses
    find_peaks_slots_fused and never materializes it; this form serves
    tests and mask-shaped callers)."""
    B, T, F = sgram_prehpf.shape
    _peaks, kept = fused_prune(sgram_prehpf, n_frames, cfg, interpret)
    k = kept.shape[-1]
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, T, k))
    tidx = jnp.broadcast_to(jnp.arange(T)[None, :, None], (B, T, k))
    kmask = jnp.zeros((B, T, F), bool).at[
        bidx, tidx, jnp.where(kept >= 0, kept, F)].set(
        True, mode="drop")                            # (B,T,F) pre-rule
    # delete-next rule: kept peak at (t, p) kills kept peak at (t+1, p)
    kprev = jnp.concatenate(
        [jnp.zeros((B, 1, F), bool), kmask[:, :-1]], axis=1)
    return kmask & ~kprev
