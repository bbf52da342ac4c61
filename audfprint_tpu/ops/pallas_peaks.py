"""Fused Pallas TPU kernel: onset HPF + forward + backward decaying-threshold
peak pruning in a single pass over the time axis.

This is the hot sequential op of the whole framework (SURVEY §7 "Hard
parts": the masking envelope is a data-dependent scan).  The XLA `lax.scan`
version (ops/peaks.py) pays per-iteration loop overhead twice (fwd + bwd);
this kernel keeps every carry in VMEM and runs both passes back-to-back:

  layout    : work arrays are (B_tile, 256) — batch on sublanes, freq on
              lanes (256 = 2x128 lanes), the natural VPU shape; no
              narrower-than-lane tensors anywhere (Mosaic-friendly)
  streaming : the (T, B, F) spectrogram stays in HBM and is streamed
              through VMEM in CHUNK-frame slabs with double-buffered DMA
              (one DMA wait per 8 frames, not per frame)
  fwd pass  : HPF recurrence -> locmax -> top-k by (val desc, pos desc)
              via k argmax/mask iterations -> envelope raise by gathering
              the tabulated gaussian row with a PER-ROW VARIABLE ROLL
              (log2(F) conditional whole-array rolls — pure data movement,
              bit-exact, no MXU precision passes; val*g multiplies on the
              VPU in f32).  Emits a sparse VALUE MAP per frame (accepted
              peaks keep their value, everything else -inf).
  bwd pass  : streams the value maps in reverse; candidates re-extracted
              with the same argmax trick (identical (val desc, pos desc)
              order), sequential within-frame acceptance, same variable-
              roll envelope raise.  Emits a 0/1 kept map per frame.

Because per-frame state is only (B, F), VMEM use is T-independent — any
clip length streams.  The XLA glue (find_peaks_mask_fused) applies the
reference's delete-next rule and is bit-identical to
ops.peaks.find_peaks_mask (tested) and therefore to the NumPy oracle.
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
from audfprint_tpu.ops.config import PipelineConfig

_NEG = -3.0e38  # python float: jnp scalars at module level would be
                # captured constants, which pallas_call rejects
CHUNK = 8       # frames per DMA slab


def _kernel(sgram_hbm, nf_ref, env0f_ref, gbase_ref,
            valmap_hbm, keptmap_hbm, lastcol_out,
            # scratch
            xbuf, vbuf, kbuf, in_sem, out_sem, kout_sem,
            sth, xprev, yprev, lastcol,
            *, T: int, B: int, F: int, k: int, pole: float, a_dec: float,
            gsize: int, f_sd: float):
    C = CHUNK
    NC = T // C
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, F), 1)
    nfb = nf_ref[:]                     # (B, 1) int32
    a = jnp.float32(a_dec)
    pol = jnp.float32(pole)
    neg = jnp.float32(_NEG)

    def dma_in(slot, c):
        return pltpu.make_async_copy(
            sgram_hbm.at[pl.ds(c * C, C)], xbuf.at[slot], in_sem.at[slot])

    def dma_val_in(slot, c):
        return pltpu.make_async_copy(
            valmap_hbm.at[pl.ds(c * C, C)], xbuf.at[slot], in_sem.at[slot])

    def dma_val_out(slot, c):
        return pltpu.make_async_copy(
            vbuf.at[slot], valmap_hbm.at[pl.ds(c * C, C)], out_sem.at[slot])

    def dma_kept_out(slot, c):
        return pltpu.make_async_copy(
            kbuf.at[slot], keptmap_hbm.at[pl.ds(c * C, C)], kout_sem.at[slot])

    def gather_bump(pos, ok):
        """Exact gaussian-bump row centered at per-row `pos` (B,1).

        gbase holds the tabulated template centered at lane 0; a per-row
        variable roll is realized as log2(F) conditional whole-array rolls
        (pure data movement — bit-exact, no MXU precision passes).  Lanes
        outside the +/-gsize support (including wrap-around) are masked.
        """
        row = gbase_ref[:] + jnp.zeros((B, F), jnp.float32)
        pc = jnp.maximum(pos, 0)
        for kb in range(8):          # F == 256
            bit = (pc >> kb) & 1
            row = jnp.where(bit == 1, pltpu.roll(row, 1 << kb, 1), row)
        return jnp.where(ok & (jnp.abs(lane - pos) <= gsize), row, 0.0)

    # ---- forward pass (HPF fused) ----
    sth[:] = env0f_ref[:]
    xprev[:] = jnp.zeros((B, F), jnp.float32)
    yprev[:] = jnp.zeros((B, F), jnp.float32)
    lastcol[:] = jnp.zeros((B, F), jnp.float32)
    dma_in(0, 0).start()

    def fwd_chunk(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NC)
        def _():
            dma_in(1 - slot, c + 1).start()

        dma_in(slot, c).wait()

        @pl.when(c >= 2)
        def _():
            dma_val_out(slot, c - 2).wait()

        for j in range(C):
            t = c * C + j
            x = xbuf[slot, j]
            y = (x - xprev[:]) + pol * yprev[:]
            xprev[:] = x
            yprev[:] = y
            active = t < nfb                           # (B,1)
            lastcol[:] = jnp.where(t == nfb - 1, y, lastcol[:])
            # locmax (reference convention)
            yl = pltpu.roll(y, 1, 1)                   # y[:, j-1]
            yr = pltpu.roll(y, F - 1, 1)               # y[:, j+1]
            rise = (y >= yl) | (lane == 0)
            fall = (lane == F - 1) | ~(yr >= y)
            cand = rise & fall & (y > sth[:]) & active
            m = jnp.where(cand, y, neg)
            # top-k by (val desc, pos desc), one slot at a time
            accmask = jnp.zeros((B, F), bool)
            newenv = jnp.zeros((B, F), jnp.float32)
            for i in range(k):
                v = jnp.max(m, axis=1, keepdims=True)      # (B,1)
                p = jnp.max(jnp.where(m == v, lane, -1), axis=1,
                            keepdims=True)                  # highest pos
                got = v > neg
                onehot = (lane == p) & got
                newenv = jnp.maximum(
                    newenv, gather_bump(p, got) * jnp.where(got, v, 0.0))
                accmask = accmask | onehot
                m = jnp.where(onehot, neg, m)
            sth[:] = jnp.maximum(sth[:], newenv) * a
            vbuf[slot, j] = jnp.where(accmask, y, neg)
        dma_val_out(slot, c).start()
        return 0

    jax.lax.fori_loop(0, NC, fwd_chunk, 0)
    dma_val_out(jax.lax.rem(NC - 1, 2), NC - 1).wait()

    @pl.when(NC >= 2)
    def _():
        dma_val_out(jax.lax.rem(NC - 2, 2), NC - 2).wait()

    lastcol_out[:] = lastcol[:]

    # ---- backward init envelope: spread of locmax(lastcol) ----
    lc = lastcol[:]
    ll = pltpu.roll(lc, 1, 1)
    lr = pltpu.roll(lc, F - 1, 1)
    lrise = (lc >= ll) | (lane == 0)
    lfall = (lane == F - 1) | ~(lr >= lc)
    mv = jnp.where(lrise & lfall, lc, 0.0)
    # max-of-bumps: env[j] = max_p mv[p] * gvec[j-p]; realized as 2*gsize+1
    # rolled multiplies (max-plus has no MXU form).  Each gvec value is the
    # same float64->float32 constant as the oracle's tabulated template.
    env = jnp.zeros((B, F), jnp.float32)
    for off in range(-gsize, gsize + 1):
        g = jnp.float32(np.exp(-0.5 * ((off / f_sd) ** 2)))
        shifted = pltpu.roll(mv, off % F, 1)
        okj = (lane - off >= 0) & (lane - off <= F - 1)
        env = jnp.maximum(env, jnp.where(okj, shifted * g, 0.0))
    sth[:] = env

    # ---- backward pass (streams valmap in reverse) ----
    dma_val_in(jax.lax.rem(NC - 1, 2), NC - 1).start()

    def bwd_chunk(i, _):
        c = NC - 1 - i
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            dma_val_in(1 - slot, c - 1).start()

        dma_val_in(slot, c).wait()

        @pl.when(i >= 2)
        def _():
            dma_kept_out(slot, c + 2).wait()

        for j in range(C - 1, -1, -1):
            t = c * C + j
            m = xbuf[slot, j]
            sth[:] = jnp.where(t == nfb - 1, env, sth[:])
            valid_t = t < nfb                          # (B,1)
            keptmask = jnp.zeros((B, F), bool)
            for _i2 in range(k):
                v = jnp.max(m, axis=1, keepdims=True)
                p = jnp.max(jnp.where(m == v, lane, -1), axis=1,
                            keepdims=True)
                onehot = (lane == p) & (v > neg)
                m = jnp.where(onehot, neg, m)
                cur = jnp.max(jnp.where(onehot, sth[:], neg), axis=1,
                              keepdims=True)
                keep = (v > neg) & valid_t & (v >= cur)
                contrib = gather_bump(p, keep) * jnp.where(keep, v, 0.0)
                sth[:] = jnp.maximum(sth[:], contrib)
                keptmask = keptmask | (onehot & keep)
            sth[:] = sth[:] * a
            kbuf[slot, j] = jnp.where(keptmask, 1.0, 0.0).astype(jnp.float32)
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
    """(B, T, F) pre-HPF whitened sgram -> (valmap, keptmap) (B, T, F).

    valmap: accepted fwd peaks carry their HPF'd value, else -inf.
    keptmap: 1.0 where the bwd pass kept the peak (before the delete-next
    rule, which the caller applies).
    """
    B, T, F = sgram.shape
    k = cfg.maxpksperframe
    Bp = _pad_b(B)
    Tp = ((T + CHUNK - 1) // CHUNK) * CHUNK
    if Bp != B or Tp != T:
        sgram = jnp.pad(sgram, ((0, Bp - B), (0, Tp - T), (0, 0)))
        n_frames = jnp.concatenate(
            [n_frames, jnp.zeros(Bp - B, n_frames.dtype)])
    gtab = jnp.asarray(PKref._gauss_table(cfg))
    # template centered at lane 0 (wrapped), for the kernel's variable-roll
    # gather: gbase[j] = gvec[d + gsize] for d = ((j+128)%256)-128 in support
    gvec = P.gaussian_template(cfg.f_sd).astype(np.float32)
    dd = ((np.arange(F) + F // 2) % F) - F // 2
    gbase = np.where(np.abs(dd) <= cfg.gsize,
                     gvec[np.clip(dd + cfg.gsize, 0, 2 * cfg.gsize)],
                     0.0).astype(np.float32)[None, :]
    # fwd init env: spread of per-bin max over first <=10 HPF'd frames —
    # computed in XLA on the (tiny) head slice, matching ops.peaks.fwd_prune
    head = jnp.minimum(10, jnp.maximum(1, n_frames))
    T10 = min(10, Tp)
    pole = jnp.float32(cfg.hpf_pole ** (1.0 / P.OVERSAMP))

    def hpf_step(carry, x):
        xp, yp = carry
        y = (x - xp) + pole * yp
        return (x, y), y

    zero = jnp.zeros((Bp, F), jnp.float32)
    _, yhead = jax.lax.scan(hpf_step, (zero, zero),
                            jnp.transpose(sgram[:, :T10], (1, 0, 2)))
    sel = jnp.arange(T10)[None, :] < head[:, None]
    vmax = jnp.max(jnp.where(sel.T[:, :, None], yhead, -jnp.inf), axis=0)
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
    env0f = PKref._spread_vector(vmax, gtab)

    sg_tm = jnp.transpose(sgram, (1, 0, 2))          # (Tp, Bp, F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # sgram stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # n_frames (Bp,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # env0f
            pl.BlockSpec(memory_space=pltpu.VMEM),    # gbase
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # valmap (Tp,Bp,F) HBM
            pl.BlockSpec(memory_space=pl.ANY),        # keptmap (Tp,Bp,F) HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # lastcol
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, Bp, F), jnp.float32),  # stream-in
            pltpu.VMEM((2, CHUNK, Bp, F), jnp.float32),  # valmap out
            pltpu.VMEM((2, CHUNK, Bp, F), jnp.float32),  # keptmap out
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Bp, F), jnp.float32),         # sthresh
            pltpu.VMEM((Bp, F), jnp.float32),         # xprev
            pltpu.VMEM((Bp, F), jnp.float32),         # yprev
            pltpu.VMEM((Bp, F), jnp.float32),         # lastcol
        ],
    )
    kern = functools.partial(
        _kernel, T=Tp, B=Bp, F=F, k=k,
        pole=float(cfg.hpf_pole ** (1.0 / P.OVERSAMP)),
        a_dec=float(cfg.a_dec), gsize=cfg.gsize, f_sd=float(cfg.f_sd))
    valmap, keptmap, lastcol = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, F), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, F), jnp.float32),
            jax.ShapeDtypeStruct((Bp, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(sg_tm, n_frames[:, None].astype(jnp.int32), env0f,
      jnp.asarray(gbase))
    valmap = jnp.transpose(valmap, (1, 0, 2))[:B, :T]
    keptmap = jnp.transpose(keptmap, (1, 0, 2))[:B, :T]
    return valmap, keptmap


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def find_peaks_mask_fused(sgram_prehpf: jax.Array, n_frames: jax.Array,
                          cfg: PipelineConfig, interpret: bool = False):
    """Pre-HPF whitened sgram -> final (B, T, F) bool peak mask.

    Drop-in equal to ops.peaks.find_peaks_mask(hpf(sgram), ...) — the HPF
    lives inside the kernel."""
    B, T, F = sgram_prehpf.shape
    _valmap, keptmap = fused_prune(sgram_prehpf, n_frames, cfg, interpret)
    kmask = keptmap > 0.5                             # (B,T,F)
    # delete-next rule: kept peak at (t, p) kills kept peak at (t+1, p)
    kprev = jnp.concatenate(
        [jnp.zeros((B, 1, F), bool), kmask[:, :-1]], axis=1)
    return kmask & ~kprev
