"""Fused Pallas TPU kernel: forward + backward decaying-threshold peak
pruning in a single pass over the time axis.

This is the hot sequential op of the whole framework (SURVEY §7 "Hard
parts": the masking envelope is a data-dependent scan).  Everything with no
data dependence on the envelope is hoisted OUT of the serial loop and
vectorized by XLA over all frames at once: the onset HPF, the locmax
computation, and both initial envelopes.  The kernel streams a single
pre-masked CANDIDATE VALUE MAP

    m0[t, b, f] = y[t, b, f] if locmax else -inf     (y = HPF'd sgram)

and keeps only the irreducibly sequential work per frame:

  fwd pass  : cand = m0 > sthresh -> top-k by (val desc, pos desc) via k
              argmax/mask rounds -> envelope raise by gathering the
              tabulated gaussian row with a PER-ROW VARIABLE ROLL (log2(F)
              conditional whole-array rolls — pure data movement, bit-exact
              by construction) -> decay.  Emits the accepted-peak value map.
  bwd pass  : streams the accepted maps in reverse; candidates re-extracted
              with the same argmax trick (identical ordering), sequential
              within-frame acceptance, same envelope raise.  Emits a 0/1
              kept map.

Layout: (B_tile, 256) — batch on sublanes, freq on 2x128 lanes; the time
axis streams through VMEM in CHUNK-frame slabs with double-buffered DMA, so
VMEM use is T-independent (any clip length).  The XLA glue
(find_peaks_mask_fused) applies the reference's delete-next rule and is
bit-identical to ops.peaks.find_peaks_mask (tested on hardware, including
tie-heavy quantized inputs) and therefore to the NumPy oracle.
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


def _kernel(m0_hbm, nf_ref, env0f_ref, env0b_ref, gbase_ref,
            valmap_hbm, keptmap_hbm,
            # scratch
            xbuf, vbuf, kbuf, in_sem, out_sem, kout_sem, sth,
            *, T: int, B: int, F: int, k: int, a_dec: float):
    C = CHUNK
    NC = T // C
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, F), 1)
    nfb = nf_ref[:]                     # (B, 1) int32
    a = jnp.float32(a_dec)
    neg = jnp.float32(_NEG)

    def dma_in(ref, slot, c):
        return pltpu.make_async_copy(
            ref.at[pl.ds(c * C, C)], xbuf.at[slot], in_sem.at[slot])

    def dma_val_out(slot, c):
        return pltpu.make_async_copy(
            vbuf.at[slot], valmap_hbm.at[pl.ds(c * C, C)], out_sem.at[slot])

    def dma_kept_out(slot, c):
        return pltpu.make_async_copy(
            kbuf.at[slot], keptmap_hbm.at[pl.ds(c * C, C)], kout_sem.at[slot])

    def gather_bump(pos, ok):
        """Exact full-support gaussian-bump row centered at per-row `pos`.

        gbase is the DOUBLE-WIDTH (2F lanes) template g2[i] = gauss(i - F);
        a per-row variable roll by (pos + F) is realized as log2(2F)
        conditional whole-array rolls (pure data movement — bit-exact, no
        MXU precision passes), then the low F lanes are
        g2[(j - pos - F) mod 2F] = g2[j - pos + F] = gauss(j - pos) for
        every j, p in [0, F) — full support with no wrap collision (a
        single-width cyclic roll cannot represent offsets beyond +/-F/2).
        """
        row = gbase_ref[:] + jnp.zeros((B, 2 * F), jnp.float32)
        # the constant +F component of the roll is pre-baked into gbase, so
        # only log2(F) conditional rolls remain (bit 8 of pos+F is always 1)
        pc = jnp.maximum(pos, 0)
        for kb in range(8):          # F == 256
            bit = (pc >> kb) & 1
            row = jnp.where(bit == 1, pltpu.roll(row, 1 << kb, 1), row)
        return jnp.where(ok, row[:, :F], 0.0)

    # ---- forward pass ----
    sth[:] = env0f_ref[:]
    dma_in(m0_hbm, 0, 0).start()

    def fwd_chunk(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < NC)
        def _():
            dma_in(m0_hbm, 1 - slot, c + 1).start()

        dma_in(m0_hbm, slot, c).wait()

        @pl.when(c >= 2)
        def _():
            dma_val_out(slot, c - 2).wait()

        for j in range(C):
            t = c * C + j
            m0 = xbuf[slot, j]
            active = t < nfb                           # (B,1)
            m = jnp.where((m0 > sth[:]) & active, m0, neg)
            # top-k by (val desc, pos desc), one slot at a time
            accmask = jnp.zeros((B, F), bool)
            newenv = jnp.zeros((B, F), jnp.float32)
            for _i in range(k):
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
            vbuf[slot, j] = jnp.where(accmask, m0, neg)
        dma_val_out(slot, c).start()
        return 0

    jax.lax.fori_loop(0, NC, fwd_chunk, 0)
    dma_val_out(jax.lax.rem(NC - 1, 2), NC - 1).wait()

    @pl.when(NC >= 2)
    def _():
        dma_val_out(jax.lax.rem(NC - 2, 2), NC - 2).wait()

    # ---- backward pass (streams the accepted value maps in reverse) ----
    sth[:] = env0b_ref[:]
    dma_in(valmap_hbm, jax.lax.rem(NC - 1, 2), NC - 1).start()

    def bwd_chunk(i, _):
        c = NC - 1 - i
        slot = jax.lax.rem(c, 2)

        @pl.when(c - 1 >= 0)
        def _():
            dma_in(valmap_hbm, 1 - slot, c - 1).start()

        dma_in(valmap_hbm, slot, c).wait()

        @pl.when(i >= 2)
        def _():
            dma_kept_out(slot, c + 2).wait()

        for j in range(C - 1, -1, -1):
            t = c * C + j
            m = xbuf[slot, j]
            sth[:] = jnp.where(t == nfb - 1, env0b_ref[:], sth[:])
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
    # double-width template for the kernel's variable-roll gather (see
    # gather_bump): g2[i] = gauss(i - F) for i in [0, 2F), from the SAME
    # full-support table the oracle uses (g2[0] = gauss(-F) is never
    # addressed: j - pos >= -(F-1))
    gvec = P.gaussian_template(cfg.f_sd, cfg.gsize).astype(np.float32)
    dd = np.arange(2 * F) - F                  # offsets -F .. F-1
    g2 = np.where(np.abs(dd) <= cfg.gsize,
                  gvec[np.clip(dd + cfg.gsize, 0, 2 * cfg.gsize)],
                  0.0).astype(np.float32)
    gbase = np.roll(g2, F)[None, :]            # pre-baked +F roll

    # envelope-independent precomputation, vectorized by XLA over all T:
    # HPF, locmax -> candidate value map, and both initial envelopes
    y = SP.hpf(sgram, cfg)                           # (Bp, Tp, F)
    m0 = jnp.where(PKref.locmax2(y), y, jnp.float32(_NEG))
    head = jnp.minimum(10, jnp.maximum(1, n_frames))
    sel = jnp.arange(Tp)[None, :] < head[:, None]
    vmax = jnp.max(jnp.where(sel[:, :, None], y, -jnp.inf), axis=1)
    vmax = jnp.where(jnp.isfinite(vmax), vmax, 0.0)
    env0f = PKref._spread_vector(vmax, gtab)
    last_idx = jnp.maximum(0, n_frames - 1)
    lastcol = jnp.take_along_axis(y, last_idx[:, None, None], axis=1)[:, 0]
    env0b = PKref._spread_vector(lastcol, gtab)

    m0_tm = jnp.transpose(m0, (1, 0, 2))             # (Tp, Bp, F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # m0 stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # n_frames (Bp,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # env0f
            pl.BlockSpec(memory_space=pltpu.VMEM),    # env0b
            pl.BlockSpec(memory_space=pltpu.VMEM),    # gbase
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # valmap (Tp,Bp,F) HBM
            pl.BlockSpec(memory_space=pl.ANY),        # keptmap (Tp,Bp,F) HBM
        ],
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, Bp, F), jnp.float32),  # stream-in
            pltpu.VMEM((2, CHUNK, Bp, F), jnp.float32),  # valmap out
            pltpu.VMEM((2, CHUNK, Bp, F), jnp.float32),  # keptmap out
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Bp, F), jnp.float32),         # sthresh
        ],
    )
    kern = functools.partial(
        _kernel, T=Tp, B=Bp, F=F, k=k, a_dec=float(cfg.a_dec))
    valmap, keptmap = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, Bp, F), jnp.float32),
            jax.ShapeDtypeStruct((Tp, Bp, F), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(m0_tm, n_frames[:, None].astype(jnp.int32), env0f, env0b,
      jnp.asarray(gbase))
    valmap = jnp.transpose(valmap, (1, 0, 2))[:B, :T]
    keptmap = jnp.transpose(keptmap, (1, 0, 2))[:B, :T]
    return valmap, keptmap


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def find_peaks_mask_fused(sgram_prehpf: jax.Array, n_frames: jax.Array,
                          cfg: PipelineConfig, interpret: bool = False):
    """Pre-HPF whitened sgram -> final (B, T, F) bool peak mask.

    Drop-in equal to ops.peaks.find_peaks_mask(hpf(sgram), ...) — the HPF
    lives in the XLA precomputation."""
    B, T, F = sgram_prehpf.shape
    _valmap, keptmap = fused_prune(sgram_prehpf, n_frames, cfg, interpret)
    kmask = keptmap > 0.5                             # (B,T,F)
    # delete-next rule: kept peak at (t, p) kills kept peak at (t+1, p)
    kprev = jnp.concatenate(
        [jnp.zeros((B, 1, F), bool), kmask[:, :-1]], axis=1)
    return kmask & ~kprev
