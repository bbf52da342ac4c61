"""End-to-end fused fingerprint pipeline: audio batch -> sorted unique hashes.

One jit-compiled graph per (batch shape, config): framing, |rfft|, whitening,
HPF, fwd+bwd peak pruning, landmark pairing, 20-bit packing, per-file
lexicographic sort + dedup (the reference's np.unique over (t, hash) rows,
audfprint_analyze.py wavfile2hashes post-processing, SURVEY §2.3.3).

Shifts (`--shifts S`) become a leading batch axis (SURVEY §2.2: "free
vectorization"): each file row is expanded to S sub-hop-shifted rows, and the
hash streams are re-merged per file before dedup.

All shapes static; validity masks carry the ragged structure.  Sorting uses
two int32 keys (lax.sort num_keys=2) instead of packed int64 — TPU-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audfprint_tpu.ops import landmarks as L
from audfprint_tpu.ops import peaks as PK
from audfprint_tpu.ops import spectro as SP
from audfprint_tpu.ops.config import PipelineConfig

T_SENTINEL = np.int32(2**31 - 1)


def frame_count_device(lengths: jax.Array, cfg: PipelineConfig) -> jax.Array:
    return jnp.where(lengths >= cfg.n_fft,
                     1 + (lengths - cfg.n_fft) // cfg.n_hop, 0).astype(jnp.int32)


def n_frames_padded_static(n: int, cfg: PipelineConfig) -> int:
    return 0 if n < cfg.n_fft else 1 + (n - cfg.n_fft) // cfg.n_hop


def _expand_shifts(audio: jax.Array, lengths: jax.Array, cfg: PipelineConfig):
    """(B, N) -> (B*S, N) sub-hop-shifted copies; rows grouped per file."""
    S = cfg.shifts
    if S <= 1:
        return audio, lengths
    B, N = audio.shape
    padded = jnp.concatenate(
        [audio, jnp.zeros((B, cfg.n_hop), audio.dtype)], axis=1)
    rows, lens = [], []
    for s in range(S):
        off = s * cfg.n_hop // S
        rows.append(jax.lax.dynamic_slice_in_dim(padded, off, N, axis=1))
        lens.append(jnp.maximum(0, lengths - off))
    # interleave so rows of one file are adjacent: (B, S, N) -> (B*S, N)
    audio_s = jnp.stack(rows, axis=1).reshape(B * S, N)
    lengths_s = jnp.stack(lens, axis=1).reshape(B * S)
    return audio_s, lengths_s


def _use_pallas(impl: str, T: int, cfg: PipelineConfig) -> bool:
    if impl == "xla":
        return False
    if impl == "pallas":
        return True
    # auto: the fused kernel streams the time axis (VMEM is T-independent),
    # so any clip length qualifies; CPU uses the XLA path (interpret-mode
    # pallas is for tests).  The compact peak interchange caps pks/frame
    # at 8 (lanes 0..7 pos, 8..15 val) — larger -P falls back to the XLA
    # scan rather than asserting.
    import jax as _jax
    return (_jax.default_backend() == "tpu"
            and cfg.n_bins == 256 and T > 0
            and cfg.maxpksperframe <= 8)


def _peak_slots(audio: jax.Array, lengths: jax.Array,
                cfg: PipelineConfig, impl: str = "auto"):
    """Shared front half of fingerprint_batch and peaks_batch: shift
    expansion, |rfft|, whitening, fwd+bwd decay-mask peak pruning ->
    per-frame peak slots (bins, valid), each (B*shifts, T, maxpks)."""
    if audio.dtype == jnp.int16:
        # raw PCM staging: x * 2**-15 is an exponent shift — bit-identical
        # to the host buf_to_float conversion, at half the H2D bytes
        audio = audio.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
    audio_s, lengths_s = _expand_shifts(
        audio.astype(jnp.float32), lengths.astype(jnp.int32), cfg)
    n_frames = frame_count_device(lengths_s, cfg)
    T = n_frames_padded_static(audio_s.shape[1], cfg)
    if _use_pallas(impl, T, cfg):
        from audfprint_tpu.ops import pallas_peaks as PP
        white = SP.whitened_logmag(audio_s, n_frames, cfg)
        import jax as _jax
        # slots come straight from the kernel's compact kept lists — no
        # dense (B, T, F) mask materialization / top-k re-extraction
        bins, valid = PP.find_peaks_slots_fused(
            white, n_frames, cfg,
            interpret=_jax.default_backend() == "cpu")
    else:
        sgram = SP.whitened_spectrogram(audio_s, n_frames, cfg)
        mask = PK.find_peaks_mask(sgram, n_frames, cfg)
        bins, valid = PK.mask_to_slots(mask, cfg)
    return bins, valid, T


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def peaks_batch(audio: jax.Array, lengths: jax.Array,
                cfg: PipelineConfig, impl: str = "auto"):
    """Batched peak extraction (the `precompute -K` device path,
    VERDICT r4 #9): audio batch -> per-shift peak slots.

    Returns (bins, valid) shaped (B, shifts, T, maxpks) int32/bool —
    the host unions each file's (frame, bin) pairs across shifts with
    np.unique, matching the serial wavfile2peaks exactly (peak sets are
    identical; unique sorts)."""
    B = audio.shape[0]
    bins, valid, T = _peak_slots(audio, lengths, cfg, impl)
    P_ = bins.shape[-1]
    return (bins.reshape(B, cfg.shifts, T, P_),
            valid.reshape(B, cfg.shifts, T, P_))


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def fingerprint_batch(audio: jax.Array, lengths: jax.Array,
                      cfg: PipelineConfig, impl: str = "auto"):
    """Fingerprint a padded batch of audio.

    Args:
      audio:   (B, N) float32, zero-padded past per-file lengths
      lengths: (B,) int32 true sample counts
      impl:    "auto" | "xla" | "pallas" peak-picker selection

    Returns:
      times:  (B, L) int32 sorted unique (t, hash) rows' times
      hashes: (B, L) int32
      uniq:   (B, L) bool   validity mask (True rows are the output set)
      counts: (B,) int32    number of unique hashes per file
    """
    B = audio.shape[0]
    bins, valid, _T = _peak_slots(audio, lengths, cfg, impl)
    times, hashes, lvalid = L.slots_to_hashes(bins, valid, cfg)
    T = _T

    # flatten all shift rows of one file together, then sort + dedup
    flat_t = times.reshape(B, -1)
    flat_h = hashes.reshape(B, -1)
    flat_v = lvalid.reshape(B, -1)
    if T <= 2047:
        # single-key sort: t fits 11 bits above the 20-bit hash, so the
        # packed int32 (t << 20 | hash) sorts in (t, hash) lex order and
        # stays below the T_SENTINEL (2^31-1).  ~2x cheaper than the
        # two-key comparator on TPU.
        packed = jnp.where(
            flat_v, (flat_t << 20) | flat_h, T_SENTINEL)
        p_s = jax.lax.sort(packed, dimension=1)
        valid_s = p_s != T_SENTINEL
        t_s = jnp.where(valid_s, p_s >> 20, T_SENTINEL)
        h_s = jnp.where(valid_s, p_s & 0xFFFFF, T_SENTINEL)
        neq = jnp.concatenate(
            [jnp.ones((B, 1), bool), p_s[:, 1:] != p_s[:, :-1]], axis=1)
    else:
        flat_t = jnp.where(flat_v, flat_t, T_SENTINEL)
        flat_h = jnp.where(flat_v, flat_h, T_SENTINEL)
        t_s, h_s = jax.lax.sort((flat_t, flat_h), dimension=1, num_keys=2)
        valid_s = t_s != T_SENTINEL
        neq = jnp.concatenate(
            [jnp.ones((B, 1), bool),
             (t_s[:, 1:] != t_s[:, :-1]) | (h_s[:, 1:] != h_s[:, :-1])],
            axis=1)
    uniq = valid_s & neq
    counts = jnp.sum(uniq, axis=1, dtype=jnp.int32)
    return t_s, h_s, uniq, counts


@functools.partial(jax.jit, static_argnames=("cfg", "impl"))
def fingerprint_batch_compact(audio: jax.Array, lengths: jax.Array,
                              cfg: PipelineConfig, impl: str = "auto"):
    """fingerprint_batch with the unique rows FRONT-COMPACTED into one
    packed buffer: returns (th (B, L, 2) int32 [t, hash], counts (B,)).

    Row b's unique hashes occupy th[b, :counts[b]]; the tail is zeroed.
    One extra stable (B, L) sort on device buys a host fetch of a single
    small slice instead of three full L-capacity buffers — the capacity L
    is ~20-30x the typical unique count, and through a relay-attached
    chip the D2H transfer (not the compute) dominates ingest wall time."""
    t_s, h_s, uniq, counts = fingerprint_batch(audio, lengths, cfg, impl)
    B, L = t_s.shape
    iota = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    key = jnp.where(uniq, iota, L + iota)    # distinct keys: stable compact
    _k, tc, hc = jax.lax.sort((key, t_s, h_s), num_keys=1)
    keepm = iota < counts[:, None]
    th = jnp.stack([jnp.where(keepm, tc, 0), jnp.where(keepm, hc, 0)],
                   axis=-1)
    return th, counts


@functools.partial(jax.jit, static_argnames=("cfg", "impl", "k"))
def fingerprint_batch_compact_k(audio: jax.Array, lengths: jax.Array,
                                cfg: PipelineConfig, k: int,
                                impl: str = "auto"):
    """fingerprint_batch_compact plus a SINGLE-FETCH result buffer.

    Returns (buf, th) where buf is (B, min(k, L) + 1, 2) int32: columns
    [:k'] are the front-compacted (t, hash) rows and column [k', 0] is the
    per-file unique count — so ONE D2H fetch of `buf` resolves a whole
    dispatch group (counts included), replacing the count fetch + slice
    dispatch + slice fetch sequence of resolve_compact.  Through a
    relay-attached chip each host<->device interaction is a ~30 ms round
    trip, and those extra interactions were the dominant term of CLI
    ingest (BENCH_r04: analyze 0.89 s of a 1.05 s run).

    `th` is the full-capacity compacted buffer, kept ON DEVICE: the rare
    row whose unique count exceeds k (the caller sizes k from
    duration x density with headroom) is resolved from it with a tiny
    per-row fetch — results are bit-identical regardless of k.
    """
    th, counts = fingerprint_batch_compact(audio, lengths, cfg, impl)
    B, L = th.shape[0], th.shape[1]
    kk = min(k, L)
    extra = jnp.stack([counts, jnp.zeros_like(counts)],
                      axis=-1)[:, None, :]
    buf = jnp.concatenate([th[:, :kk], extra], axis=1)
    return buf, th


@functools.partial(jax.jit, static_argnames=("k",))
def _slice_rows(th: jax.Array, k: int):
    return th[:, :k]


@functools.partial(jax.jit, static_argnames=())
def _one_row(th: jax.Array, row):
    return th[row]


def _fetch_pow2(k: int, lo: int = 512) -> int:
    from audfprint_tpu import params as P
    return P.next_pow2(k, lo)


def resolve_compact(th, counts) -> list:
    """Materialize fingerprint_batch_compact outputs as (n, 2) int32 arrays,
    fetching only a power-of-two column slice that covers max(counts)
    (pow2 buckets keep the number of distinct slice graphs O(log L))."""
    counts = np.asarray(counts)
    L = th.shape[1]
    kmax = int(counts.max()) if counts.size else 0
    k = min(L, _fetch_pow2(max(1, kmax)))
    th_np = np.asarray(_slice_rows(th, k) if k < L else th)
    return [th_np[b, : counts[b]].astype(np.int32)
            for b in range(th_np.shape[0])]


def fingerprint_numpy(audio_batch, lengths, cfg: PipelineConfig):
    """Host convenience: run the device pipeline, return list of (n,2) int32
    (t, hash) arrays (trimmed), matching oracle samples_to_hashes output."""
    th, counts = fingerprint_batch_compact(
        jnp.asarray(audio_batch), jnp.asarray(lengths, dtype=jnp.int32), cfg)
    return resolve_compact(th, counts)
