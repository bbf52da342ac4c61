"""Probe: dt-histogram scatter variants for the voting core.

The hist-based matcher's dominant device stage is the scatter-add of
B*Q*depth updates into the (B, SD+1, nbins) Δt histogram (~31 ms of an
85 ms batch at config-5 shapes, round 2).  TPU scatter serializes on
potentially-conflicting indices, so two reformulations are candidates:

  a. rle+unique: sort the (rank, bin) keys per batch row, run-length
     encode, scatter only the run START positions (value = run count)
     with out-of-bounds drop for non-starts.  Far fewer *distinct*
     conflicting updates; adds one (B, H) single-key sort.
  b. int16 accumulator: halve the scatter's memory traffic (counts are
     bounded by H < 2^15, so no overflow).

Run on the real chip:  python benchmarks/scatter_probe.py
Prints ms/iteration for each variant at config-5-like shapes.  Timing
methodology per .claude/skills/verify/SKILL.md: vary inputs per call
(the relay memoizes identical executions), fetch a scalar, warm first.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, Q, DEPTH, SD = 128, 128, 100, 100
NBINS = 16384 + 2048
H = Q * DEPTH


def timeit(fn, args_stream, n=8):
    fn(*next(args_stream))  # warm/compile
    t0 = time.time()
    for _ in range(n):
        float(fn(*next(args_stream)))
    return (time.time() - t0) / n * 1e3


def make_stream(rng):
    while True:
        rank = jnp.asarray(rng.integers(0, SD + 1, (B, H)), jnp.int32)
        dtbin = jnp.asarray(rng.integers(0, NBINS, (B, H)), jnp.int32)
        v = jnp.asarray(rng.random((B, H)) < 0.9)
        yield jax.device_put(rank), jax.device_put(dtbin), jax.device_put(v)


bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, H))


@jax.jit
def hist_baseline(rank, dtbin, v):
    hist = jnp.zeros((B, SD + 1, NBINS), jnp.int32).at[
        bidx, rank, dtbin].add(v.astype(jnp.int32))[:, :SD]
    return jnp.sum(hist).astype(jnp.float32)


@jax.jit
def hist_int16(rank, dtbin, v):
    hist = jnp.zeros((B, SD + 1, NBINS), jnp.int16).at[
        bidx, rank, dtbin].add(v.astype(jnp.int16))[:, :SD]
    return jnp.sum(hist.astype(jnp.int32)).astype(jnp.float32)


@jax.jit
def hist_rle(rank, dtbin, v):
    key = jnp.where(v, rank * NBINS + dtbin, (SD + 1) * NBINS - 1)
    s = jax.lax.sort(key)
    iota = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    a = jnp.where(first, iota, H)
    nxt_incl = jnp.flip(jax.lax.cummin(jnp.flip(a, 1), axis=1), 1)
    nxt = jnp.concatenate(
        [nxt_incl[:, 1:], jnp.full((B, 1), H, jnp.int32)], axis=1)
    sidx = jax.lax.cummax(jnp.where(first, iota, 0), axis=1)
    c = nxt - sidx
    # non-starts scatter out of bounds -> dropped; remaining indices unique
    idx = jnp.where(first, s, (SD + 1) * NBINS)
    hist = jnp.zeros((B, (SD + 1) * NBINS), jnp.int32).at[
        bidx, idx].add(c, mode="drop", unique_indices=True)
    hist = hist.reshape(B, SD + 1, NBINS)[:, :SD]
    return jnp.sum(hist).astype(jnp.float32)


@jax.jit
def sort_only(rank, dtbin, v):
    key = jnp.where(v, rank * NBINS + dtbin, (SD + 1) * NBINS - 1)
    s = jax.lax.sort(key)
    return jnp.sum(s[:, :4]).astype(jnp.float32)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    stream = make_stream(rng)
    print("devices:", jax.devices())
    for name, fn in [("baseline_i32_scatter", hist_baseline),
                     ("int16_scatter", hist_int16),
                     ("rle_unique_scatter", hist_rle),
                     ("sort_only", sort_only)]:
        ms = timeit(fn, stream)
        print(f"{name:24s} {ms:8.1f} ms")
