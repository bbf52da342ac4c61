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


def timeit(fn, staged, n=8):
    """`staged` = list of n+1 PRE-STAGED device arg tuples (H2D through the
    relay is ~27 MB/s — transferring inside the loop measures the tunnel,
    which is exactly what the first version of this probe got wrong)."""
    float(fn(*staged[0]))  # warm/compile
    t0 = time.time()
    for k in range(n):
        float(fn(*staged[k + 1]))
    return (time.time() - t0) / n * 1e3


def make_staged(rng, n):
    out = []
    for _ in range(n):
        rank = jnp.asarray(rng.integers(0, SD + 1, (B, H)), jnp.int32)
        dtbin = jnp.asarray(rng.integers(0, NBINS, (B, H)), jnp.int32)
        v = jnp.asarray(rng.random((B, H)) < 0.9)
        out.append((rank, dtbin, v))
    # force all transfers to complete before any timing
    for t in out:
        for a in t:
            np.asarray(a[0, :1])
    return out


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


@jax.jit
def null_graph(rank, dtbin, v):
    # dispatch + relay constant: touches the inputs, does ~no work
    return (rank[0, 0] + dtbin[0, 0] + v[0, 0]).astype(jnp.float32)


@jax.jit
def hist_baseline_2x(rank, dtbin, v):
    # marginal scatter cost = 2x - 1x (dispatch constant cancels)
    h1 = jnp.zeros((B, SD + 1, NBINS), jnp.int32).at[
        bidx, rank, dtbin].add(v.astype(jnp.int32))
    h2 = jnp.zeros((B, SD + 1, NBINS), jnp.int32).at[
        bidx, rank, jnp.minimum(dtbin + 1, NBINS - 1)].add(
        v.astype(jnp.int32))
    return (jnp.sum(h1[:, :SD]) + jnp.sum(h2[:, :SD])).astype(jnp.float32)


@jax.jit
def sort_only_2x(rank, dtbin, v):
    key = jnp.where(v, rank * NBINS + dtbin, (SD + 1) * NBINS - 1)
    s1 = jax.lax.sort(key)
    s2 = jax.lax.sort(key + v.astype(jnp.int32))
    return jnp.sum(s1[:, :4] + s2[:, :4]).astype(jnp.float32)


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    staged = make_staged(rng, 9)
    for name, fn in [("null_graph", null_graph),
                     ("baseline_i32_scatter", hist_baseline),
                     ("baseline_2x", hist_baseline_2x),
                     ("int16_scatter", hist_int16),
                     ("rle_unique_scatter", hist_rle),
                     ("sort_only", sort_only),
                     ("sort_only_2x", sort_only_2x)]:
        ms = timeit(fn, staged)
        print(f"{name:24s} {ms:8.1f} ms")
