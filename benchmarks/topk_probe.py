"""Micro-probe: F2 candidate-selection sort vs a bitcast-int32 top_k.

The round-4 voting probe attributes ~15 ms of a 55 ms config-5 match
batch to the F2 (wc desc, id desc) 3-operand 2-key sort over (B, H)
(the F1 2-key int sort costs ~0.6 ms — the float comparator + third
operand are the expense).  For non-negative floats the IEEE-754 bit
pattern is order-isomorphic, so top-SD by (wc desc, id desc) can run as
ONE lax.top_k over a bitcast int32 key on the FLIPPED row: run starts
appear in ascending-id order, so after the flip top_k's lower-index tie
rule picks the HIGHER id — exactly upstream's argsort(wcounts)[::-1].

Run on the chip:  python benchmarks/topk_probe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax
    import jax.numpy as jnp

    B, H, SD, N = 128, 12800, 100, 1 << 17
    rng = np.random.default_rng(7)

    def staged(n):
        out = []
        for _ in range(n):
            sid = np.sort(rng.integers(0, N, (B, H)), axis=1).astype(np.int32)
            hpi = rng.integers(200, 400, N).astype(np.int32)
            out.append((jnp.asarray(sid), jnp.asarray(hpi)))
        for t in out:
            np.asarray(t[0][0, :1])
        return out

    iota_h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))
    inf = jnp.float32(jnp.inf)

    def prefix(sid, hpi):
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
        a = jnp.where(first, iota_h, H)
        nxt_incl = jnp.flip(jax.lax.cummin(jnp.flip(a, 1), axis=1), 1)
        end = jnp.concatenate(
            [nxt_incl[:, 1:], jnp.full((B, 1), H, jnp.int32)], axis=1)
        start = jax.lax.cummax(jnp.where(first, iota_h, 0), axis=1)
        c_h = end - start
        wc = c_h.astype(jnp.float32) / jnp.maximum(1, hpi)[
            jnp.minimum(sid, N - 1)].astype(jnp.float32)
        return first, c_h, wc

    @jax.jit
    def f2_sort(sid, hpi):
        first, c_h, wc = prefix(sid, hpi)
        k1 = jnp.where(first & (sid < N), -wc, inf)
        k1s, negid_s, pos_s = jax.lax.sort((k1, -sid, iota_h), num_keys=2)
        return (jnp.sum(-negid_s[:, :SD] & 1023)
                + jnp.sum(pos_s[:, :SD])).astype(jnp.float32)

    @jax.jit
    def f2_topk(sid, hpi):
        first, c_h, wc = prefix(sid, hpi)
        bits = jax.lax.bitcast_convert_type(wc, jnp.int32)
        key = jnp.where(first & (sid < N), bits, jnp.int32(-(1 << 31)))
        vals, idxf = jax.lax.top_k(jnp.flip(key, axis=1), SD)
        pos = H - 1 - idxf
        ids = jnp.take_along_axis(sid, pos, axis=1)
        return (jnp.sum(ids & 1023) + jnp.sum(pos)).astype(jnp.float32)

    @jax.jit
    def check_equal(sid, hpi):
        first, c_h, wc = prefix(sid, hpi)
        k1 = jnp.where(first & (sid < N), -wc, inf)
        k1s, negid_s, pos_s = jax.lax.sort((k1, -sid, iota_h), num_keys=2)
        ids_a = jnp.where(k1s[:, :SD] < inf, -negid_s[:, :SD], -1)
        pos_a = jnp.where(k1s[:, :SD] < inf, pos_s[:, :SD], -1)
        bits = jax.lax.bitcast_convert_type(wc, jnp.int32)
        key = jnp.where(first & (sid < N), bits, jnp.int32(-(1 << 31)))
        vals, idxf = jax.lax.top_k(jnp.flip(key, axis=1), SD)
        pos_b = jnp.where(vals > 0, H - 1 - idxf, -1)
        ids_b = jnp.where(vals > 0,
                          jnp.take_along_axis(sid, H - 1 - idxf, axis=1), -1)
        return (jnp.sum(ids_a != ids_b) + jnp.sum(pos_a != pos_b))

    iters = 5
    st = staged(iters + 1)
    mism = int(check_equal(*st[0]))
    print(f"sort-vs-topk mismatches: {mism}", flush=True)
    for name, fn in [("f2-sort", f2_sort), ("f2-topk", f2_topk)]:
        float(fn(*st[0]))
        t0 = time.time()
        for k in range(iters):
            float(fn(*st[k + 1]))
        ms = (time.time() - t0) / iters * 1e3
        print(f"{name:>10}: {ms:7.1f} ms", flush=True)


if __name__ == "__main__" and "--stages" not in sys.argv:
    main()


def stages():
    """Decompose the selection prefix: run scans vs hpi gather vs sort."""
    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax
    import jax.numpy as jnp

    B, H, SD, N = 128, 12800, 100, 1 << 17
    rng = np.random.default_rng(7)
    iota_h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))
    inf = jnp.float32(jnp.inf)

    def staged(n):
        out = []
        for _ in range(n):
            sid = np.sort(rng.integers(0, N, (B, H)), axis=1).astype(np.int32)
            hpi = rng.integers(200, 400, N).astype(np.int32)
            out.append((jnp.asarray(sid), jnp.asarray(hpi)))
        for t in out:
            np.asarray(t[0][0, :1])
        return out

    def runs(sid):
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
        a = jnp.where(first, iota_h, H)
        nxt_incl = jnp.flip(jax.lax.cummin(jnp.flip(a, 1), axis=1), 1)
        end = jnp.concatenate(
            [nxt_incl[:, 1:], jnp.full((B, 1), H, jnp.int32)], axis=1)
        start = jax.lax.cummax(jnp.where(first, iota_h, 0), axis=1)
        return first, (end - start)

    @jax.jit
    def q0(sid, hpi):
        return (sid[0, 0] + hpi[0]).astype(jnp.float32)

    @jax.jit
    def q1_runs(sid, hpi):
        first, c_h = runs(sid)
        return jnp.sum(c_h & 1023).astype(jnp.float32)

    @jax.jit
    def q2_gather(sid, hpi):
        first, c_h = runs(sid)
        wc = c_h.astype(jnp.float32) / jnp.maximum(1, hpi)[
            jnp.minimum(sid, N - 1)].astype(jnp.float32)
        return jnp.sum(wc).astype(jnp.float32)

    @jax.jit
    def q3_sort(sid, hpi):
        first, c_h = runs(sid)
        wc = c_h.astype(jnp.float32) / jnp.maximum(1, hpi)[
            jnp.minimum(sid, N - 1)].astype(jnp.float32)
        k1 = jnp.where(first & (sid < N), -wc, inf)
        k1s, negid_s, pos_s = jax.lax.sort((k1, -sid, iota_h), num_keys=2)
        return (jnp.sum(-negid_s[:, :SD] & 1023)
                + jnp.sum(pos_s[:, :SD])).astype(jnp.float32)

    @jax.jit
    def q3b_sort2op(sid, hpi):
        # 2-operand variant: payload packed out; recover id from pos later
        first, c_h = runs(sid)
        wc = c_h.astype(jnp.float32) / jnp.maximum(1, hpi)[
            jnp.minimum(sid, N - 1)].astype(jnp.float32)
        k1 = jnp.where(first & (sid < N), -wc, inf)
        k1s, pos_s = jax.lax.sort((k1, iota_h), num_keys=1)
        return (jnp.sum(pos_s[:, :SD])).astype(jnp.float32)

    iters = 5
    st = staged(iters + 1)
    for name, fn in [("null", q0), ("runs", q1_runs),
                     ("runs+gather", q2_gather), ("runs+gth+sort", q3_sort),
                     ("runs+gth+sort2op", q3b_sort2op)]:
        float(fn(*st[0]))
        t0 = time.time()
        for k in range(iters):
            float(fn(*st[k + 1]))
        ms = (time.time() - t0) / iters * 1e3
        print(f"{name:>18}: {ms:7.1f} ms", flush=True)


if __name__ == "__main__" and "--stages" in sys.argv:
    stages()
