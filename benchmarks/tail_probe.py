"""Micro-probe: which op of the fused RLE vote tail is slow on the chip.

Measures, at config-5 hit shapes (B=128, H=12800), each tail building
block in isolation: the compaction scatter-set vs a 1-key sort
formulation, the 3-tuple segmented scan vs a packed-int32 2-tuple scan,
plain cumsum/cummax, and a (B, H) take_along_axis gather.
"""

import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax
    import jax.numpy as jnp

    B, H = 128, 12800
    rng = np.random.default_rng(5)

    def staged(n):
        out = []
        for _ in range(n):
            sid = np.sort(rng.integers(0, 4000, (B, H)), axis=1)
            sdb = rng.integers(0, 18432, (B, H)).astype(np.int32)
            out.append((jnp.asarray(sid, jnp.int32), jnp.asarray(sdb)))
        for t in out:
            np.asarray(t[0][0, :1])
        return out

    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, H))
    iota_h = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[None], (B, H))

    @jax.jit
    def t0_null(sid, sdb):
        return (sid[0, 0] + sdb[0, 0]).astype(jnp.float32)

    @jax.jit
    def t1_cums(sid, sdb):
        a = jnp.cumsum(sid, axis=1)
        b = jax.lax.cummax(sdb, axis=1)
        return (a[0, -1] + b[0, -1]).astype(jnp.float32)

    @jax.jit
    def t2_scatter3(sid, sdb):
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
        ridx = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(first, ridx, H + iota_h)
        comp = jnp.broadcast_to(
            jnp.array([9999, -5, 0], jnp.int32)[None, None, :],
            (B, H, 3)).at[bidx, tgt].set(
            jnp.stack([sid, sdb, ridx], axis=-1),
            mode="drop", unique_indices=True)
        return jnp.sum(comp[..., 0] & 1023).astype(jnp.float32)

    @jax.jit
    def t2b_scatter1(sid, sdb):
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
        ridx = jnp.cumsum(first.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(first, ridx, H + iota_h)
        comp = jnp.full((B, H), 9999, jnp.int32).at[bidx, tgt].set(
            sid, mode="drop", unique_indices=True)
        return jnp.sum(comp & 1023).astype(jnp.float32)

    @jax.jit
    def t3_sortcompact(sid, sdb):
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
        key = jnp.where(first, iota_h, H + iota_h)
        _k, a, b, c = jax.lax.sort((key, sid, sdb, iota_h), num_keys=1)
        return jnp.sum(a & 1023).astype(jnp.float32)

    @jax.jit
    def t4_scan3(sid, sdb):
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)

        def comb(x, y):
            f1, s1, p1 = x
            f2, s2, p2 = y
            take = f2 | (s2 > s1) | ((s2 == s1) & (p2 < p1))
            return (f1 | f2, jnp.where(take, s2, s1),
                    jnp.where(take, p2, p1))

        _f, bs, bp = jax.lax.associative_scan(
            comb, (first, sdb, iota_h), axis=1)
        return jnp.sum(bs & 1023).astype(jnp.float32)

    @jax.jit
    def t5_scan_packed(sid, sdb):
        first = jnp.concatenate(
            [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
        key = sdb * (1 << 15) + ((1 << 15) - 1 - (iota_h & 0x7FFF))

        def comb(x, y):
            f1, v1 = x
            f2, v2 = y
            return f1 | f2, jnp.where(f2, v2, jnp.maximum(v1, v2))

        _f, run = jax.lax.associative_scan(comb, (first, key), axis=1)
        return jnp.sum(run & 1023).astype(jnp.float32)

    @jax.jit
    def t6_gather(sid, sdb):
        idx = jnp.minimum(sdb % H, H - 1)
        g = jnp.take_along_axis(sid, idx, axis=1)
        return jnp.sum(g & 1023).astype(jnp.float32)

    @jax.jit
    def t7_shifts(sid, sdb):
        s = sdb
        for o in (-4, -3, -2, -1, 1, 2):
            pad = jnp.full((B, abs(o)), 0, jnp.int32)
            if o > 0:
                sh = jnp.concatenate([sdb[:, o:], pad], axis=1)
            else:
                sh = jnp.concatenate([pad, sdb[:, :o]], axis=1)
            s = s + jnp.where(sh > sdb, sh, 0)
        return jnp.sum(s & 1023).astype(jnp.float32)

    probes = [("null", t0_null), ("cumsum+cummax", t1_cums),
              ("scatter-set x3", t2_scatter3), ("scatter-set x1", t2b_scatter1),
              ("sort-compact 4op", t3_sortcompact),
              ("assoc-scan 3tuple", t4_scan3),
              ("assoc-scan packed", t5_scan_packed),
              ("gather BH", t6_gather), ("6 shifts", t7_shifts)]
    iters = 6
    st = staged(iters + 1)
    for name, fn in probes:
        float(fn(*st[0]))
        t0 = time.time()
        for k in range(iters):
            float(fn(*st[k + 1]))
        ms = (time.time() - t0) / iters * 1e3
        print(f"{name:>18}: {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
