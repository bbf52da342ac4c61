"""Probe: sharded matching — psum-hist core vs the RLE all_to_all exchange.

Round 4: the sharded path's hist core combines per-shard partials as a
(B, SD+1, maxtime+qt_cap) psum (~1 GB of collective traffic per batch at
config-5 shapes) and pays the scatter-add wall the single-device RLE core
removed.  sharded_match_rle_packed_cached exchanges the HITS instead
(O(B*H) int32 words) and runs voting._vote_rle on per-device batch
slices.  This probe times both on the host-simulated mesh (or real
multi-chip hardware when available) at config-5-like shapes.

Run:  python benchmarks/sharded_probe.py [--ndev 8] [--tracks N] [--exact]
(CPU-mesh runs force JAX_PLATFORMS=cpu with ndev virtual devices.)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--tracks", type=int, default=102400)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--Q", type=int, default=128)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--plane", action="store_true")
    args = ap.parse_args()

    if os.environ.get("JAX_PLATFORMS") != "axon":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.ndev}").strip()

    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from audfprint_tpu.index import device_table as DT
    from audfprint_tpu.match import voting
    from audfprint_tpu.parallel import sharded

    B, Q, SD, depth = args.B, args.Q, 100, 100
    tcfg = DT.TableConfig(hashbits=20, depth=depth, maxtimebits=14, seed=0)
    ncap = 1 << max(12, int(np.ceil(np.log2(max(2, args.tracks)))))
    mcfg = voting.MatchConfig(search_depth=SD, qt_cap=2048, n_ids_cap=ncap,
                              exact_count=args.exact, modes_cap=1)

    rng = np.random.default_rng(3)
    nhash = args.tracks * 300
    counts_h = np.bincount(
        rng.integers(0, 1 << 20, nhash), minlength=1 << 20).astype(np.int32)
    table_h = ((rng.integers(0, args.tracks, (1 << 20, depth),
                             dtype=np.int64) << 14)
               | rng.integers(0, 1 << 14, (1 << 20, depth),
                              dtype=np.int64)).astype(np.uint32)
    hpi_h = np.full(ncap, 300, np.int32)

    mesh = sharded.make_mesh(args.ndev)
    table, counts = sharded.shard_table(
        mesh, jnp.asarray(table_h), jnp.asarray(counts_h))
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as PS
    hpi = jax.device_put(jnp.asarray(hpi_h), NamedSharding(mesh, PS()))

    def qbatch(seed):
        r = np.random.default_rng(seed)
        tq = r.integers(0, 2048, (B, Q)).astype(np.int32)
        hq = r.integers(0, 1 << 20, (B, Q)).astype(np.int32)
        vq = np.ones((B, Q), bool)
        return jnp.asarray(tq), jnp.asarray(hq), jnp.asarray(vq)

    def timed(label, fn, *extra):
        ts = []
        for i in range(args.iters + 1):
            qt, qh, qv = qbatch(100 + i)
            t0 = time.perf_counter()
            out = fn(table, counts, hpi, *extra, qt, qh, qv)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            if i:                      # first call pays compile
                ts.append(dt)
        ms = 1e3 * min(ts)
        print(f"{label:26s} {ms:9.1f} ms/batch  {B / (ms / 1e3):8.1f} q/s")
        return ms

    print(f"ndev={args.ndev} tracks={args.tracks} B={B} Q={Q} "
          f"exact={args.exact}")
    fn_h = sharded.sharded_match_packed_cached(mesh, tcfg, mcfg)
    ms_h = timed("hist psum", fn_h)
    fn_r = sharded.sharded_match_rle_packed_cached(mesh, tcfg, mcfg, False)
    ms_r = timed("RLE all_to_all", fn_r)
    if args.plane:
        plane = DT.build_hpi_plane(table, hpi, tcfg)
        jax.block_until_ready(plane)
        fn_p = sharded.sharded_match_rle_packed_cached(
            mesh, tcfg, mcfg, True)
        timed("RLE + hpi plane", fn_p, plane)
    print(f"speedup hist -> RLE: {ms_h / ms_r:.2f}x")


if __name__ == "__main__":
    main()
