"""Fingerprint-pipeline stage attribution by prefix-graph differencing.

Times jitted PREFIX graphs of the device pipeline (each reduced to one
scalar so the relay fetch is constant) and reports per-stage deltas —
the methodology behind docs/DESIGN.md's stage table.  Warm timings with
inputs varied per call (the tunnel memoizes identical executions).

Run: python benchmarks/stage_attrib.py [--B 128] [--T 1024]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--T", type=int, default=1024, help="frames")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax
    import jax.numpy as jnp

    from audfprint_tpu.ops import landmarks as L
    from audfprint_tpu.ops import pallas_peaks as PP
    from audfprint_tpu.ops import peaks as PK
    from audfprint_tpu.ops import spectro as SP
    from audfprint_tpu.ops.config import PipelineConfig

    cfg = PipelineConfig()
    B = args.B
    n = args.T * cfg.n_hop + cfg.n_fft
    rng = np.random.default_rng(0)
    base = rng.standard_normal((B, n)).astype(np.float32) * 0.1
    lengths = jnp.asarray(np.full(B, n, np.int32))
    from audfprint_tpu.ops.pipeline import frame_count_device
    n_frames = frame_count_device(lengths, cfg)
    on_tpu = jax.default_backend() in ("tpu", "axon")

    @jax.jit
    def g_white(a):
        return jnp.sum(SP.whitened_logmag(a, n_frames, cfg))

    @jax.jit
    def g_prune(a):
        w = SP.whitened_logmag(a, n_frames, cfg)
        if on_tpu:
            mask = PP.find_peaks_mask_fused(w, n_frames, cfg)
        else:
            mask = PK.find_peaks_mask(SP.hpf(w, cfg), n_frames, cfg)
        return jnp.sum(mask)

    @jax.jit
    def g_slots(a):
        w = SP.whitened_logmag(a, n_frames, cfg)
        if on_tpu:
            mask = PP.find_peaks_mask_fused(w, n_frames, cfg)
        else:
            mask = PK.find_peaks_mask(SP.hpf(w, cfg), n_frames, cfg)
        bins, valid = PK.mask_to_slots(mask, cfg)
        return jnp.sum(bins) + jnp.sum(valid)

    @jax.jit
    def g_pairs(a):
        w = SP.whitened_logmag(a, n_frames, cfg)
        if on_tpu:
            mask = PP.find_peaks_mask_fused(w, n_frames, cfg)
        else:
            mask = PK.find_peaks_mask(SP.hpf(w, cfg), n_frames, cfg)
        bins, valid = PK.mask_to_slots(mask, cfg)
        t, h, v = L.slots_to_hashes(bins, valid, cfg)
        return jnp.sum(t) + jnp.sum(h) + jnp.sum(v)

    @jax.jit
    def g_full(a):
        from audfprint_tpu.ops.pipeline import fingerprint_batch
        out = fingerprint_batch(a, lengths, cfg)
        return jnp.sum(out[3])

    def t_of(fn):
        # pre-stage DISTINCT inputs on device (the relay memoizes identical
        # executions, and uploading inside the timed loop would measure the
        # ~27 MB/s tunnel, not the chip); force uploads with a tiny fetch
        pre = [jnp.asarray(base + np.float32(0.001 * (i + 1)))
               for i in range(args.iters)]
        for a in pre:
            np.asarray(a[0, 0])
        float(fn(jnp.asarray(base)))          # compile + warm
        best = 1e9
        for a in pre:
            t0 = time.time()
            float(fn(a))
            best = min(best, time.time() - t0)
        return best

    stages = [("whiten+rfft", g_white), ("prune", g_prune),
              ("slots", g_slots), ("pairing+hash", g_pairs),
              ("full(sort+dedup)", g_full)]
    times = [(name, t_of(fn)) for name, fn in stages]
    out = {"B": B, "frames": args.T,
           "backend": jax.default_backend(),
           "prefix_ms": {n: round(t * 1e3, 1) for n, t in times},
           "delta_ms": {}}
    prev = 0.0
    for name, t in times:
        out["delta_ms"][name] = round((t - prev) * 1e3, 1)
        prev = t
    print(json.dumps(out))


if __name__ == "__main__":
    main()
