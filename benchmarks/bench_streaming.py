"""Streamed-ingest rate benchmark (VERDICT r4 #5 done-bar evidence).

Synthesizes a long WAV once (cached in --workdir), then measures
models.streaming.wavfile2hashes_streaming wall time on the ambient JAX
platform (the real TPU under the driver; CPU otherwise) and prints one
JSON line with audio-sec/sec plus the batched-path rate on the same file
for the DESIGN.md streamed-vs-batch table.

Reference anchor: the upstream wavfile2hashes loop analyzes whole files
in memory (audfprint_analyze.py:~430); its long-file rate is bounded by
its single-core analysis rate (~10-30 as/s, SURVEY §6).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def synth_long(path: str, dur_sec: float, sr: int = 11025,
               seed: int = 7) -> None:
    """Music-like long file, written in pieces to keep host memory small."""
    from audfprint_tpu.utils import audio as audio_io
    import wave

    rng = np.random.default_rng(seed)
    piece = 60 * sr
    n = int(dur_sec * sr)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        t0 = 0
        while t0 < n:
            m = min(piece, n - t0)
            t = (np.arange(t0, t0 + m)) / sr
            x = 0.002 * rng.standard_normal(m)
            for _ in range(20):
                f0 = 55 * 2 ** rng.uniform(1, 6)
                s = rng.uniform(t0 / sr, (t0 + m) / sr - 0.2)
                seg = (t >= s) & (t < s + rng.uniform(0.1, 0.5))
                k = int(seg.sum())
                if k > 8:
                    x[seg] += (rng.uniform(0.2, 0.6)
                               * np.exp(-3 * np.linspace(0, 1, k))
                               * np.sin(2 * np.pi * f0 * t[seg]))
            x = np.clip(x / 0.9, -1, 1)
            w.writeframes((x * 32767).astype("<i2").tobytes())
            t0 += m
    del audio_io  # (imported for parity with other benchmarks)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dur", type=float, default=1800.0,
                    help="synthetic file duration (audio seconds)")
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--shifts", type=int, default=1)
    ap.add_argument("--workdir", default="/tmp/stream_bench")
    ap.add_argument("--skip-batch", action="store_true",
                    help="skip the batched-path comparison run")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    sr = 11025
    wav = os.path.join(args.workdir, f"long_{int(args.dur)}.wav")
    if not os.path.exists(wav):
        synth_long(wav, args.dur, sr)

    import audfprint_tpu.utils.jaxconfig as jc
    jc.setup()
    import jax

    from audfprint_tpu.models import streaming as STM
    from audfprint_tpu.ops.config import PipelineConfig

    cfg = PipelineConfig(shifts=args.shifts)

    # warm compile on a short prefix so the timed run is steady-state
    warm = os.path.join(args.workdir, "warm.wav")
    if not os.path.exists(warm):
        synth_long(warm, 60.0, sr, seed=9)
    STM.wavfile2hashes_streaming(warm, cfg, sr, chunk_frames=args.chunk)

    t0 = time.perf_counter()
    h, dur = STM.wavfile2hashes_streaming(wav, cfg, sr,
                                          chunk_frames=args.chunk)
    dt = time.perf_counter() - t0
    out = {
        "metric": "streamed_ingest_as_per_sec",
        "value": round(dur / dt, 1),
        "unit": "audio-sec/sec",
        "platform": jax.devices()[0].platform,
        "dur_sec": dur,
        "wall_sec": round(dt, 2),
        "hashes": int(len(h)),
        "chunk_frames": args.chunk,
        "shifts": args.shifts,
    }

    if not args.skip_batch:
        from audfprint_tpu.models.analyzer import Analyzer
        an = Analyzer(shifts=args.shifts)
        an.stream_above_sec = 0.0  # force the in-memory batched path
        t0 = time.perf_counter()
        hb = an.wavfile2hashes(wav)
        out["batch_as_per_sec"] = round(dur / (time.perf_counter() - t0), 1)
        out["batch_hashes"] = int(len(hb))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
