"""bench.py's driver contract: ONE JSON line with the required keys.

The driver runs `python bench.py` at round end and records stdout as the
round's benchmark artifact — a schema regression there silently loses the
round's numbers, so the contract is pinned with the measurement functions
monkeypatched (no device work; the real measurements are exercised on
hardware by the driver itself)."""

import json
import sys

import bench


def test_bench_main_json_contract(monkeypatch, capsys):
    attrib = {"batch_wall_ms": 10.0, "dispatch_overhead_ms": 1.0,
              "device_compute_ms_est": 9.0}
    monkeypatch.setattr(bench, "measure_device",
                        lambda: (12345.6, 789, attrib))
    monkeypatch.setattr(
        bench, "measure_end_to_end",
        lambda extra_flags=(): (345.6 if extra_flags else 234.5,
                                {"decode": 1.0}))
    monkeypatch.setattr(bench, "measure_match", lambda: (456.7, 1.0))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    out = json.loads(lines[0])
    assert out["metric"] == "fingerprint_throughput"
    assert out["value"] == 12345.6
    assert out["unit"] == "audio-sec/sec/chip"
    assert out["vs_baseline"] == round(12345.6 / 30.0, 2)
    assert out["fingerprint_attrib_ms"] == attrib
    assert out["end_to_end_as_per_sec"] == 234.5
    assert out["end_to_end_device_store_as_per_sec"] == 345.6
    assert out["match_queries_per_sec"] == 456.7
    assert out["match_top1_self"] == 1.0
    assert out["match_bench_kind"] == "synthetic-table-device-rate"


def test_bench_main_match_failure_tolerated(monkeypatch, capsys):
    monkeypatch.setattr(bench, "measure_device", lambda: (100.0, 1, {}))

    def boom():
        raise RuntimeError("no device")

    monkeypatch.setattr(bench, "measure_match", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--no-e2e"])
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 100.0            # headline always prints
    assert "match_bench_error" in out
    assert "match_queries_per_sec" not in out
