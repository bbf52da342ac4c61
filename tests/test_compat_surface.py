"""The reference-shaped import surface exists and is callable."""

import numpy as np


def test_compat_modules_import():
    from audfprint_tpu.compat import (  # noqa: F401
        audfprint,
        audfprint_analyze,
        audfprint_match,
        audio_read,
        hash_table,
        stft,
    )
    assert callable(audfprint.main)
    assert callable(audfprint_analyze.landmarks2hashes)
    assert callable(audfprint_match.find_modes)
    assert callable(audio_read.audio_read)
    assert callable(stft.stft)
    ht = hash_table.HashTable(hashbits=8, depth=2, maxtime=64)
    ht.store("x", np.array([[1, 2]]))
    assert ht.totalhashes() == 1


def test_toplevel_dropin_modules():
    """The reference's exact module names import from the repo root
    (upstream users do `import audfprint_analyze`, `from hash_table
    import HashTable`, `python audfprint.py match ...` — SURVEY §1)."""
    import audfprint
    import audfprint_analyze
    import audfprint_match
    import audio_read
    import hash_table
    import stft

    assert callable(audfprint.main)
    assert callable(audfprint.setup_analyzer)
    assert callable(audfprint_analyze.Analyzer)
    assert callable(audfprint_analyze.landmarks2hashes)
    assert callable(audfprint_match.Matcher)
    assert callable(audfprint_match.find_modes)
    assert callable(audio_read.audio_read)
    assert callable(stft.stft)
    ht = hash_table.HashTable(hashbits=8, depth=2, maxtime=64)
    ht.store("x", np.array([[3, 4]]))
    assert ht.totalhashes() == 1


def test_toplevel_cli_script(tmp_path):
    """`python audfprint.py new/match ...` runs the real CLI end-to-end."""
    import os
    import subprocess
    import sys

    from audfprint_tpu.utils.audio import audio_write_wav

    rng = np.random.default_rng(5)
    sr = 11025
    wav = tmp_path / "t0.wav"
    audio_write_wav(str(wav), rng.standard_normal(sr * 2)
                    .astype(np.float32) * 0.3, sr)
    db = tmp_path / "db.pklz"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(root, "audfprint.py"),
         "new", "-d", str(db), str(wav)],
        capture_output=True, text=True, env=env, cwd=root, timeout=600)
    assert r.returncode == 0, r.stderr
    assert db.exists()
    r2 = subprocess.run(
        [sys.executable, os.path.join(root, "audfprint.py"),
         "match", "-d", str(db), str(wav)],
        capture_output=True, text=True, env=env, cwd=root, timeout=600)
    assert r2.returncode == 0, r2.stderr
    # pin the reference match-line shape, not an accidental substring
    assert "Matched" in r2.stdout and "at rank 0" in r2.stdout
    assert "t0.wav" in r2.stdout


def test_compat_stft_shape():
    from audfprint_tpu.compat import stft

    x = np.random.default_rng(0).standard_normal(4096).astype(np.float32)
    s = stft.stft(x, n_fft=512, hop_length=256)
    assert s.shape == (257, 15)
