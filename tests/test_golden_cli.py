"""True golden-output regression: a canonical CLI session's stdout must stay
byte-identical (the reference's tests/Makefile diff-against-expected
strategy, SURVEY §4).  Runs on the CPU backend (conftest), deterministic
fixtures; paths and timing lines are normalized.

Regenerate after an intentional behavior change:
  python tests/test_golden_cli.py regen
"""

import os
import re
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cli_session.txt")
SR = 11025
COMMON = ["-h", "16", "-b", "20", "-t", "4096"]


def _normalize(text: str, roots: list) -> str:
    for r in roots:
        text = text.replace(str(r) + os.sep, "<DIR>/").replace(str(r), "<DIR>")
    # timing lines vary run to run
    text = re.sub(r"in \d+\.\d s sec = \d+\.\d+ x RT", "in <T> s sec = <R> x RT",
                  text)
    return text


def _session(tmpdir, capture, extra=()):
    from audfprint_tpu.cli import main
    from audfprint_tpu.utils.audio import audio_write_wav
    from tests.conftest import synth_audio

    extra = list(extra)
    rng = np.random.default_rng(424242)
    tracks = []
    for i in range(3):
        x = synth_audio(rng, dur_sec=6.0, n_tones=50)
        audio_write_wav(os.path.join(tmpdir, f"track{i}.wav"), x, SR)
        tracks.append(x)
    # hop-aligned clean clip: deterministic MATCH lines in the golden
    q = tracks[2][256 * 43: 256 * 43 + 3 * SR].copy()
    audio_write_wav(os.path.join(tmpdir, "query.wav"), q, SR)
    db = os.path.join(tmpdir, "db.pklz")
    wavs = [os.path.join(tmpdir, f"track{i}.wav") for i in range(3)]
    main(["new", "-d", db, *COMMON, *extra, *wavs])
    main(["match", "-d", db, *COMMON, *extra,
          os.path.join(tmpdir, "query.wav")])
    main(["match", "-d", db, *COMMON, *extra, "-R", "-X",
          os.path.join(tmpdir, "query.wav")])
    main(["list", "-d", db, *COMMON])
    main(["remove", "-d", db, *COMMON, wavs[2]])
    main(["match", "-d", db, *COMMON, *extra,
          os.path.join(tmpdir, "query.wav")])
    return capture()


def test_golden_cli_session(tmp_path, capsys):
    """Default CLI (auto --ndev: fully sharded store + match over the
    8-virtual-CPU mesh, VERDICT r2 #1) must match the committed golden —
    which was generated single-device, so this IS the product-surface
    bit-identity proof."""
    out = _session(str(tmp_path), lambda: capsys.readouterr().out)
    got = _normalize(out, [tmp_path])
    want = open(GOLDEN).read()
    assert got == want, "CLI stdout drifted from tests/golden/cli_session.txt"


def test_golden_cli_session_single_device(tmp_path, capsys):
    """--ndev 1 (host store + single-device matching) is byte-identical to
    the same golden, pinning sharded == unsharded at the CLI surface."""
    out = _session(str(tmp_path), lambda: capsys.readouterr().out,
                   extra=["--ndev", "1"])
    got = _normalize(out, [tmp_path])
    want = open(GOLDEN).read()
    assert got == want, "--ndev 1 CLI output differs from the golden"


if __name__ == "__main__" and "regen" in sys.argv:
    import contextlib
    import io
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    buf = io.StringIO()
    with tempfile.TemporaryDirectory() as d:
        with contextlib.redirect_stdout(buf):
            out = _session(d, buf.getvalue)
        text = _normalize(buf.getvalue(), [d])
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with open(GOLDEN, "w") as f:
        f.write(text)
    print(f"wrote {GOLDEN} ({len(text)} bytes)")
