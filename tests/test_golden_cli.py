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
    query = os.path.join(tmpdir, "query.wav")
    main(["new", "-d", db, *COMMON, *extra, *wavs])
    main(["match", "-d", db, *COMMON, *extra, query])
    main(["match", "-d", db, *COMMON, *extra, "-R", "-X", query])
    main(["list", "-d", db, *COMMON])
    main(["remove", "-d", db, *COMMON, wavs[2]])
    main(["match", "-d", db, *COMMON, *extra, query])
    # -- full-surface coverage (VERDICT r3 #6): precompute (+ -K), ingest
    #    from .afpt/.afpk, add, -o opfile, merge, newmerge, -i shifts --
    pre = os.path.join(tmpdir, "pre")
    main(["precompute", "-p", pre, *COMMON, *extra, wavs[0], wavs[1]])
    main(["precompute", "-K", "-p", pre, *COMMON, *extra, wavs[2]])
    afpt = [os.path.join(pre, tmpdir.lstrip(os.sep),
                         f"track{i}.afpt") for i in range(2)]
    afpk2 = os.path.join(pre, tmpdir.lstrip(os.sep), "track2.afpk")
    db2 = os.path.join(tmpdir, "db2.pklz")
    main(["new", "-d", db2, *COMMON, *extra, *afpt])
    main(["add", "-d", db2, *COMMON, *extra, afpk2])
    op = os.path.join(tmpdir, "match.out")
    main(["match", "-d", db2, *COMMON, *extra, "-o", op, query])
    print("--- opfile ---")
    sys.stdout.write(open(op).read())
    dbs = os.path.join(tmpdir, "dbshard.pklz")
    db4 = os.path.join(tmpdir, "db4.pklz")
    main(["new", "-d", dbs, *COMMON, *extra, wavs[2]])
    main(["new", "-d", db4, *COMMON, *extra, wavs[0]])
    main(["merge", "-d", db4, *COMMON, *extra, dbs])
    main(["match", "-d", db4, *COMMON, *extra, query])
    db5 = os.path.join(tmpdir, "db5.pklz")
    main(["newmerge", "-d", db5, *COMMON, *extra, db4, db2])
    main(["list", "-d", db5, *COMMON])
    db6 = os.path.join(tmpdir, "db6.pklz")
    main(["new", "-d", db6, *COMMON, *extra, "-i", "2", wavs[2]])
    main(["match", "-d", db6, *COMMON, *extra, "-i", "2", query])
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
