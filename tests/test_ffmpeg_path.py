"""ffmpeg decode-path coverage (VERDICT r1 #4/#9).

The reference's whole test suite runs mp3s through ffmpeg; this image has no
ffmpeg, so these tests exercise the subprocess plumbing with a FAKE ffmpeg
binary on PATH (command shape, stdout PCM parsing, stderr drain, error
surface), plus a skip-gated real-ffmpeg test for environments that have it.
"""

import os
import shutil
import stat
import subprocess
import sys

import numpy as np
import pytest

from audfprint_tpu.utils import audio as audio_io


def _install_fake_ffmpeg(tmp_path, body: str) -> str:
    d = tmp_path / "bin"
    d.mkdir(exist_ok=True)
    p = d / "ffmpeg"
    p.write_text("#!/bin/sh\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(d)

def _pcm_emitter(n: int = 1000) -> str:
    """Fake-ffmpeg body: ignore args, write n int16 ramp samples + noisy
    stderr (exercises the drain thread against pipe deadlock)."""
    return (
        f'exec {sys.executable} -c "\n'
        "import sys\n"
        "import numpy as np\n"
        "for i in range(2000):\n"
        "    sys.stderr.write('config line %d\\n' % i)\n"
        f"x = (np.arange({n}) % 256 * 64).astype('<i2')\n"
        "sys.stdout.buffer.write(x.tobytes())\n"
        '"\n')


def test_fake_ffmpeg_decode_plumbing(tmp_path, monkeypatch):
    fake = _install_fake_ffmpeg(tmp_path, _pcm_emitter(1000))
    monkeypatch.setenv("PATH", fake + os.pathsep + os.environ.get("PATH", ""))
    x, sr = audio_io.audio_read(str(tmp_path / "song.mp3"), sr=11025,
                                channels=1)
    assert sr == 11025
    assert x.dtype == np.float32 and len(x) == 1000
    want = (np.arange(1000) % 256 * 64).astype(np.float32) / (1 << 15)
    np.testing.assert_allclose(x, want)


def test_fake_ffmpeg_stereo_mixdown(tmp_path, monkeypatch):
    # channels=2: audio_read must mean-mix the interleaved stream
    fake = _install_fake_ffmpeg(tmp_path, _pcm_emitter(8))
    monkeypatch.setenv("PATH", fake + os.pathsep + os.environ.get("PATH", ""))
    x, _ = audio_io.audio_read(str(tmp_path / "s.ogg"), sr=8000, channels=2)
    raw = (np.arange(8) % 256 * 64).astype(np.float32) / (1 << 15)
    np.testing.assert_allclose(x, raw.reshape(-1, 2).mean(axis=1))


def test_fake_ffmpeg_failure_surfaces_stderr(tmp_path, monkeypatch):
    fake = _install_fake_ffmpeg(
        tmp_path, 'echo "boom: unreadable garbage" >&2\nexit 1\n')
    monkeypatch.setenv("PATH", fake + os.pathsep + os.environ.get("PATH", ""))
    with pytest.raises(audio_io.CommunicationError, match="boom"):
        audio_io.audio_read(str(tmp_path / "bad.mp3"), sr=11025, channels=1)


def test_missing_ffmpeg_is_typed_error(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    with pytest.raises(audio_io.NotInstalledError):
        audio_io.audio_read(str(tmp_path / "x.mp3"), sr=11025, channels=1)


def test_fake_ffmpeg_command_shape(tmp_path, monkeypatch):
    """The reference command contract: ffmpeg -i <f> -f s16le -ar SR -ac CH -
    (audio_read.py:~150-220)."""
    argfile = tmp_path / "args.txt"
    fake = _install_fake_ffmpeg(
        tmp_path,
        f'echo "$@" > {argfile}\n' + _pcm_emitter(4))
    monkeypatch.setenv("PATH", fake + os.pathsep + os.environ.get("PATH", ""))
    audio_io.audio_read(str(tmp_path / "q.m4a"), sr=11025, channels=1)
    args = argfile.read_text().split()
    f = str(tmp_path / "q.m4a")
    assert args == ["-i", f, "-f", "s16le", "-ar", "11025", "-ac", "1", "-"]


@pytest.mark.skipif(shutil.which("ffmpeg") is None,
                    reason="real ffmpeg not installed in this image")
def test_real_ffmpeg_decodes_flac(tmp_path):
    """With a real ffmpeg: encode a wav to flac, decode through the ffmpeg
    path, and check sample-level agreement with the native wav decode."""
    from tests.conftest import synth_audio
    rng = np.random.default_rng(11)
    x = synth_audio(rng, dur_sec=2.0)
    wav = str(tmp_path / "a.wav")
    flac = str(tmp_path / "a.flac")
    audio_io.audio_write_wav(wav, x, 11025)
    subprocess.run(["ffmpeg", "-y", "-i", wav, flac], check=True,
                   capture_output=True)
    ref, _ = audio_io.audio_read(wav, sr=11025)
    got, sr = audio_io.audio_read(flac, sr=11025)
    assert sr == 11025
    assert abs(len(got) - len(ref)) <= 1
    n = min(len(got), len(ref))
    np.testing.assert_allclose(got[:n], ref[:n], atol=2.0 / (1 << 15))


def test_decode_many_mixed_chunk_uses_native_for_wavs(tmp_path, monkeypatch):
    """A chunk mixing WAV and non-WAV must still send the WAV subset through
    the native bulk loader path and only the rest through audio_read
    (round-1 behavior sent the whole chunk down the per-file path)."""
    from audfprint_tpu.cli import _decode_many
    from audfprint_tpu.models.analyzer import Analyzer
    from tests.conftest import synth_audio
    rng = np.random.default_rng(12)
    wav = str(tmp_path / "a.wav")
    audio_io.audio_write_wav(wav, synth_audio(rng, dur_sec=1.0), 11025)
    fake = _install_fake_ffmpeg(tmp_path, _pcm_emitter(500))
    monkeypatch.setenv("PATH", fake + os.pathsep + os.environ.get("PATH", ""))
    analyzer = Analyzer()
    out = _decode_many(analyzer, [wav, str(tmp_path / "b.mp3")], 1, print)
    assert len(out) == 2
    assert out[0] is not None and len(out[0]) == 11025
    assert out[1] is not None and len(out[1]) == 500
