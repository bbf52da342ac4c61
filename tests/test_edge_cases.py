"""Edge cases: WAV variants, empty DB, geometry mismatches, time wrap."""

import wave

import numpy as np
import pytest

from audfprint_tpu import params as P
from audfprint_tpu.index.hash_table import HashTable
from audfprint_tpu.match.matcher import Matcher
from audfprint_tpu.models.analyzer import Analyzer
from audfprint_tpu.utils import audio as audio_io
from tests.conftest import synth_audio

SR = 11025


def _write_wav(path, x, sampwidth, nch=1, sr=SR):
    x = np.asarray(x)
    if nch > 1:
        x = np.repeat(x[:, None], nch, axis=1).reshape(-1)
    if sampwidth == 1:
        raw = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        raw = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    elif sampwidth == 3:
        v = (np.clip(x, -1, 1) * (2**23 - 1)).astype(np.int32)
        b = np.zeros((len(v), 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw = b.tobytes()
    else:
        raw = (np.clip(x, -1, 1) * (2**31 - 1)).astype("<i4").tobytes()
    with wave.open(str(path), "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(raw)


@pytest.mark.parametrize("sampwidth,nch", [(1, 1), (2, 2), (3, 1), (4, 1)])
def test_wav_variants_decode(tmp_path, rng, sampwidth, nch):
    x = synth_audio(rng, dur_sec=0.5)
    p = tmp_path / f"v{sampwidth}_{nch}.wav"
    _write_wav(p, x, sampwidth, nch)
    d, sr = audio_io.audio_read(str(p), sr=SR)
    assert sr == SR and len(d) == len(x)
    assert np.corrcoef(d, x)[0, 1] > 0.98
    # native path agrees exactly with the python path where it handles it
    nat = audio_io.read_wav_batch([str(p)], sr=SR)
    if nat is not None and nat[0] is not None:
        np.testing.assert_array_equal(nat[0], d)


def test_empty_db_match(rng):
    ht = HashTable(hashbits=12, depth=4, maxtime=1024)
    q = np.stack([np.arange(20), np.arange(20) * 7], axis=1).astype(np.int32)
    assert len(Matcher().match_hashes(ht, q)) == 0
    # and an empty query against a populated db
    ht.store("a", q)
    assert len(Matcher().match_hashes(ht, np.zeros((0, 2), np.int32))) == 0


def test_merge_geometry_mismatch_raises():
    a = HashTable(hashbits=12, depth=4, maxtime=1024)
    b = HashTable(hashbits=10, depth=4, maxtime=1024)
    with pytest.raises(ValueError):
        a.merge(b)


def test_time_wrap_still_matches(rng):
    """Tracks longer than maxtime alias mod maxtime but still match via
    mode voting (SURVEY §5 long-context row: hash_table packing)."""
    maxtime = 512  # ~11.9 s at 256-hop; a 20 s track wraps
    an = Analyzer()
    x = synth_audio(rng, dur_sec=20.0, n_tones=140)
    h = an.samples2hashes(x)
    assert h[:, 0].max() > maxtime  # raw times exceed the modulus
    ht = HashTable(hashbits=16, depth=30, maxtime=maxtime)
    ht.store_vectorized("wrap", h)
    # clip from the *wrapped* region (t ~ 600 frames > 512)
    start = 256 * 600
    clip = x[start: start + 4 * SR].copy()
    qh = an.samples2hashes(clip)
    rows = Matcher().match_hashes(ht, qh)
    assert len(rows) == 1 and rows[0][0] == 0
    # the reported offset is the wrapped one: (600 mod 512) = 88
    assert abs(rows[0][2] - (600 % maxtime)) <= 2


def test_analyzer_empty_and_short_audio():
    an = Analyzer()
    assert len(an.samples2hashes(np.zeros(0, np.float32))) == 0
    assert len(an.samples2hashes(np.zeros(100, np.float32))) == 0  # < n_fft
    # silence: zero hashes (oracle passes raw zeros through)
    assert len(an.samples2hashes(np.zeros(SR, np.float32))) == 0


def test_truncated_wav_tolerated(tmp_path):
    """A WAV whose data chunk ends mid-sample decodes with the partial
    sample dropped (ffmpeg-style tolerance) on both read paths, and a
    missing file surfaces as DecodeError (the --continue-on-error
    contract), not a bare OSError."""
    import wave

    import pytest

    from audfprint_tpu.utils.audio import (DecodeError, audio_read,
                                           audio_read_staged,
                                           audio_write_wav)
    sr = 11025
    rng = np.random.default_rng(30)
    x = (0.1 * rng.standard_normal(sr)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_write_wav(p, x, sr)
    raw = open(p, "rb").read()
    pt = str(tmp_path / "trunc.wav")
    open(pt, "wb").write(raw[:-1])        # odd-length data chunk
    with wave.open(pt, "rb") as w:        # header still parses
        assert w.getsampwidth() == 2
    d, _ = audio_read(pt, sr=sr)
    assert d.dtype == np.float32 and len(d) == sr - 1
    d2, _ = audio_read_staged(pt, sr=sr)
    assert d2.dtype == np.int16 and len(d2) == sr - 1
    for fn in (audio_read, audio_read_staged):
        with pytest.raises(DecodeError):
            fn(str(tmp_path / "missing.wav"), sr=sr)
