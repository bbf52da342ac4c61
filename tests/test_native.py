"""Native C++ host loader vs the Python decode path (exactness + fallback)."""

import numpy as np
import pytest

from audfprint_tpu.utils import audio as audio_io
from audfprint_tpu.utils import native
from tests.conftest import synth_audio

SR = 11025


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    rng = np.random.default_rng(5)
    d = tmp_path_factory.mktemp("nat")
    paths = []
    for i in range(4):
        x = synth_audio(rng, dur_sec=1.0 + i * 0.3)
        p = str(d / f"w{i}.wav")
        audio_io.audio_write_wav(p, x, SR)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ build of audfp_host failed"


def test_s16_conversion_matches_numpy(rng):
    raw = rng.integers(-32768, 32767, 4096).astype(np.int16)
    got = native.s16_to_f32_mono(raw, 1)
    want = audio_io.buf_to_float(raw.tobytes(), 2)
    assert np.array_equal(got, want)


def test_batch_loader_matches_python(wavs):
    out = audio_io.read_wav_batch(wavs, sr=SR)
    assert out is not None
    for p, got in zip(wavs, out):
        want, wsr = audio_io.audio_read(p, sr=SR)
        assert wsr == SR
        assert got is not None and len(got) == len(want)
        np.testing.assert_array_equal(got, want)


def test_batch_loader_flags_bad_files(wavs, tmp_path):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFxxxxWAVEjunk")
    out = audio_io.read_wav_batch(wavs + [bad], sr=SR)
    assert out is not None
    assert out[-1] is None
    assert all(o is not None for o in out[:-1])


def _wav_bytes(n_frames=256, sr=8000, n_ch=2, fmt_size=16):
    """Hand-rolled RIFF/WAVE with a parameterizable fmt chunk size."""
    import struct
    rng = np.random.default_rng(9)
    data = rng.integers(-1000, 1000, n_frames * n_ch).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, sr, sr * n_ch * 2, n_ch * 2, 16)
    fmt = fmt[:fmt_size] if fmt_size <= 16 else fmt + b"\0" * (fmt_size - 16)
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + out, data


def test_malformed_fmt_chunk_rejected(tmp_path, wavs):
    """A fmt chunk smaller than the 16-byte PCM minimum must be rejected
    by the native reader (round-2 review finding: the bits field was read
    past the chunk buffer), falling back to the Python path which also
    fails cleanly — the file is reported, not crashed on."""
    raw, _ = _wav_bytes(fmt_size=8)
    bad = str(tmp_path / "shortfmt.wav")
    open(bad, "wb").write(raw)
    out = audio_io.read_wav_batch(wavs + [bad], sr=SR)
    assert out is not None
    assert out[-1] is None                 # flagged, not crashed
    assert all(o is not None for o in out[:-1])


def test_truncated_data_chunk_native_decodes_prefix(tmp_path):
    """A data chunk whose declared size exceeds the file (streaming-style
    header) decodes the frames actually present — and the batch matrix is
    sized by the CLAMPED header bound, not the declared 0xFFFFFFFF."""
    import struct
    raw, data = _wav_bytes(n_frames=256, n_ch=1)
    # overstate the data size: replace the real size with 0x7FFFFFF0
    raw = raw.replace(b"data" + struct.pack("<I", len(data)),
                      b"data" + struct.pack("<I", 0x7FFFFFF0))
    p = str(tmp_path / "stream.wav")
    open(p, "wb").write(raw)
    out = audio_io.read_wav_batch([p], sr=None)
    assert out is not None and out[0] is not None
    assert len(out[0]) == 256              # the frames actually on disk
