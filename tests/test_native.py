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
