"""ctypes binding for the native host data-loader (native/audfp_host.cpp).

Builds the shared library on first use if g++ is available (cached next to
the source); every entry point has a NumPy fallback, so the package works
without a compiler.  See native/audfp_host.cpp for the role of this layer
(the reference's audio_read.py decode path, made batch + multithreaded).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native", "audfp_host.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libaudfp_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    gxx = shutil.which("g++")
    if gxx is None or not os.path.exists(_SRC):
        return False
    cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib():
    """The loaded library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.s16_to_f32_mono.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.load_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        _lib = lib
        return _lib


def s16_to_f32_mono(raw: np.ndarray, n_ch: int) -> np.ndarray | None:
    """Interleaved int16 -> mono float32; None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw, dtype=np.int16)
    n_frames = len(raw) // n_ch
    out = np.empty(n_frames, np.float32)
    lib.s16_to_f32_mono(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(n_frames), ctypes.c_int(n_ch),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def load_wav_batch(paths: list, max_samples: int, n_threads: int = 8):
    """Decode PCM WAVs into a zero-padded (n, max_samples) f32 batch.

    Returns (batch, lens, srs, errs) or None if the lib is unavailable.
    errs[i] != 0 marks failure (caller falls back / reports); non-PCM or
    resample-needed files must be handled by the Python path.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    batch = np.zeros((n, max_samples), np.float32)
    lens = np.zeros(n, np.int32)
    srs = np.zeros(n, np.int32)
    errs = np.zeros(n, np.int32)
    cpaths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths])
    lib.load_wav_batch(
        cpaths, ctypes.c_int(n),
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(max_samples),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        errs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(n_threads))
    return batch, lens, srs, errs
