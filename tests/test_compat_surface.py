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


def test_compat_stft_shape():
    from audfprint_tpu.compat import stft

    x = np.random.default_rng(0).standard_normal(4096).astype(np.float32)
    s = stft.stft(x, n_fft=512, hop_length=256)
    assert s.shape == (257, 15)
