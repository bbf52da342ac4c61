"""NumPy oracle: slow, readable, authoritative implementation of the audfprint
behavioral spec (SURVEY.md §2.3).

This sub-package is the *executable specification* for the TPU pipeline: every
JAX/Pallas kernel in `audfprint_tpu.ops` must reproduce these outputs exactly
(integer outputs bit-for-bit given the same float spectrogram; float paths to
within dtype determinism).  The reference mount was empty at build time, so
this oracle — reconstructed from SURVEY.md's behavioral spec of upstream
dpwe/audfprint — is the bit-compat gold standard (SURVEY.md provenance note,
§4 "bit-compat oracle").
"""

from audfprint_tpu.oracle.analyze import (
    find_peaks,
    hashes2landmarks,
    landmarks2hashes,
    locmax,
    peaks2landmarks,
    samples_to_hashes,
    spectrogram,
    spreadpeaks,
    spreadpeaksinvector,
)
from audfprint_tpu.oracle.stft import stft

__all__ = [
    "stft",
    "spectrogram",
    "locmax",
    "spreadpeaks",
    "spreadpeaksinvector",
    "find_peaks",
    "peaks2landmarks",
    "landmarks2hashes",
    "hashes2landmarks",
    "samples_to_hashes",
]
