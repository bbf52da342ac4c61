"""Reference audfprint_analyze.py surface (SURVEY §2.3.3)."""

from audfprint_tpu.models.analyzer import Analyzer  # noqa: F401
from audfprint_tpu.oracle.analyze import (  # noqa: F401
    find_peaks,
    hashes2landmarks,
    landmarks2hashes,
    locmax,
    peaks2landmarks,
    spreadpeaks,
    spreadpeaksinvector,
)
from audfprint_tpu.params import (  # noqa: F401
    DENSITY,
    F_SD,
    MAX_PAIRS_PER_PEAK,
    MAX_PKS_PER_FRAME,
    N_FFT,
    N_HOP,
    OVERSAMP,
    PRECOMPEXT,
    PRECOMPPKEXT,
    TARGET_SR,
)
from audfprint_tpu.utils.formats import (  # noqa: F401
    hashes_load,
    hashes_save,
    peaks_load,
    peaks_save,
)


def glob2hashtable(pattern, ht=None):
    return Analyzer().glob2hashtable(pattern, ht)
