"""Drop-in `audfprint_analyze` — the reference's analyzer module name
(SURVEY §2.3.3).  Re-exports the TPU-native surface so upstream imports
(`from audfprint_analyze import Analyzer, landmarks2hashes, ...`) work
unchanged."""

from audfprint_tpu.compat.audfprint_analyze import *  # noqa: F401,F403
from audfprint_tpu.compat.audfprint_analyze import (  # noqa: F401
    Analyzer,
    glob2hashtable,
)
