"""audfprint_tpu: TPU-native Shazam-style audio landmark fingerprinting.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of dpwe/audfprint
(design blueprint: SURVEY.md; targets: BASELINE.md).  Public API mirrors the
reference's class names: Analyzer, HashTable, Matcher, plus the
new/add/precompute/merge/newmerge/match/list/remove CLI
(`python -m audfprint_tpu ...`).
"""

__version__ = "0.1.0"

from audfprint_tpu.index.hash_table import HashTable  # noqa: F401
