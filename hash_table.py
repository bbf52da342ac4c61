"""Drop-in `hash_table` — the reference's index module name
(SURVEY §2.3.4).  `from hash_table import HashTable` works unchanged."""

from audfprint_tpu.index.hash_table import HashTable  # noqa: F401
