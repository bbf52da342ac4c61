"""Reference hash_table.py surface (SURVEY §2.3.4)."""

from audfprint_tpu.index.hash_table import HashTable  # noqa: F401
