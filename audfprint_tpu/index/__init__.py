from audfprint_tpu.index.hash_table import HashTable

__all__ = ["HashTable"]
