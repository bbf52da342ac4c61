"""utils/jaxconfig hardening: atomic persistent-cache writes.

JAX's LRUCache.put writes executables straight to the final path, so a
process that dies mid-write leaves a poisoned entry and a concurrent
reader can deserialize a partial one (observed SIGSEGV in
get_executable_and_time during a shared-cache-dir suite run).  The
framework patches put to temp-file + os.replace; these tests pin the
patch's semantics without needing to win a race."""

import os

import pytest

from audfprint_tpu.utils import jaxconfig


def _mk_cache(tmp_path):
    from jax._src import lru_cache as _lru
    return _lru, _lru.LRUCache(str(tmp_path), max_size=-1)


def test_patch_applies_and_roundtrips(tmp_path):
    assert jaxconfig.patch_atomic_cache_writes()
    assert jaxconfig.patch_atomic_cache_writes()   # idempotent
    _lru, cache = _mk_cache(tmp_path / "c")
    assert getattr(_lru.LRUCache.put, "_audfp_atomic", False)
    cache.put("k1", b"payload")
    assert cache.get("k1") == b"payload"
    # no temp residue, exactly the one final entry
    names = os.listdir(tmp_path / "c")
    assert not [n for n in names if n.endswith(".tmp")]
    # existing entries are not rewritten (upstream contract)
    cache.put("k1", b"different")
    assert cache.get("k1") == b"payload"


def test_interrupted_write_leaves_no_entry(tmp_path, monkeypatch):
    """A writer dying mid-write must leave the final path ABSENT (the
    pre-patch behavior left a truncated executable there)."""
    assert jaxconfig.patch_atomic_cache_writes()
    _lru, cache = _mk_cache(tmp_path / "c")

    ptype = type(cache.path)          # pathlib or etils.epath
    real = ptype.write_bytes

    def dying(self, data):
        real(self, data[: len(data) // 2])
        raise KeyboardInterrupt("killed mid-write")

    monkeypatch.setattr(ptype, "write_bytes", dying)
    with pytest.raises(KeyboardInterrupt):
        cache.put("k2", b"x" * 1024)
    monkeypatch.undo()
    assert cache.get("k2") is None
    final = [n for n in os.listdir(tmp_path / "c") if "k2" in n
             and not n.endswith(".tmp")]
    assert final == []
